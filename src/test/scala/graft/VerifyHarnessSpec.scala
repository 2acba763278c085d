package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness harness must be incapable of silent failure: a throwing
  * query yields a visible _ERROR.txt marker (never an empty dump that the
  * driver records as 0 rows / err:null), and a transient failure is retried
  * once before the marker is written. */
class VerifyHarnessSpec extends SparkSpec {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-verify-$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("a throwing query writes an _ERROR.txt marker, not an empty slot") {
    val out = tmpDir("err")
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("synthetic verify failure")
    val res = Verify.runOne(spark, out, "q_boom", boom, "/nonexistent")
    assert(res.isDefined && res.get.contains("synthetic verify failure"))
    val marker = Paths.get(out, "q_boom", "_ERROR.txt")
    assert(Files.exists(marker), "failure must leave a machine-readable marker")
    val txt = Files.readString(marker)
    assert(txt.contains("synthetic verify failure") && txt.contains("attempt2"))
    // and the slot contains NO parquet the comparator could mistake for data
    val parquets = Files.list(Paths.get(out, "q_boom")).toArray.map(_.toString).filter(_.endsWith(".parquet"))
    assert(parquets.isEmpty)
  }

  test("a transiently-failing query succeeds on the retry and leaves no marker") {
    val out = tmpDir("retry")
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls == 1) throw new RuntimeException("transient flake")
      s.range(3).toDF("id")
    }
    val res = Verify.runOne(spark, out, "q_flaky", flaky, "/nonexistent")
    assert(res.isEmpty, "retry must rescue a transient failure")
    assert(calls == 2)
    assert(!Files.exists(Paths.get(out, "q_flaky", "_ERROR.txt")))
    val rows = spark.read.parquet(s"$out/q_flaky").count()
    assert(rows == 3L)
  }

  test("a healthy query dumps parquet with the expected rows") {
    val out = tmpDir("ok")
    val ok: (SparkSession, String) => DataFrame = (s, _) => s.range(5).toDF("id")
    assert(Verify.runOne(spark, out, "q_ok", ok, "/nonexistent").isEmpty)
    assert(spark.read.parquet(s"$out/q_ok").count() == 5L)
  }
}
