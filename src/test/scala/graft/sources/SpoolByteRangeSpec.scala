package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/**
 * The byte-range spool contract (VERDICT r1 #2): offset planning is O(#files) filesystem
 * metadata; file CONTENTS are only ever read inside Spark tasks; arbitrary byte cut points
 * (mid-line, exact line start) still partition the line set exactly.
 */
class SpoolByteRangeSpec extends SparkSpec {

  private def writeSpool(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), lines.asJava)
  }

  test("planning is metadata-only: driver-side content reads throw by construction") {
    val dir = Files.createTempDirectory("spool-meta").toString
    writeSpool(dir, "000.jsonl", Seq("""{"a":1}""", """{"a":2}"""))
    // the guard: reading spool contents outside a task is an error, so any future
    // regression that re-introduces driver-side line counting fails loudly
    val e = intercept[IllegalArgumentException] {
      CdcSpoolSource.scanFileForTsStop(s"$dir/000.jsonl", 100L)
    }
    assert(e.getMessage.contains("never on the driver"))
    // listFiles (the only thing offset planning touches) returns (path, size) pairs
    val files = CdcSpoolSource.listFiles(dir)
    assert(files.map(_._2) == Seq(Files.size(Paths.get(dir, "000.jsonl"))))
  }

  test("SpoolLineReader: arbitrary cut points tile the line set exactly") {
    val dir = Files.createTempDirectory("spool-tile").toString
    val lines = Seq("alpha", "bb", "c", "dddddddd", "ee")
    writeSpool(dir, "f.jsonl", lines)
    val f = s"$dir/f.jsonl"
    val total = Files.size(Paths.get(f))
    // every possible single cut point, including mid-line and exact line starts
    for (cut <- 0L to total) {
      val out = Seq((0L, cut), (cut, total)).flatMap { case (lo, hi) =>
        val r = new SpoolLineReader(f, lo, hi)
        try {
          val acc = Seq.newBuilder[(Long, String)]
          while (r.next()) acc += ((r.currentStart, r.currentLine))
          acc.result()
        } finally r.close()
      }
      assert(out.map(_._2) == lines, s"cut=$cut")
      // emitted positions are the true line-start byte offsets
      assert(out.map(_._1) == lines.scanLeft(0L)((p, l) => p + l.length + 1).init, s"cut=$cut")
    }
  }

  test("large files split into maxPartitionBytes ranges; union reads each line once") {
    val dir = Files.createTempDirectory("spool-split").toString
    val lines = (1 to 500).map(i => s"""{"table":"t.t","op":"c","after":{"id":$i},"source":{"ts_ms":$i}}""")
    writeSpool(dir, "big.jsonl", lines)
    val df = spark.read.format("cdc-spool").option("path", dir)
      .option("maxPartitionBytes", "1024").load()
    assert(df.rdd.getNumPartitions > 5) // ~30KB file / 1KB ranges
    assert(df.count() == 500)
    val ids = df.selectExpr("get_json_object(value, '$.after.id')").collect().map(_.getString(0).toInt)
    assert(ids.sorted.toSeq == (1 to 500))
    // pos values are distinct and ordered like the file
    val pos = df.selectExpr("pos").collect().map(_.getLong(0))
    assert(pos.distinct.length == 500)
  }

  test("(file, pos) compound stop target: MySQL SHOW MASTER STATUS analog") {
    val dir = Files.createTempDirectory("spool-filepos").toString
    val f0 = (1 to 3).map(i => s"""{"v":$i}""")
    val f1 = (4 to 6).map(i => s"""{"v":$i}""")
    writeSpool(dir, "000.jsonl", f0)
    writeSpool(dir, "001.jsonl", f1)
    // target = (001.jsonl, start of its second line): all of 000 + 001's first event
    val cutInFile = f1.head.getBytes("UTF-8").length + 1L
    val base = Files.createTempDirectory("spool-filepos-ck").toString
    val df = spark.readStream.format("cdc-spool").option("path", dir)
      .option("stopAtFile", "001.jsonl").option("stopAtPos", cutInFile.toString).load()
    val q = df.writeStream.format("memory").queryName("filepos_stop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$base/ckpt").start()
    q.awaitTermination()
    val vals = spark.sql("SELECT value FROM filepos_stop").collect().map(_.getString(0))
    assert(vals.length == 4)
    assert(vals.map(v => v.substring(5, 6).toInt).sorted.toSeq == Seq(1, 2, 3, 4))
  }
}
