package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def time[T](name: String)(f: => T): Unit = {
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"PROF $name#$i ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    time("dedupe_lww_objhash")(SparkEntry.queries("cdc_dedupe_lww")(spark, dir).count())
    time("ngram")(SparkEntry.queries("doc_ngram_jaccard")(spark, dir).count())
    time("unwrap")(SparkEntry.queries("cdc_unwrap")(spark, dir).count())
    spark.stop()
  }
}
