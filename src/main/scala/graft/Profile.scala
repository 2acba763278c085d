package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.ops.DedupOps
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val df = spark.read.parquet(s"$dir/documents.parquet")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val sh = df.select(col("doc_id").as("id"),
      array_distinct(TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3)).as("sh"))
    time("sh")(sh.count())
    val inv = sh.select(col("id"), explode(col("sh")).as("h"))
    time("inv")(inv.count())
    time("inv2")(inv.count())
    time("ngram_full")(DedupOps.ngramJaccardPairs(df, threshold = 0.2).count())
    time("minhash_full")(DedupOps.minhashLshPairs(df, threshold = 0.2).count())
    spark.stop()
  }
}
