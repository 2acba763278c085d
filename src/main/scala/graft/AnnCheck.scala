package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run selected SparkEntry queries over one or more SF dirs and print
  * the result rows + wall time — the fast feedback loop for recall-gated ANN
  * work (the driver's oracle only re-runs per round). Usage:
  * `runMain graft.AnnCheck <query,query,...> <sfDir> [sfDir...]` */
object AnnCheck {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("emb_ann_bq", "emb_ann_rq"))
    val dirs = if (args.length > 1) args.drop(1).toSeq else Seq("/root/testdata/sf0.01")
    val spark = GraftConf.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs; name <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$dir] $name%-24s ${dt}%6.2fs  ${rows.map(_.toString).mkString(" | ")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
