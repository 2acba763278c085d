package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run selected SparkEntry queries over one or more SF dirs and print
  * the result rows + wall time — the fast feedback loop for recall-gated ANN
  * work (the driver's oracle only re-runs per round). Usage:
  * `runMain graft.AnnCheck <query,query,...> <sfDir> [sfDir...]`
  * Flags (anywhere in args): `--bench` runs the benchQueries twins instead of
  * the gated forms (pre-trained-model probes, no in-plan audits); `--x2` runs
  * each entry twice and prints both times — the second run probes warm per-dir
  * model/index caches, i.e. the steady-state cost the scale curves report. */
object AnnCheck {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val rest = args.filterNot(_.startsWith("--"))
    val names = rest.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("emb_ann_bq", "emb_ann_rq"))
    val dirs = if (rest.length > 1) rest.drop(1).toSeq else Seq("/root/testdata/sf0.01")
    val reg = if (flags("--bench")) SparkEntry.benchQueries else SparkEntry.queries
    val reps = if (flags("--x2")) 2 else 1
    val spark = GraftConf.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs; name <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      val rows = reg(name)(spark, dir).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      val tag = if (reps > 1) s"#$r" else ""
      val preview = rows.take(4).map(_.toString).mkString(" | ")
      println(f"[$dir] $name%-24s$tag ${dt}%6.2fs  $preview")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
