package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dev profiler: end-to-end CDC runner throughput on a synthetic spool built from the
  * sf0.1 events table (100k change events, one table, dedupe mode). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = Files.createTempDirectory("graft-tp").toString
    Files.createDirectories(Paths.get(s"$base/spool"))
    val ev0raw = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    // ts has shipped as nanos-long (legacy conf) and as TIMESTAMP_NTZ micros; normalize
    val ev0 = ev0raw.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        ev0raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        ev0raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => ev0raw
    }
    val ev = (0 until 10).map(i => ev0.withColumn("event_id", col("event_id") + lit(i.toLong * 1000000))).reduce(_ unionByName _)
    val n = ev.count()
    val lines = ev.select(to_json(struct(
      lit("bench.events").as("table"),
      when(col("event_type") === "error", "d").otherwise("u").as("op"),
      when(col("event_type") === "error", lit(null))
        .otherwise(struct(col("event_id"), col("user_id"), col("event_type"), col("value"))).as("after"),
      when(col("event_type") === "error",
        struct(col("event_id"), col("user_id"), lit(null).cast("string").as("event_type"),
          lit(null).cast("double").as("value"))).otherwise(lit(null)).as("before"),
      struct(unix_millis(col("ts")).as("ts_ms")).as("source"))).as("v"))
      .collect().map(_.getString(0))
    Files.write(Paths.get(s"$base/spool/000.jsonl"), java.util.Arrays.asList(lines: _*))
    val t0 = System.nanoTime()
    val res = graft.streaming.CdcRunner.run(spark, graft.streaming.CdcRunner.RunConfig(
      spoolDir = s"$base/spool", workDir = s"$base/work", outDir = s"$base/out",
      primaryKeys = Map("bench_events" -> Seq("user_id"))))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"PROF cdc_pipeline events=$n out=${res.tables.values.sum} ${secs}%.2f s -> ${n / secs}%.0f events/s")
    spark.stop()
  }
}
