package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Cdc

/** Specs for the CDC operator core (SURVEY.md §2.3/§2.4/§2.5), mirroring the semantics of the
  * reference's golden dedupe test
  * (`ex_postgres_cdc/tests/functional/incremental-dedupe-chained/02_inserts_updates_deletes`). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val envSchema = StructType(Seq(
    StructField("op", StringType),
    StructField("after", StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))),
    StructField("before", StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))),
    StructField("source", StructType(Seq(
      StructField("ts_ms", LongType), StructField("file", StringType),
      StructField("pos", LongType))))))

  private def envelopes(rows: Seq[String]) = {
    val df = spark.createDataset(rows).toDF("value")
    df.select(from_json(col("value"), envSchema).as("j")).select(col("j.*"))
  }

  test("unwrapEnvelope: insert/update project after, delete projects before + __deleted") {
    val out = Cdc.unwrapEnvelope(envelopes(Seq(
      """{"op":"c","after":{"id":1,"name":"a"},"source":{"ts_ms":100,"file":"f1","pos":1}}""",
      """{"op":"u","after":{"id":1,"name":"b"},"source":{"ts_ms":200,"file":"f1","pos":2}}""",
      """{"op":"d","before":{"id":1},"source":{"ts_ms":300,"file":"f1","pos":3}}""")),
      withBinlogPosition = true)
    val rows = out.orderBy("kbc__pos").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("name") == "a" && rows(0).getAs[String]("__deleted") == "false")
    assert(rows(1).getAs[String]("name") == "b")
    // delete rewrite: only the pk survives (Postgres default replica identity), __deleted=true
    assert(rows(2).getAs[Int]("id") == 1 && rows(2).isNullAt(rows(2).fieldIndex("name")))
    assert(rows(2).getAs[String]("__deleted") == "true")
    assert(rows(2).getAs[String]("kbc__operation") == "d")
  }

  test("unwrapEnvelope drops tombstones and truncates") {
    val out = Cdc.unwrapEnvelope(envelopes(Seq(
      """{"op":"c","after":{"id":1,"name":"a"},"source":{"ts_ms":1,"file":"f","pos":1}}""",
      """{"op":"d","source":{"ts_ms":2,"file":"f","pos":2}}""",
      """{"op":"t","after":{"id":9,"name":"t"},"source":{"ts_ms":3,"file":"f","pos":3}}""")))
    assert(out.count() == 1)
  }

  test("dedupeLastWins keeps latest row per key; agrees with window form") {
    val df = Seq(
      (1, "v1", 10L), (1, "v2", 20L), (1, "v3", 30L),
      (2, "w1", 15L), (2, "w2", 25L),
      (3, "x1", 5L)
    ).toDF("id", "payload", "kbc__batch_event_order")
    val agg = Cdc.dedupeLastWins(df, Seq("id")).orderBy("id").collect()
    val win = Cdc.dedupeLastWinsWindow(df, Seq("id")).orderBy("id").collect()
    assert(agg.toSeq == win.toSeq)
    assert(agg.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "v3"), (2, "w2"), (3, "x1")))
  }

  test("dedupe golden: inserts + updates + delete -> latest u rows plus NULL-padded d row") {
    // Shape of the reference golden case: 2 inserts, updates on pk=1, delete of pk=2.
    val df = Seq(
      (1, Some("a"), "c", "false", 1L), (2, Some("b"), "c", "false", 2L),
      (1, Some("a2"), "u", "false", 3L), (1, Some("a3"), "u", "false", 4L),
      (2, None: Option[String], "d", "true", 5L)
    ).toDF("id", "name", "kbc__operation", "__deleted", "kbc__batch_event_order")
    val out = Cdc.dedupeLastWins(df, Seq("id")).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("name") == "a3" && out(0).getAs[String]("kbc__operation") == "u")
    assert(out(1).isNullAt(1) && out(1).getAs[String]("__deleted") == "true")
  }

  test("effectivePks falls back to all non-system columns (both spellings)") {
    val df = Seq((1, "a", 1L, "x")).toDF("id", "name", "KBC__BATCH_EVENT_ORDER", "kbc__operation")
    assert(Cdc.effectivePks(df, Seq.empty) == Seq("id", "name"))
    assert(Cdc.effectivePks(df, Seq("id")) == Seq("id"))
  }

  test("unionEpochs pads missing columns with NULL, preserves first-seen order") {
    val e1 = Seq((1, "a")).toDF("id", "name")
    val e2 = Seq((2, "b", 3.5)).toDF("id", "name", "score")
    val out = Cdc.unionEpochs(Seq(e1, e2))
    assert(out.columns.toSeq == Seq("id", "name", "score"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) == 3.5)
  }

  test("missingColumns detects drift") {
    val cur = StructType(Seq(StructField("a", IntegerType)))
    val inc = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    assert(Cdc.missingColumns(cur, inc).map(_.name) == Seq("b"))
    assert(Cdc.missingColumns(inc, cur).isEmpty)
  }

  test("reconcileWithStorage retains dropped storage columns as typed NULLs") {
    val df = Seq((1, "a")).toDF("id", "name")
    val storage = StructType(Seq(
      StructField("id", IntegerType), StructField("legacy_col", DoubleType)))
    val out = Cdc.reconcileWithStorage(df, storage)
    assert(out.columns.toSeq == Seq("id", "name", "legacy_col"))
    assert(out.schema("legacy_col").dataType == DoubleType)
    assert(out.collect().head.isNullAt(2))
  }

  test("assignEventOrder produces a dense 0-based total order consistent with the sort key") {
    val df = Seq((30L, "c"), (10L, "a"), (20L, "b"), (40L, "d"), (5L, "z"))
      .toDF("ts", "v")
    val out = Cdc.assignEventOrder(df, Seq(col("ts"))).orderBy("kbc__batch_event_order").collect()
    assert(out.map(_.getAs[Long]("kbc__batch_event_order")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_.getAs[String]("v")).toSeq == Seq("z", "a", "b", "c", "d"))
  }

  test("assignPrefixSums == window cumulative, exact across many partitions") {
    val rng = new scala.util.Random(3)
    val df = (1 to 5000).map(_ => (rng.nextInt(10000).toLong, rng.nextInt(100).toLong,
      rng.nextInt(100).toLong)).toDF("k", "x", "y").repartition(16)
    val out = Cdc.assignPrefixSums(df, Seq(col("k").desc, col("x")), Seq("x", "y"))
      .orderBy(col("k").desc, col("x")).collect()
    var (cx, cy) = (0L, 0L)
    out.foreach { r =>
      cx += r.getAs[Long]("x"); cy += r.getAs[Long]("y")
      assert(r.getAs[Long]("x_cum") == cx && r.getAs[Long]("y_cum") == cy,
        s"prefix mismatch at k=${r.getAs[Long]("k")}")
    }
    assert(out.length == 5000)
  }

  test("normalizeColumns + safeTableId") {
    val df = Seq((1, "c", 5L)).toDF("id", "kbc__operation", "kbc__batch_event_order")
    assert(Cdc.normalizeColumns(df).columns.toSeq ==
      Seq("id", "KBC__OPERATION", "KBC__BATCH_EVENT_ORDER"))
    assert(Cdc.safeTableId("topic.inventory.sales") == "topic_inventory_sales")
  }

  test("syntheticKey concatenates pk columns with pipe") {
    val df = Seq(("x", 1)).toDF("a", "b")
    val out = df.select(Cdc.syntheticKey(Seq("a", "b")).as("k")).collect()
    assert(out.head.getString(0) == "x|1")
  }

  test("binlogOrder: compound (file, pos) order survives file rollover") {
    val df = Seq(
      ("k", "mysql-bin.000001", 999999999L, "old"),
      ("k", "mysql-bin.000002", 5L, "new")) // later FILE wins even at a tiny pos
      .toDF("id", "kbc__file", "kbc__pos", "v")
      .withColumn("ord", Cdc.binlogOrder(col("kbc__file"), col("kbc__pos")))
    val winner = Cdc.dedupeLastWins(df, Seq("id"), orderCol = "ord").collect()
    assert(winner.length == 1 && winner.head.getAs[String]("v") == "new")
    // order is strictly increasing along (file, pos)
    val ords = df.orderBy(col("kbc__file"), col("kbc__pos")).select("ord").collect().map(_.getLong(0))
    assert(ords.sameElements(ords.sorted))
  }
}
