package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.streaming.CdcRunner
import graft.streaming.CdcRunner.RunConfig

/**
 * Literal replica of the reference's golden dedupe case
 * (`ex_postgres_cdc/tests/functional/incremental-dedupe-chained/02_inserts_updates_deletes`,
 * FIXTURES.md §1): the 12-column `inventory.sales` table keyed on `createdate`;
 * 3 inserts + 3×3 updates + 1 delete ⇒ survivors are the latest `u` row per key plus the
 * deleted key as a NULL-padded `d,true` row (delete carries only the PK under Postgres
 * default replica identity). Normalization mirrors the reference harness
 * (`db_components/debezium/tests/functional.py:102-135`): drop `KBC__EVENT_TIMESTAMP_MS`,
 * sort by `KBC__BATCH_EVENT_ORDER`.
 */
class GoldenSpec extends SparkSpec {

  private val cols = Seq("usergender", "usercity", "usersentiment", "zipcode", "sku",
    "createdate", "category", "price", "county", "countycode", "userstate", "categorygroup")

  private def payload(createdate: String, tag: String): String =
    cols.map {
      case "createdate"    => s""""createdate":"$createdate""""
      case "usersentiment" => s""""usersentiment":1"""
      case "price"         => s""""price":"708.00000""""  // decimal.handling.mode=string
      case c               => s""""$c":"$tag-$c""""
    }.mkString("{", ",", "}")

  test("incremental-dedupe-chained/02: 3 inserts + 9 updates + 1 delete golden survivors") {
    val base = Files.createTempDirectory("graft-golden").toString
    val spool = s"$base/spool"
    Files.createDirectories(Paths.get(spool))

    var pos = 0
    def ev(op: String, key: String, tag: String): String = {
      pos += 1
      val after = if (op == "d") "null" else payload(key, tag)
      val before = if (op == "d") s"""{"createdate":"$key"}""" else s"""{"createdate":"$key"}"""
      val b = if (op == "c" || op == "r") "null" else before
      s"""{"table":"inventory.sales","op":"$op","after":$after,"before":$b,"source":{"ts_ms":${1000 + pos}}}"""
    }

    val keys = Seq("2023-01-01", "2023-01-02", "2023-01-03")
    val inserts = keys.map(k => ev("c", k, "ins"))
    val updates = (1 to 3).flatMap(round => keys.map(k => ev("u", k, s"upd$round")))
    val delete = Seq(ev("d", "2023-01-03", ""))
    Files.write(Paths.get(spool, "000.jsonl"), (inserts ++ updates ++ delete).asJava)

    val res = CdcRunner.run(spark, RunConfig(
      spoolDir = spool, workDir = s"$base/work", outDir = s"$base/out",
      primaryKeys = Map("inventory_sales" -> Seq("createdate"))))
    assert(res.tables == Map("inventory_sales" -> 3L))

    // read back the sliced CSV and normalize like the reference harness
    val outDir = s"$base/out/tables/inventory_sales.csv"
    val lines = Option(new java.io.File(outDir).listFiles()).get
      .filter(_.getName.endsWith(".csv"))
      .flatMap(f => Files.readAllLines(f.toPath).asScala)
      .sortBy(_.split(",").last.toInt) // sort by KBC__BATCH_EVENT_ORDER (last column)

    assert(lines.length == 3)
    // survivors for keys 1,2: the round-3 update row, op 'u', not deleted
    for (k <- Seq("2023-01-01", "2023-01-02")) {
      val row = lines.find(_.contains(k)).get
      assert(row.contains("upd3-usercity") && row.contains(",u,") && row.contains("false"))
    }
    // deleted key: NULL-padded except the pk, op 'd', deleted=true — the golden
    // `,,,,,2023-01-03,,,,,,,d,true,<order>` shape (payload columns inference-ordered)
    val del = lines.find(_.contains(",d,")).get
    assert(del.contains("2023-01-03") && del.contains("true"))
    val fields = del.split(",", -1)
    // 12 payload columns + op/deleted/order/ts: all payload fields except createdate empty
    assert(fields.count(_.isEmpty) == 11)
  }

  test("chained run 03: table addition after state, snapshot backfill merges cleanly") {
    val base = Files.createTempDirectory("graft-golden2").toString
    val spool = s"$base/spool"
    Files.createDirectories(Paths.get(spool))
    Files.write(Paths.get(spool, "000.jsonl"), Seq(
      """{"table":"inventory.sales","op":"r","after":{"createdate":"2023-01-01","sku":"a"},"before":null,"source":{"ts_ms":1}}""",
      """{"table":"inventory.products","op":"r","after":{"id":1,"name":"widget"},"before":null,"source":{"ts_ms":2}}""").asJava)
    val cfg1 = RunConfig(spoolDir = spool, workDir = s"$base/work", outDir = s"$base/out",
      includeTables = Some(Set("inventory.sales")),
      primaryKeys = Map("inventory_sales" -> Seq("createdate")))
    val r1 = CdcRunner.run(spark, cfg1)
    assert(r1.tables.keySet == Set("inventory_sales"))

    val added = CdcRunner.detectNewTables(Seq("inventory.sales", "inventory.products"), r1.tables.keySet)
    val r2 = CdcRunner.run(spark, cfg1.copy(
      includeTables = Some(Set("inventory.sales", "inventory.products")),
      primaryKeys = cfg1.primaryKeys + ("inventory_products" -> Seq("id")),
      snapshotTables = added))
    assert(r2.tables.keySet == Set("inventory_sales", "inventory_products"))
    assert(r2.tables("inventory_products") == 1L)
  }
}
