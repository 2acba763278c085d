package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Core CDC relational operators, Spark-first.
 *
 * The reference materializes change events into DuckDB chunk tables and dedupes with a
 * MAP/REDUCE of per-chunk window queries + an anti-join pk cache
 * (`db_components/db_common/staging.py:216-282`). On Spark the chunking machinery (a DuckDB
 * memory workaround) disappears: one `unionByName` + one window / aggregate over the shuffled
 * data does the whole job, spilling as needed, with AQE handling skew.
 */
object Cdc {

  /** Staging system columns (reference `AbstractDebeziumTask.java:136-141`,
    * `AbstractDbConverter.java:41`). */
  val OpCol        = "kbc__operation"
  val TsCol        = "kbc__event_timestamp"
  val FileCol      = "kbc__file"
  val PosCol       = "kbc__pos"
  val DeletedCol   = "__deleted"
  val OrderCol     = "kbc__batch_event_order"

  val SystemCols: Seq[String] = Seq(OpCol, TsCol, FileCol, PosCol, DeletedCol, OrderCol)

  /** Staging → output renames (reference `ex_postgres_cdc/src/component.py:61-64`,
    * `ex_mysql_cdc/src/component.py:70-75`). */
  val OutputRenames: Map[String, String] = Map(
    OpCol      -> "KBC__OPERATION",
    TsCol      -> "KBC__EVENT_TIMESTAMP_MS",
    FileCol    -> "KBC__FILE",
    PosCol     -> "KBC__POS",
    DeletedCol -> "KBC__DELETED",
    OrderCol   -> "KBC__BATCH_EVENT_ORDER")

  /**
   * P1+P2: unwrap a parsed Debezium envelope into flat payload columns + `kbc__*` system columns.
   *
   * Input must carry struct columns `before`, `after` and scalar `op`, plus a `source` struct with
   * `ts_ms` (and optionally `file`, `pos`). Semantics (reference SMT
   * `transforms/ExtractNewRecordStateSchemaChanges.java:153-229`):
   *  - tombstones (both states null) are dropped;
   *  - delete events keep the row, taking columns from `before` (under Postgres default replica
   *    identity only the PK is populated — we must NOT repair that, SURVEY §7.4.3), and get
   *    `__deleted = "true"`;
   *  - all other ops project `after` and `__deleted = "false"`.
   *
   * Pure column algebra: stays inside whole-stage codegen, no UDFs.
   *
   * PLAN NOTE — set `preFiltered = true` when the input's `before`/`after`/`op` columns are
   * projections of ONE expensive parse (e.g. `from_json(value).as("j")` then `j.*`):
   * Catalyst pushes this function's tombstone/truncate Filter through that projection,
   * substituting the aliases — the predicate then re-evaluates the FULL parse up to three
   * more times per row, outside whole-stage codegen (JsonToStructs is CodegenFallback, so
   * the interpreted Filter does no subexpression elimination; measured 1.6 s of a 1.8 s
   * query at sf0.1). Callers instead drop tombstones/truncates BELOW the parse with a
   * cheap raw predicate (`get_json_object(value, '$.op')` is a streaming early-exit parse)
   * and pass `preFiltered = true`.
   */
  def unwrapEnvelope(df: DataFrame, withBinlogPosition: Boolean = false,
      passthrough: Seq[String] = Nil, preFiltered: Boolean = false): DataFrame = {
    val payloadFields = df.schema("after").dataType.asInstanceOf[StructType].fieldNames
    val isDelete = col("op") === lit("d")
    val payloadCols = payloadFields.map { f =>
      when(isDelete, col(s"before.`$f`")).otherwise(col(s"after.`$f`")).as(f)
    }
    val sysCols = Seq(
      col("op").as(OpCol),
      col("source.ts_ms").as(TsCol)) ++
      (if (withBinlogPosition) Seq(col("source.file").as(FileCol), col("source.pos").as(PosCol)) else Nil) ++
      Seq(when(isDelete, lit("true")).otherwise(lit("false")).as(DeletedCol))
    val filtered =
      if (preFiltered) df
      else df.filter(col("after").isNotNull || col("before").isNotNull) // drop tombstones
        .filter(col("op") =!= lit("t"))                                 // drop truncates (SMT :208-213)
    filtered.select(payloadCols ++ sysCols ++ passthrough.map(col): _*)
  }

  /** D5: synthetic primary key — `CONCAT_WS('|', pk...)` (reference `staging.py:240-242`). */
  def syntheticKey(pks: Seq[String]): Column = concat_ws("|", pks.map(col): _*)

  private val AllSystemNames: Set[String] =
    (SystemCols ++ OutputRenames.values).map(_.toLowerCase).toSet

  /** D9: no-pkey fallback — key is every non-system column
    * (reference `ex_mysql_cdc/src/component.py:406-408`). Recognizes both staging
    * (`kbc__*`) and output (`KBC__*`) spellings of the system columns. */
  def effectivePks(df: DataFrame, pks: Seq[String]): Seq[String] =
    if (pks.nonEmpty) pks
    else df.columns.filterNot(c => AllSystemNames.contains(c.toLowerCase)).toSeq

  /**
   * D1+D2: last-write-wins dedupe — keep the latest row per key ordered by `orderCol`.
   *
   * Aggregate form over [[graft.functions.LatestStruct]] (a TypedImperativeAggregate, so the
   * plan is **ObjectHashAggregate**: map-side partial aggregation, no sort on either side of
   * the exchange — `max_by(struct)` would plan SortAggregate, a full per-partition sort).
   * At 100 TB each map task reduces its input to ≤ |distinct keys in partition| rows before
   * the exchange instead of shuffling every event. Replaces the reference's per-chunk
   * `ROW_NUMBER ... QUALIFY` MAP phase + anti-join REDUCE phase (`staging.py:245-282`) in one op.
   */
  def dedupeLastWins(df: DataFrame, pks: Seq[String], orderCol: String = OrderCol): DataFrame = {
    val keys = effectivePks(df, pks)
    val payload = df.columns.filterNot(keys.contains)
    if (payload.isEmpty) return df.distinct()
    df.groupBy(keys.map(col): _*)
      .agg(graft.functions.AggregateFunctions
        .latestStruct(col(orderCol).cast(LongType), struct(payload.map(col): _*)).as("__latest"))
      .select(keys.map(col) ++ payload.map(f => col(s"__latest.`$f`").as(f)): _*)
      .select(df.columns.map(col): _*) // restore original column order (P9)
  }

  /**
   * D1 salted form for pathological key skew: when one key owns a large fraction of all
   * events (a hot row updated millions of times), even partial aggregation leaves one
   * reducer with the hot key's full map-output. Phase 1 aggregates by (key, salt) —
   * spreading the hot key over `salts` reducers — phase 2 reduces the ≤`salts` survivors
   * per key. Deterministic: salt is a hash of the order column, and LWW is associative.
   */
  def dedupeLastWinsSalted(df: DataFrame, pks: Seq[String], orderCol: String = OrderCol,
      salts: Int = 32): DataFrame = {
    val keys = effectivePks(df, pks)
    val payload = df.columns.filterNot(keys.contains)
    if (payload.isEmpty) return df.distinct()
    val salted = df.withColumn("__salt", pmod(xxhash64(col(orderCol)), lit(salts)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(graft.functions.AggregateFunctions
        .latestStruct(col(orderCol).cast(LongType), struct(payload.map(col): _*)).as("__latest"))
      .select(keys.map(col) ++ Seq(col(s"__latest.`$orderCol`").as("__ord"), col("__latest")): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(graft.functions.AggregateFunctions
        .latestStruct(col("__ord"), col("__latest")).as("__latest2"))
      .select(keys.map(col) ++ payload.map(f => col(s"__latest2.`$f`").as(f)): _*)
      .select(df.columns.map(col): _*)
  }

  /**
   * SCD Type-2 history build from an ordered change stream (Kimball slowly-changing-
   * dimension type 2): collapse consecutive rows whose tracked attribute is unchanged,
   * then derive half-open `[valid_from, valid_to)` validity intervals per key —
   * `valid_to` = the next change's `valid_from`, NULL (open interval) for the current
   * row, plus a per-key `version` counter. The reference only materializes the
   * latest-state table (LWW dedupe, `staging.py:245-282`); Type-2 is the standard
   * warehouse companion built from the SAME ordered stream, so it belongs in the same
   * operator family.
   *
   * Scale: ONE exchange+sort on the key — `lag` (change detection), `lead`
   * (`valid_to`) and `row_number` (`version`) all ride the identical
   * `(keys, orderCols)` window, and the change filter between them preserves the
   * partitioning and sort order, so Catalyst plans a single shuffle. State per key is
   * O(1) streaming through the sorted run — no per-key buffering.
   *
   * @param orderCols total order within a key (first column becomes `valid_from`);
   *                  callers append a tiebreaker (e.g. event_id) for determinism.
   */
  def scd2History(df: DataFrame, keys: Seq[String], attr: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    df
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(attr))
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(w).cast(LongType))
      .select((keys.map(col) :+ col(attr)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"), col("version")): _*)
  }

  /**
   * Incremental SCD Type-2 maintenance — the O(batch + touched-keys) path a warehouse
   * runs per sync instead of recomputing [[scd2History]] over the full stream. Keys
   * absent from the batch pass through UNTOUCHED (no read amplification of the
   * history); for touched keys the stored history rows ARE the change points of the
   * prior stream, so re-collapsing (change points ∪ batch events) reproduces the
   * full-stream result exactly: collapse(collapse(A) ∪ B) = collapse(A ∪ B) whenever
   * every batch event orders after the key's history (the CDC in-order guarantee) —
   * the last change point carries the attribute state the first batch event must be
   * compared against.
   *
   * Scale: one semi/anti-join of the history on batch keys (batch side broadcasts in
   * the common small-sync case) + [[scd2History]] over |touched change points| +
   * |batch| rows. Nothing corpus-sized shuffles.
   *
   * @param history prior [[scd2History]] output for the same (keys, attr)
   * @param batch   new events with the same key/attr/order columns
   */
  def scd2Merge(history: DataFrame, batch: DataFrame, keys: Seq[String], attr: String,
      orderCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val batchKeys = batch.select(keyCols: _*).distinct()
    val untouched = history.join(broadcast(batchKeys), keys, "left_anti")
    // stored rows -> pseudo-events at their change position; secondary order columns
    // beyond the first are unknown for stored rows — use a value ordering BEFORE any
    // real event at the same primary order (change points were the FIRST event at
    // their position with that attribute, by construction)
    val touched = history.join(broadcast(batchKeys), keys, "left_semi")
    val pseudo = touched.select(
      (keyCols :+ col(attr) :+ col("valid_from").as(orderCols.head)) ++
        orderCols.tail.map(c => lit(Long.MinValue).as(c)): _*)
    val replay = scd2History(
      pseudo.unionByName(batch.select((keyCols :+ col(attr)) ++ orderCols.map(col): _*)),
      keys, attr, orderCols)
    untouched.unionByName(replay)
  }

  /**
   * Incremental materialized-view maintenance, step 1: derive the EXACT delta stream of
   * a keyed upsert/delete sequence (the before-image algebra Debezium envelopes carry;
   * here reconstructed from the ordered stream itself when the source omits
   * before-images). Per key, ordered by `orderCols`:
   *
   *   - dead state (first event, or predecessor was a delete) + delete  → no-op (0)
   *   - dead state + upsert → INSERT: `+value`
   *   - live state + delete → DELETE: `-prev_value`
   *   - live state + upsert → UPDATE: `+value - prev_value`
   *
   * Σ delta per key telescopes to the final live value (0 if dead) — so a SUM-shaped
   * materialized view updates from deltas alone, never re-reading the base table. The
   * window shares ONE keyed exchange+sort; deltas stay exact DECIMALs.
   */
  def upsertDeltas(df: DataFrame, keys: Seq[String], valueCol: String,
      deleteCol: Column, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    val prevV = lag(col(valueCol), 1).over(w)
    val prevDel = lag(deleteCol, 1).over(w)
    val dead = prevV.isNull || prevDel
    df.withColumn("delta",
      when(dead && deleteCol, lit(0).cast(df.schema(valueCol).dataType))
        .when(dead, col(valueCol))
        .when(deleteCol, -prevV)
        .otherwise(col(valueCol) - prevV))
  }

  /** D1 window form — identical semantics via `row_number`; kept for parity with the reference's
    * formulation (`staging.py:245-259`) and for cases needing the loser rows too. */
  def dedupeLastWinsWindow(df: DataFrame, pks: Seq[String], orderCol: String = OrderCol): DataFrame = {
    val keys = effectivePks(df, pks)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).cast(LongType).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * D6+P6+E2+E3: union chunks / schema epochs with NULL padding for columns absent in older
   * epochs. `unionByName(allowMissingColumns=true)` replaces the reference's explicit
   * `SELECT col, NULL as missing...` padding (`staging.py:299-317`) and `ALTER TABLE ADD COLUMN`
   * (`AppendDbConverter.java:53-71`).
   */
  def unionEpochs(epochs: Seq[DataFrame]): DataFrame =
    epochs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** E1: schema drift detection — fields present in `incoming` but not in `current`.
    * Reference `AbstractDbConverter.java:134-142`. */
  def missingColumns(current: StructType, incoming: StructType): Seq[StructField] =
    incoming.fields.filterNot(f => current.fieldNames.contains(f.name)).toSeq

  /**
   * E5: storage-schema reconciliation — output schema is (source-metadata ∩ result fields) ∪
   * columns already in storage (re-added as NULL of their previous type) ∪ system columns.
   * Dropped columns survive as NULLs. Reference `ex_postgres_cdc/src/component.py:392-428`.
   */
  def reconcileWithStorage(df: DataFrame, storageSchema: StructType): DataFrame = {
    val have = df.columns.toSet
    val retained = storageSchema.fields.filterNot(f => have.contains(f.name))
    retained.foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /**
   * D7: total event order consistent with arrival. For sources with a native position
   * (binlog file,pos / LSN) order is `(file, pos)`; otherwise `(ts, seq)`.
   * A global `row_number()` window would single-partition at 100 TB — this uses
   * sortWithinPartitions + per-partition offsets (zipWithIndex-style) so ordering is assigned
   * distributed: partition by a range on the sort key first for a globally consistent order.
   */
  def assignEventOrder(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(ranged.schema.fields :+ StructField(OrderCol, LongType, nullable = false))
    // localCheckpoint (NOT a bare persist) the sorted RDD: the counts pass and the
    // numbering pass must see the SAME partitioning/ordering (and the sort is paid
    // once, not twice). A bare persist() leaks a MEMORY_AND_DISK entry per call — the
    // returned DataFrame closes over the RDD and the caller can never unpersist it;
    // checkpoint blocks are freed by the ContextCleaner once the plan is GC'd
    // (same idiom as ev_path_perplexity, ADVICE r6).
    val sorted = ranged.rdd.localCheckpoint()
    val counts = sorted.mapPartitionsWithIndex(
      (i, it) => Iterator((i, it.size)), preservesPartitioning = true).collect().sortBy(_._1)
    val offsets = counts.map(_._2.toLong).scanLeft(0L)(_ + _)
    val bc = ranged.sparkSession.sparkContext.broadcast(offsets)
    val rdd = sorted.mapPartitionsWithIndex { (i, it) =>
      var n = bc.value(i) - 1
      it.map { r => n += 1; org.apache.spark.sql.Row.fromSeq(r.toSeq :+ n) }
    }
    ranged.sparkSession.createDataFrame(rdd, schema)
  }

  /**
   * Distributed EXACT prefix sums in a total order — [[assignEventOrder]]'s SUM
   * generalization: range-partition on `sortCols`, per-partition running sums of the
   * LONG `sumCols`, then broadcast per-partition offset vectors so every row carries
   * its exact global running total. Replaces the `sum().over(Window.orderBy(...))`
   * shape — which moves the WHOLE frame to one partition — for cumulative
   * distributions over high-cardinality grids (per-user spend, ranked scores).
   * One range shuffle + one tiny offsets collect (numPartitions × |sumCols| longs).
   */
  def assignPrefixSums(df: DataFrame, sortCols: Seq[Column],
      sumCols: Seq[String]): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val idx = sumCols.map(ranged.schema.fieldIndex).toArray
    val schema = StructType(ranged.schema.fields ++
      sumCols.map(c => StructField(c + "_cum", LongType, nullable = false)))
    val sorted = ranged.rdd.localCheckpoint() // same one-materialization idiom as assignEventOrder
    val partials = sorted.mapPartitionsWithIndex({ (i, it) =>
      val s = new Array[Long](idx.length)
      it.foreach { r =>
        var j = 0; while (j < idx.length) { s(j) += r.getLong(idx(j)); j += 1 }
      }
      Iterator((i, s))
    }, preservesPartitioning = true).collect().sortBy(_._1)
    val offsets = partials.map(_._2)
      .scanLeft(Array.fill(idx.length)(0L))((a, b) => a.zip(b).map(t => t._1 + t._2))
    val bc = ranged.sparkSession.sparkContext.broadcast(offsets)
    val rdd = sorted.mapPartitionsWithIndex { (i, it) =>
      val run = bc.value(i).clone()
      it.map { r =>
        var j = 0; while (j < idx.length) { run(j) += r.getLong(idx(j)); j += 1 }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    ranged.sparkSession.createDataFrame(rdd, schema)
  }

  /**
   * MySQL binlog total order: the `(file, pos)` compound key encoded as ONE long usable as
   * a dedupe `orderCol` — file rank = the numeric suffix of the binlog file name
   * (`mysql-bin.000007` → 7; names are zero-padded so lexicographic == numeric order),
   * shifted above the in-file byte position. A binlog file is capped at 1 GiB (`
   * max_binlog_size` ≤ 2³⁰ < 2⁴⁰), so `rank << 40 | pos` is collision-free and preserves
   * the reference's event ordering (`DbChangeConsumer.java:138-149`: compare file, then pos).
   */
  def binlogOrder(file: Column, pos: Column): Column =
    regexp_extract(file, "(\\d+)$", 1).cast(LongType) * lit(1L << 40) + pos

  /** P8: staging → output column naming (`component.py:579-595`). */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.withColumnsRenamed(OutputRenames)

  /** P8: table identifier normalization, dots → underscores (`AppendDbConverter.java:27`). */
  def safeTableId(topicSchemaTable: String): String = topicSchemaTable.replace('.', '_')

  /**
   * Outbox event routing (the Debezium EventRouter SMT contract, debezium.io outbox
   * pattern docs): change rows of an append-only outbox table route to
   * `<topicPrefix>.<aggregate type>`; DELETE events are skipped (outbox rows are often
   * purged right after insert — the router must not emit tombstones downstream). Each
   * routed row gets a contiguous per-(topic, aggregate key) sequence in change-log
   * order — exactly Kafka's ordering contract (order is guaranteed per topic PARTITION,
   * i.e. per key, never per topic), which is also what makes this scale: the window
   * partitions on (route, key) — the same key space the producer would hash-partition
   * by — so no single route ever serializes through one task.
   */
  def outboxRoute(unwrapped: DataFrame, routeCol: String, keyCol: String,
      topicPrefix: String = "outbox.event", posCol: String = "KBC__POS",
      opCol: String = "KBC__OPERATION"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("topic"), col(keyCol)).orderBy(col(posCol))
    unwrapped
      .filter(col(opCol) =!= lit("d"))
      .withColumn("topic", concat(lit(topicPrefix + "."), col(routeCol)))
      .withColumn("seq", row_number().over(w).cast(LongType))
  }
}
