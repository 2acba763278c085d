package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for each left row, attach the latest right row of the same
 * key whose time is <= the left row's time (optionally within a tolerance window). The
 * classic time-series/feature-store lookup a training-data pipeline needs when joining
 * events against slowly-changing state — an operator Spark has no built-in for.
 *
 * Implemented as a **union-merge**, not a range join:
 *
 *  1. tag right rows 0 / left rows 1 and union them (right carries its value columns in
 *     one struct; left's payload rides unchanged);
 *  2. one hash exchange on the key, one per-partition sort on (time, side) — exactly the
 *     shuffle+sort a sort-merge join would pay, with right rows ordering BEFORE left rows
 *     at equal times so the match is inclusive (`l.time >= r.time`);
 *  3. a running `last(rightStruct, ignoreNulls)` window carries the most recent right row
 *     forward into each left row. The whole right row is carried as ONE struct, so value
 *     columns can never mix across right rows.
 *
 * Why this shape at 100 TB: a naive `l JOIN r ON l.key = r.key AND r.time <= l.time`
 * explodes to every (left, earlier-right) pair before aggregating the max — O(|L|·|R|)
 * within each key. The union-merge is O(|L|+|R|) rows through one exchange, no
 * intermediate blowup, and AQE handles partition sizing. A key whose history is hot
 * (billions of rows under one key) serializes in the per-key sort like any keyed window;
 * the standard mitigation (time-bucket pre-split when a tolerance bounds the lookback)
 * composes on top.
 *
 * Ties: several right rows at the same (key, time) would make "the" latest row ambiguous;
 * callers wanting determinism should pre-dedupe the right side (e.g.
 * `groupBy(key, time).agg(max_by(...))`) — this operator keeps the LAST one in sort order.
 */
object AsOfJoin {

  /**
   * @param left      probe side; all its columns are preserved
   * @param right     build side: must contain `keys`, `timeCol` and `rightVals`
   * @param keys      equi-join key columns (present on both sides)
   * @param timeCol   ordering column, same name on both sides (numeric or timestamp)
   * @param rightVals right columns to attach (emitted as `<prefix><name>`, null when no
   *                  right row is at or before the left row's time)
   * @param tolerance max allowed `l.time - r.time` (same units as `timeCol`); matches
   *                  farther back are nulled out
   * @param prefix    prefix for the attached columns
   */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      rightVals: Seq[String],
      tolerance: Option[Column] = None,
      prefix: String = "asof_"): DataFrame = {
    require(rightVals.nonEmpty, "asofBackward: at least one right value column")
    // fail with a clear message instead of an analysis error / silently-wrong carry when
    // the left side already uses an internal or output name (ADVICE r3)
    val internal = Seq("__side", "__r", "__match")
    val outputs = rightVals.map(v => s"$prefix$v")
    val collisions = left.columns.toSeq.intersect(internal ++ outputs)
    require(collisions.isEmpty,
      s"asofBackward: left column(s) ${collisions.mkString(", ")} collide with reserved " +
        s"internal names (${internal.mkString(", ")}) or prefixed outputs " +
        s"(${outputs.mkString(", ")}); rename them or choose another prefix")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((keys :+ timeCol).map(col) :+
        struct((timeCol +: rightVals).distinct.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    // right rows contribute only key/time/__r; left payload columns null-pad on them
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = last(col("__r"), ignoreNulls = true).over(w)
    val carried1 = tolerance match {
      case Some(tol) =>
        when(col(timeCol).cast("long") - carried0.getField(timeCol).cast("long") <= tol, carried0)
      case None => carried0
    }
    // SQL equi-join semantics: a NULL key never matches (Window.partitionBy would
    // otherwise group all NULL-key rows into one partition and match them to each other,
    // diverging from the ASOF JOIN oracle)
    val carried = when(keys.map(col(_).isNotNull).reduce(_ && _), carried1)
    u.withColumn("__match", carried)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col("__match").getField(v).as(s"$prefix$v")): _*)
  }
}
