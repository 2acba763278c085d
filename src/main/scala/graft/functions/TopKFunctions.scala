package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** One top-k entry: score, tiebreak id, serialized payload row. */
final case class TopKEntry(score: Double, tiebreak: Long, row: UnsafeRow)

/**
 * `top_k_by_score(score, tiebreak, payload, k)` — the k best payload structs per group,
 * ordered by (score DESC, tiebreak ASC). Identical semantics to
 * `row_number() OVER (ORDER BY score DESC, tiebreak) <= k` but as a
 * TypedImperativeAggregate: plans as **ObjectHashAggregate** with map-side partial
 * bounded heaps — each map task reduces its candidates to ≤ k rows per group before the
 * exchange, and nothing is ever sorted beyond the k-element heap. For ANN ranking, where
 * candidates per query can be the whole corpus, this is the difference between shuffling
 * k rows and shuffling (then sorting) every candidate.
 */
case class TopKByScore(
    score: Expression,
    tiebreak: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[TopKEntry]] {

  require(k > 0)
  private lazy val payloadSchema = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadSchema)

  /** Worst entry first (min-heap under the better-than order), so `dequeue` evicts it. */
  private val worstFirst: Ordering[TopKEntry] = new Ordering[TopKEntry] {
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      val byScore = java.lang.Double.compare(b.score, a.score) // lower score = "greater" = polled first
      if (byScore != 0) byScore else java.lang.Long.compare(a.tiebreak, b.tiebreak)
    }
  }
  private def better(a: TopKEntry, b: TopKEntry): Boolean =
    a.score > b.score || (a.score == b.score && a.tiebreak < b.tiebreak)

  override def children: Seq[Expression] = Seq(score, tiebreak, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  /** Analysis-time contract (the update path casts unchecked): DOUBLE score, LONG tiebreak,
    * STRUCT payload — a mistyped column through the SQL surface (`graft_top_k`) fails the
    * query at analysis instead of as an executor ClassCastException. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (score.dataType != DoubleType)
      TypeCheckFailure(s"top_k_by_score: score must be DOUBLE, got ${score.dataType.sql}")
    else if (tiebreak.dataType != LongType)
      TypeCheckFailure(s"top_k_by_score: tiebreak must be BIGINT, got ${tiebreak.dataType.sql}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckFailure(s"top_k_by_score: payload must be a STRUCT, got ${payload.dataType.sql}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[TopKEntry] =
    new mutable.PriorityQueue[TopKEntry]()(worstFirst)

  private def offer(buf: mutable.PriorityQueue[TopKEntry], e: TopKEntry): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (better(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }

  override def update(buf: mutable.PriorityQueue[TopKEntry], input: InternalRow): mutable.PriorityQueue[TopKEntry] = {
    val s = score.eval(input)
    val t = tiebreak.eval(input)
    val p = payload.eval(input)
    if (s != null && t != null && p != null) {
      val e = TopKEntry(s.asInstanceOf[Double], t.asInstanceOf[Long],
        toUnsafe(p.asInstanceOf[InternalRow]).copy())
      offer(buf, e)
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[TopKEntry], b: mutable.PriorityQueue[TopKEntry]): mutable.PriorityQueue[TopKEntry] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[TopKEntry]): Any = {
    val sorted = buf.toArray.sortWith(better) // best-first output order
    new GenericArrayData(sorted.map(_.row.asInstanceOf[Any]))
  }

  override def serialize(buf: mutable.PriorityQueue[TopKEntry]): Array[Byte] = {
    val entries = buf.toArray
    val totalRowBytes = entries.map(_.row.getSizeInBytes).sum
    val out = java.nio.ByteBuffer.allocate(4 + entries.length * 20 + totalRowBytes)
    out.putInt(entries.length)
    entries.foreach { e =>
      out.putDouble(e.score).putLong(e.tiebreak).putInt(e.row.getSizeInBytes)
      e.row.writeTo(out)
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[TopKEntry] = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = in.getInt
    (0 until n).foreach { _ =>
      val s = in.getDouble; val t = in.getLong; val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(payloadSchema.length)
      row.pointTo(rowBytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      buf.enqueue(TopKEntry(s, t, row))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), tiebreak = c(1), payload = c(2))
}

object TopKFunctions {
  /** Column API: k best payload structs by (score DESC, tiebreak ASC), best-first array. */
  def topKByScore(score: Column, tiebreak: Column, payload: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(tiebreak), expression(payload), k)
      .toAggregateExpression())
}
