package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Mutable buffer: highest order seen + that row's payload. */
final class LatestBuf(var order: Long, var row: InternalRow)

/**
 * `latest_struct(order, payload)` — keep the payload struct of the row with the highest
 * `order`. The engine core of last-write-wins dedupe (D1/D2).
 *
 * Why not `max_by(struct(...), order)`: MaxBy is a DeclarativeAggregate whose buffer holds
 * the struct itself; struct-typed buffers are not hash-aggregatable, so Spark plans a
 * **SortAggregate** — every partition gets fully sorted before aggregation, which at CDC
 * scale is the same cost as the window formulation. A TypedImperativeAggregate instead
 * plans as **ObjectHashAggregate**: map-side partial aggregation with no sort on either
 * side of the exchange; shuffled bytes shrink to one buffered row per (partition × key).
 */
case class LatestStruct(
    order: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestBuf] {

  private lazy val payloadSchema = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadSchema)

  override def children: Seq[Expression] = Seq(order, payload)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  /** Analysis-time contract (the update path casts unchecked): LONG order, STRUCT payload —
    * a mistyped column through the SQL surface (`graft_latest_struct`) fails at analysis
    * instead of as an executor ClassCastException. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (order.dataType != LongType)
      TypeCheckFailure(s"latest_struct: order must be BIGINT, got ${order.dataType.sql}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckFailure(s"latest_struct: payload must be a STRUCT, got ${payload.dataType.sql}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): LatestBuf = new LatestBuf(Long.MinValue, null)

  override def update(buf: LatestBuf, input: InternalRow): LatestBuf = {
    val o = order.eval(input)
    if (o != null) {
      val ord = o.asInstanceOf[Long]
      if (buf.row == null || ord > buf.order) {
        buf.order = ord
        val p = payload.eval(input)
        buf.row = if (p == null) null else toUnsafe(p.asInstanceOf[InternalRow]).copy()
      }
    }
    buf
  }

  override def merge(a: LatestBuf, b: LatestBuf): LatestBuf =
    if (b.row != null && (a.row == null || b.order > a.order)) b else a

  override def eval(buf: LatestBuf): Any = buf.row

  override def serialize(buf: LatestBuf): Array[Byte] = {
    if (buf.row == null) return Array.emptyByteArray
    val row = buf.row match {
      case u: UnsafeRow => u
      case r            => toUnsafe(r)
    }
    val rowBytes = row.getBytes
    val out = new Array[Byte](8 + rowBytes.length)
    java.nio.ByteBuffer.wrap(out).putLong(buf.order).put(rowBytes)
    out
  }

  override def deserialize(bytes: Array[Byte]): LatestBuf = {
    if (bytes.isEmpty) return createAggregationBuffer()
    val ord = java.nio.ByteBuffer.wrap(bytes).getLong
    val row = new UnsafeRow(payloadSchema.length)
    row.pointTo(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + 8, bytes.length - 8)
    new LatestBuf(ord, row)
  }

  override def withNewMutableAggBufferOffset(n: Int): LatestStruct = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): LatestStruct = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(order = c(0), payload = c(1))
}

object AggregateFunctions {
  /** Column API: latest payload struct by long `order`. */
  def latestStruct(order: Column, payload: Column): Column =
    column(LatestStruct(expression(order), expression(payload)).toAggregateExpression())
}
