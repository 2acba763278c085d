package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership-sketch expressions: probe a pre-built Bloom filter inside the scan.
 *
 * The filter is a driver-side model artifact (like the ANN centroids/codebooks) that
 * ships serialized inside the plan and deserializes ONCE per executor (transient lazy),
 * so a 10⁹-entry blocklist probes as ~1.2 GB of bits instead of an 8 GB broadcast join
 * side — the membership structure for decontamination / blocklisting when the deny-list
 * outgrows an exact broadcast.
 */
object SketchExpressions {

  /** `bloom_might_contain_long(hash)` — BloomFilter membership for a long key. Spark's
    * `util.sketch.BloomFilter` hashes with seeded Murmur3 and inserts by bit-OR, so the
    * filter is deterministic for a given item SET regardless of insertion order or
    * partitioning; no false negatives by construction. */
  case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    @transient private lazy val filter: BloomFilter =
      BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))
    override protected def nullSafeEval(a: Any): Any =
      filter.mightContainLong(a.asInstanceOf[Long])
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}

/** Column-level API. */
object SketchFunctions {
  import SketchExpressions._

  /** Serialize a Spark BloomFilter for shipping inside a plan. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def bloomMightContainLong(hash: Column, filterBytes: Array[Byte]): Column =
    column(BloomMightContainLong(expression(hash), filterBytes))
}
