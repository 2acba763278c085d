package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/**
 * Frequent Directions matrix sketch (Liberty 2013, "Simple and Deterministic Matrix
 * Sketching"; mergeability: Ghashami, Liberty, Phillips & Woodruff 2016) — the
 * MATRIX member of the mergeable-summary family next to the Munro–Paterson quantile
 * compactor and hll_sketch_agg: an ℓ×d sketch B of the n×d embedding stream with the
 * deterministic guarantee
 *
 *    0 ⪯ AᵀA − BᵀB ⪯ (2‖A‖_F² / ℓ)·I
 *
 * i.e. the d×d second-moment (covariance direction) structure of a 100 TB embedding
 * corpus is preserved to additive spectral error by O(ℓ·d) state — streaming PCA /
 * covariance drift without ever materializing AᵀA from raw data twice.
 *
 * Mechanics: rows fill the buffer; when full, SVD(B) and "shrink" — subtract the
 * (ℓ/2)-th squared singular value from every σ², zero the tail, keep the top ℓ/2
 * rows of Σ'Vᵀ. merge() inserts the other sketch's rows through the same path
 * (FD is a mergeable summary: any merge tree gives the same bound). The OUTPUT
 * rows depend on partial-aggregation order (floating SVD), so gates pin the
 * GUARANTEE (PSD + spectral bound vs the exact gram), never row values — the ANN
 * verdict-gate discipline.
 */
object FdExpressions {

  final class FdBuf(val l: Int, var d: Int) {
    // row-major ℓ×d once d is known (first row fixes it)
    var data: Array[Double] = _
    var n: Int = 0
    def ensure(dim: Int): Unit = {
      if (data == null) { d = dim; data = new Array[Double](l * d) }
      require(dim == d, s"dimension drift: got $dim, sketch is $d")
    }
    def insert(row: Array[Double]): Unit = {
      ensure(row.length)
      if (n == l) shrink()
      System.arraycopy(row, 0, data, n * d, d)
      n += 1
    }
    /** SVD + shrink to ℓ/2 rows (Liberty's algorithm, the halving variant). */
    def shrink(): Unit = {
      if (n == 0) return
      val m = breeze.linalg.DenseMatrix.tabulate(n, d)((i, j) => data(i * d + j))
      val svd = breeze.linalg.svd.reduced(m)
      val s = svd.singularValues
      val keep = l / 2
      val delta = if (s.length > keep - 1) s(keep - 1) * s(keep - 1) else 0.0
      java.util.Arrays.fill(data, 0.0)
      val rows = math.min(keep, s.length)
      var i = 0
      while (i < rows) {
        val s2 = s(i) * s(i) - delta
        val sNew = if (s2 > 0) math.sqrt(s2) else 0.0
        if (sNew > 0) {
          var j = 0
          while (j < d) { data(i * d + j) = sNew * svd.Vt(i, j); j += 1 }
        }
        i += 1
      }
      n = rows
    }
    def mergeIn(o: FdBuf): Unit = {
      if (o.data == null) return
      val row = new Array[Double](o.d)
      var i = 0
      while (i < o.n) {
        System.arraycopy(o.data, i * o.d, row, 0, o.d)
        insert(row)
        i += 1
      }
    }
  }

  /** `fd_sketch_agg(vec, l)` → array<array<double>>: the ℓ/2..ℓ sketch rows. */
  case class FdSketchAgg(
      child: Expression,
      l: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[FdBuf] {
    require(l >= 2 && l % 2 == 0, "sketch size l must be an even number >= 2")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

    override def createAggregationBuffer(): FdBuf = new FdBuf(l, -1)

    override def update(buf: FdBuf, input: InternalRow): FdBuf = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        val row = new Array[Double](arr.numElements())
        var i = 0
        // accepts float or double element types
        child.dataType.asInstanceOf[ArrayType].elementType match {
          case FloatType  => while (i < row.length) { row(i) = arr.getFloat(i).toDouble; i += 1 }
          case DoubleType => while (i < row.length) { row(i) = arr.getDouble(i); i += 1 }
          case other => throw new IllegalArgumentException(s"fd_sketch_agg: $other")
        }
        buf.insert(row)
      }
      buf
    }

    override def merge(a: FdBuf, b: FdBuf): FdBuf = { a.mergeIn(b); a }

    override def eval(buf: FdBuf): Any = {
      val rows = (0 until buf.n).map { i =>
        new GenericArrayData(
          java.util.Arrays.copyOfRange(buf.data, i * buf.d, (i + 1) * buf.d))
      }
      new GenericArrayData(rows.toArray[Any])
    }

    override def serialize(buf: FdBuf): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.n); out.writeInt(if (buf.data == null) -1 else buf.d)
      var i = 0
      while (buf.data != null && i < buf.n * buf.d) { out.writeDouble(buf.data(i)); i += 1 }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): FdBuf = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = new FdBuf(l, -1)
      val n = in.readInt(); val d = in.readInt()
      if (d > 0) {
        buf.d = d; buf.data = new Array[Double](l * d); buf.n = n
        var i = 0
        while (i < n * d) { buf.data(i) = in.readDouble(); i += 1 }
      }
      buf
    }

    override def withNewMutableAggBufferOffset(n: Int): FdSketchAgg = copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): FdSketchAgg = copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c.head)
  }
}

object FdSketch {
  /** Frequent Directions sketch of an `array<float|double>` column: ℓ rows × d. */
  def fdSketchAgg(vec: Column, l: Int = 16): Column =
    column(FdExpressions.FdSketchAgg(expression(vec), l).toAggregateExpression())
}
