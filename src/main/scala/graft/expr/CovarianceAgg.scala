package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Second-moment accumulator over a vector column, for PCA and whitening:
  * one pass emits (n, Σx, Σxxᵀ) with the Gram matrix kept as its packed
  * upper triangle.
  *
  * This is the scale shape for covariance at 100 TB: the aggregation
  * buffer is a single fixed-size double array of d + d(d+1)/2 + 1 values
  * (for d = 64: ~2 KB), map-side partials combine by element-wise
  * addition, and the shuffle carries ONE buffer per partition — the data
  * never moves, only the sufficient statistics do. The alternative
  * columnwise formulation (d² named agg expressions) explodes plan size
  * and codegen at d ≥ 32; the explode-to-pairs formulation multiplies the
  * shuffle by d²; both are avoided here.
  *
  * Vectors empty or shorter than the first-seen dimension throw (corrupt input);
  * the aggregate evaluates to null over zero rows.
  */
case class CovarianceAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovarianceAgg.Buffer] {

  import CovarianceAgg.Buffer

  override def children: Seq[Expression] = Seq(child)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovarianceAgg =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(offset: Int): CovarianceAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): CovarianceAgg =
    copy(inputAggBufferOffset = offset)

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("prods", ArrayType(DoubleType, containsNull = false))))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"covariance_agg needs an array<float|double> column, got $other")
    }

  // Resolved only after analysis — must not be a constructor-time val.
  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Buffer = new Buffer

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    require(d >= 1, "covariance_agg saw an empty vector")
    buf.ensure(d)
    val x = buf.scratch
    var i = 0
    while (i < d) {
      // Null elements would silently become 0.0 through getFloat/getDouble
      // while still incrementing n — corrupt input must throw instead.
      require(!arr.isNullAt(i),
        s"covariance_agg saw a null element at position $i")
      x(i) = if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf.add(x)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: Buffer): Any = {
    if (buf.n == 0L) return null
    new GenericInternalRow(Array[Any](
      buf.n,
      new GenericArrayData(buf.sums.clone()),
      new GenericArrayData(buf.prods.clone())))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.d)
    out.writeLong(buf.n)
    if (buf.d > 0) {
      buf.sums.foreach(out.writeDouble)
      buf.prods.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Buffer
    val d = in.readInt()
    val n = in.readLong()
    buf.n = n
    if (d > 0) {
      buf.ensure(d)
      var i = 0
      while (i < d) { buf.sums(i) = in.readDouble(); i += 1 }
      i = 0
      while (i < buf.prods.length) { buf.prods(i) = in.readDouble(); i += 1 }
    }
    buf
  }
}

object CovarianceAgg {

  /** Mutable sufficient statistics: count, per-dimension sums, and the
    * packed upper triangle of Σxxᵀ (row-major: (i,j≥i) at
    * i*d - i(i-1)/2 + (j-i)).
    */
  final class Buffer {
    var d: Int = 0
    var n: Long = 0L
    var sums: Array[Double] = null
    var prods: Array[Double] = null
    var scratch: Array[Double] = null

    def ensure(dim: Int): Unit = {
      if (d == 0) {
        d = dim
        sums = new Array[Double](d)
        prods = new Array[Double](d * (d + 1) / 2)
        scratch = new Array[Double](d)
      } else require(dim == d,
        s"covariance_agg saw vectors of length $d and $dim")
    }

    def add(x: Array[Double]): Unit = {
      n += 1L
      var i = 0
      var p = 0
      while (i < d) {
        sums(i) += x(i)
        val xi = x(i)
        var j = i
        while (j < d) { prods(p) += xi * x(j); p += 1; j += 1 }
        i += 1
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      if (other.d == 0) return
      ensure(other.d)
      n += other.n
      var i = 0
      while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
      i = 0
      while (i < prods.length) { prods(i) += other.prods(i); i += 1 }
    }
  }
}
