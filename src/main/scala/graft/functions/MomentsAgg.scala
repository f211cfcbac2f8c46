package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass second-moment accumulator over an embedding column — the
  * distributed half of PCA (and of covariance/whitening generally).
  *
  * `moments_agg(embedding, d)` folds every `array<float>` row into a single
  * flat buffer `[n, Σx (d), upper-tri Σxxᵀ (d(d+1)/2)]`. Update is one
  * d²/2 FMA sweep per row; partial/final merge is element-wise addition, so
  * the whole Gram matrix of a 100 TB corpus is ONE map-side-combined
  * aggregation — no shuffle of vectors, no iteration, and the reduced
  * state is d-bounded (d=64 → 2 145 doubles ≈ 17 KB per task), independent
  * of row count. The eigendecomposition that finishes PCA then runs on the
  * driver over the d×d covariance — a bounded artifact exactly like the
  * k-means / PQ codebooks (`ops/VectorQueries.scala`), which is the
  * standard split for tall-skinny PCA: the data-sized work distributes,
  * the d³ work is microscopic.
  *
  * Rows whose array is null, of the wrong length, or containing a null
  * element are skipped (counted by the caller via a separate `count` if
  * needed) — the moment sums must stay length-consistent.
  */
case class MomentsAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim > 0 && dim <= 4096, s"dim must be in [1,4096], got $dim")

  private val gramLen = dim * (dim + 1) / 2
  private val bufLen = 1 + dim + gramLen

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"moments_agg requires array<float|double>, got $other")
  }

  // lazy: the child is an UnresolvedAttribute at construction time
  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        // reject rows with null elements without partial accumulation
        var i = 0
        var ok = true
        while (ok && i < dim) { if (arr.isNullAt(i)) ok = false; i += 1 }
        if (ok) {
          val x = new Array[Double](dim)
          i = 0
          while (i < dim) {
            x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            i += 1
          }
          buf(0) += 1.0
          i = 0
          var g = 1 + dim
          while (i < dim) {
            buf(1 + i) += x(i)
            var j = i
            while (j < dim) {
              buf(g) += x(i) * x(j)
              g += 1
              j += 1
            }
            i += 1
          }
        }
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bufLen)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MomentsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MomentsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MomentsAgg =
    copy(child = c.head)

  override def prettyName: String = "moments_agg"
}

object MomentsAgg {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  def moments_agg(c: Column, dim: Int): Column =
    toColumn(MomentsAgg(toExpression(c), dim).toAggregateExpression())

  /** Driver-side finish: unpack the flat moments array into
    * (n, mean[d], sample covariance[d][d]).
    */
  def covariance(moments: Array[Double], dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val n = moments(0)
    require(n >= 2, s"need at least 2 rows for covariance, got $n")
    val mean = Array.tabulate(dim)(i => moments(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var g = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        // E[xy]·n − n·mx·my, normalized by n−1 (sample covariance)
        val c = (moments(g) - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c
        cov(j)(i) = c
        g += 1
        j += 1
      }
      i += 1
    }
    (n.toLong, mean, cov)
  }
}
