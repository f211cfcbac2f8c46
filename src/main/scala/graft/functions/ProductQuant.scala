package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — the FAISS `IVF,PQ` family): split
  * a d-dim vector into m subvectors, quantize each against its own k-entry
  * codebook, and store only the m code indices. With m=16, k=16 a 64-dim
  * float vector compresses 256 B → 16 nibble codes (16 B as ints here; 8 B
  * packed), which is what makes a 100 TB embedding corpus scannable:
  * candidate scoring reads the code column, never the float vectors.
  *
  * Scoring is ADC (asymmetric distance computation): the query stays
  * full-precision and dot(q, x) ≈ Σ_s <q_s, centroid_{s, code_s(x)}>.
  * Production engines precompute the m×k lookup table once per query;
  * these row-expressions recompute the subspace dot per row, which is the
  * same arithmetic without the per-query memoization — the bandwidth
  * saving (the whole point at scale) is identical.
  *
  * The codebook rides inside the expression (an index artifact, trained
  * once per corpus and broadcast with the task closure — same lifecycle as
  * the IVF coarse codebook).
  */
object ProductQuant {

  type Codebook = Array[Array[Array[Float]]] // [subspace][centroid][dim]

  /** Deterministic local Lloyd training per subspace: init = every
    * (n/k)-th sample in input order, fixed iteration count, means rounded
    * to a 1e-4 grid (so accumulation order cannot perturb the codebook).
    * Training data is a bounded sample collected to the driver — the
    * standard index-build pattern (a codebook is m·k·(d/m) floats, tiny).
    * Empty cells keep their previous centroid.
    */
  def train(vecs: Array[Array[Float]], m: Int, k: Int, iters: Int): Codebook = {
    require(vecs.nonEmpty && vecs(0).length % m == 0,
      s"dim ${vecs.headOption.map(_.length)} not divisible into $m subspaces")
    val sub = vecs(0).length / m
    Array.tabulate(m) { s =>
      val xs = vecs.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      var cents = Array.tabulate(k)(i => xs((i.toLong * xs.length / k).toInt % xs.length).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(k, sub)(0.0)
        val cnt = Array.fill(k)(0L)
        for (x <- xs) {
          val c = nearestCentroid(cents, x)
          cnt(c) += 1
          var j = 0
          while (j < sub) { sums(c)(j) += x(j); j += 1 }
        }
        cents = Array.tabulate(k) { c =>
          if (cnt(c) == 0) cents(c)
          else Array.tabulate(sub)(j =>
            (math.round(sums(c)(j) / cnt(c) * 10000.0) / 10000.0).toFloat)
        }
      }
      cents
    }
  }

  /** Nearest centroid by L2, ties to the lowest index (deterministic). */
  def nearestCentroid(cents: Array[Array[Float]], x: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      var d = 0.0
      var j = 0
      while (j < x.length) {
        val t = x(j).toDouble - cents(c)(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  def encode(v: Column, cb: Codebook): Column = toColumn(PqEncode(toExpression(v), cb))

  def adcDot(codes: Column, query: Column, cb: Codebook): Column =
    toColumn(PqAdcDot(toExpression(codes), toExpression(query), cb))
}

/** `pq_encode(embedding)` → the m code indices (nearest centroid per
  * subspace, L2, ties to the lowest index). One row-local primitive loop.
  */
case class PqEncode(child: Expression, cb: ProductQuant.Codebook)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_encode requires array<float>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val m = cb.length
    val sub = cb(0)(0).length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val x = new Array[Float](sub)
      var j = 0
      while (j < sub) { x(j) = arr.getFloat(s * sub + j); j += 1 }
      codes(s) = ProductQuant.nearestCentroid(cb(s), x)
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** `pq_adc_dot(codes, query)` ≈ dot(query, original vector): Σ over
  * subspaces of <query_s, centroid_{s, codes_s}> — asymmetric distance,
  * full-precision query against the quantized data side.
  */
case class PqAdcDot(left: Expression, right: Expression, cb: ProductQuant.Codebook)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_adc_dot requires (array<int>, array<float>), got $other")
  }

  override protected def nullSafeEval(codesAny: Any, queryAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = queryAny.asInstanceOf[ArrayData]
    val m = cb.length
    val sub = cb(0)(0).length
    var acc = 0.0
    var s = 0
    while (s < m) {
      val cent = cb(s)(codes.getInt(s))
      var j = 0
      while (j < sub) {
        acc += q.getFloat(s * sub + j).toDouble * cent(j)
        j += 1
      }
      s += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDot =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc_dot"
}
