package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: `minhash_sig(token, k)` computes
  * the k-slot signature (min over xxhash64(token, seed=i) per slot) in a
  * single aggregation, instead of k separate `min(hash_i(token))` columns —
  * one buffer of k longs per group, k hashes per input row, standard
  * partial/final merge by elementwise min. The estimator property:
  * E[matching slots / k] = Jaccard of the underlying sets.
  *
  * This is the custom-aggregate extension tier (SURVEY §4.2): a
  * TypedImperativeAggregate with its own serialized buffer, usable wherever
  * the declarative k-column formulation gets unwieldy (k = 64+).
  */
case class MinHashSig(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires string, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(s, StringType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSig =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSig =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashSig =
    copy(child = c.head)

  override def prettyName: String = "minhash_sig"
}

/** Scalar companion to the [[MinHashSig]] aggregate: the k-slot signature
  * computed from a PRE-HASHED per-doc token array (`array<long>`) in one
  * projection. This is the shape a session-cached per-doc hash-array table
  * already holds (`DedupQueries.docArrays`) — there the signature needs no
  * aggregation at all, and re-aggregating the exploded token stream would
  * pay a redundant groupBy shuffle plus k string-hashes per (doc, token,
  * slot) (the r4 bench's #2 cost). Slot i re-hashes each 64-bit token hash
  * with xxhash64 seed i — a fresh hash family over the token identity, so
  * the MinHash estimator property (P[slot match] = Jaccard) is unchanged.
  * The aggregate remains the one-pass path when no per-doc array exists
  * (e.g. signatures over a raw token stream).
  */
case class MinHashFromHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_from_hashes requires array<bigint>, got $other")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val buf = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(x, LongType, i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(c: Expression): MinHashFromHashes =
    copy(child = c)

  override def prettyName: String = "minhash_from_hashes"
}

object MinHashSig {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  def minhash_sig(c: Column, k: Int): Column =
    toColumn(MinHashSig(toExpression(c), k).toAggregateExpression())

  /** Signature from a pre-hashed token array — see [[MinHashFromHashes]]. */
  def minhash_from_hashes(c: Column, k: Int): Column =
    toColumn(MinHashFromHashes(toExpression(c), k))

  /** Signature-estimated Jaccard: fraction of matching slots. */
  def estJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a)
  }
}
