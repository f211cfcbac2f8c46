package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.types._

/** Bloom-filter surface for INCREMENTAL dedup — the membership sketch that
  * lets a new batch of documents be deduplicated against an existing corpus
  * without joining the batch's every row against corpus history:
  *
  *   1. `bloom_agg(xxhash64(text), numBits, numHashes)` over the corpus —
  *      one pass, word-array buffer, partial/final merge is a bitwise OR —
  *      yields a byte blob (an index artifact, like the IVF codebook).
  *   2. `bloom_might_contain(lit(blob), xxhash64(text))` on the batch —
  *      row-local, codegen'd, no shuffle. `false` is DEFINITE (novel doc —
  *      skips all downstream joins); `true` is a candidate.
  *   3. Candidates alone verify with an exact anti-join against the corpus.
  *
  * At 100 TB the batch side is the high-volume side and mostly novel, so
  * step 2 prunes the expensive join to ~fpp·|batch| + true-dups rows.
  * Sizing: fpp ≈ (1 − e^(−k·n/m))^k; 10 bits/element with k=5 gives ~1 %.
  * A corpus beyond ~10⁹ distinct elements wants the filter sharded by key
  * range (one blob per bucket, batch routed by the same buckets) rather
  * than one driver-held blob — the aggregate composes with that layout
  * unchanged (group by bucket instead of a global agg).
  *
  * Bit layout of the blob: `[numHashes: i32][numWords: i32][words: i64…]`,
  * big-endian. Probes read the blob in place — no deserialization per row.
  * Bit positions use Kirsch–Mitzenmacher double hashing over two xxhash64
  * draws of the input (seeds 0 and 1).
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0 && numHashes <= 16, s"numHashes must be in [1,16], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a bigint (pre-hashed) input, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val h1 = XxHash64Function.hash(x, LongType, 0L)
      val h2 = XxHash64Function.hash(x, LongType, 1L)
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.length)
    bb.putInt(numHashes).putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = c.head)

  override def prettyName: String = "bloom_agg"
}

/** `bloom_might_contain(blob, hash)` — probe the serialized filter in place.
  * False negatives are impossible by construction; a `false` is therefore a
  * proof of novelty, which is what makes the batch-side prune sound.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (binary, bigint), got ($l, $r)")
  }

  override protected def nullSafeEval(blob: Any, hash: Any): Any =
    BloomFilterAgg.mightContain(blob.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) =>
      s"graft.functions.BloomFilterAgg.mightContain($f, $h)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFilterAgg {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}

  /** Static probe shared by interpreted eval and generated code: reads the
    * `[k][words][bits…]` blob directly — no per-row deserialization.
    */
  def mightContain(blob: Array[Byte], x: Long): Boolean = {
    val k = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    val numBits = (blob.length - 8).toLong * 8
    val h1 = XxHash64Function.hash(x, LongType, 0L)
    val h2 = XxHash64Function.hash(x, LongType, 1L)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits)
      val byteIdx = 8 + (bit >>> 6).toInt * 8 + 7 - ((bit & 63) >>> 3).toInt
      if (((blob(byteIdx) >> (bit & 7L).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }

  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column =
    toColumn(BloomFilterAgg(toExpression(c), numBits, numHashes).toAggregateExpression())

  def bloom_might_contain(blob: Column, hash: Column): Column =
    toColumn(BloomMightContain(toExpression(blob), toExpression(hash)))
}
