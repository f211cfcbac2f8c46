package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi —
  * "Efficient Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005) as a one-pass aggregate: `space_saving_topk(item, k)` keeps at
  * most k counters and returns `array<struct<item, cnt, err>>` sorted by
  * (cnt desc, item asc).
  *
  * Guarantees (the properties the spec pins):
  *   - `cnt` OVERESTIMATES the true count by at most `err`
  *     (true ∈ [cnt − err, cnt]);
  *   - every item with true count > N/k is present in the summary;
  *   - when the number of distinct items never exceeds k — in any partial
  *     OR merged buffer — the sketch is EXACT (`err = 0` everywhere), which
  *     makes the k ≥ |vocab| configuration oracle-comparable against plain
  *     `GROUP BY` counts.
  *
  * Merge (the distributed step) is the standard summary merge: sum counts
  * of shared items, offset absent items by the other side's minimum
  * counter, truncate back to k — per-group state is O(k) regardless of
  * input size, so a 100 TB heavy-hitters pass is one map-side-combining
  * aggregation with k-sized buffers where the exact `GROUP BY item` would
  * shuffle the full item universe.
  *
  * Eviction and merge tie-breaks are deterministic (min count, then
  * lexicographically LARGEST item evicts first), so identical partial
  * streams produce identical summaries; across different partitionings the
  * EXACT regime is order-independent, while approximate summaries may
  * differ within the error bound (inherent to the sketch — the spec
  * asserts the bounds, not replay equality, in that regime).
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(k > 0, s"space_saving_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"space_saving_topk requires string, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) SpaceSaving.insert(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] =
    SpaceSaving.merge(a, b, k)

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val rows = SpaceSaving.sorted(buf).map { case (item, cnt, err) =>
      InternalRow(UTF8String.fromString(item), cnt, err)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, (cnt, err)) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(cnt)
      out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        (in.readLong(), in.readLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = c.head)
  override def prettyName: String = "space_saving_topk"
}

object SpaceSavingTopK {
  /** Column-level API. */
  def space_saving_topk(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.toColumn(
      SpaceSavingTopK(org.apache.spark.sql.GraftColumnBridge.toExpression(c), k)
        .toAggregateExpression())
}

/** The SpaceSaving kernel, shared between the batch aggregate above and the
  * streaming keyed state (`graft.streaming.StreamingTopK`): one summary
  * shape, one eviction rule, one merge — so the stream's continuously
  * maintained summary IS the batch sketch folded over micro-batches.
  */
object SpaceSaving {
  type Buf = mutable.HashMap[String, (Long, Long)]

  /** The deterministic victim: minimum count, ties to the LARGEST item, so
    * on a count tie the lexicographically smaller (reported-first) item
    * survives.
    */
  def victim(buf: Buf): (String, Long) = {
    var vi: String = null
    var vc = Long.MaxValue
    buf.foreach { case (item, (cnt, _)) =>
      if (cnt < vc || (cnt == vc && item > vi)) { vi = item; vc = cnt }
    }
    (vi, vc)
  }

  /** One SpaceSaving step: count a hit, open a counter while capacity
    * remains, otherwise evict the victim and inherit its count as error.
    */
  def insert(buf: Buf, item: String, k: Int): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf.update(item, (c + 1, e))
      case None if buf.size < k => buf.update(item, (1L, 0L))
      case None =>
        val (vi, vc) = victim(buf)
        buf.remove(vi)
        buf.update(item, (vc + 1, vc)) // inherit the evicted count as error
    }

  /** Summary merge (the distributed step), mutating and returning `a`.
    * An item absent from one summary has true count <= that summary's min
    * counter; offsetting by it (count AND error) keeps the invariant
    * true ∈ [cnt - err, cnt] after the merge.
    */
  def merge(a: Buf, b: Buf, k: Int): Buf = {
    if (b.isEmpty) return a
    if (a.isEmpty) { a ++= b; return a }
    val minA = if (a.size < k) 0L else a.valuesIterator.map(_._1).min
    val minB = if (b.size < k) 0L else b.valuesIterator.map(_._1).min
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (a.keySet ++ b.keySet).foreach { item =>
      val (ca, ea) = a.getOrElse(item, (minA, minA))
      val (cb, eb) = b.getOrElse(item, (minB, minB))
      merged.update(item, (ca + cb, ea + eb))
    }
    a.clear()
    if (merged.size <= k) a ++= merged
    else a ++= merged.toSeq.sortBy { case (item, (cnt, _)) => (-cnt, item) }.take(k)
    a
  }

  /** Reporting order: count desc, item asc. */
  def sorted(buf: Buf): Seq[(String, Long, Long)] =
    buf.toSeq
      .sortBy { case (item, (cnt, _)) => (-cnt, item) }
      .map { case (item, (cnt, err)) => (item, cnt, err) }
}
