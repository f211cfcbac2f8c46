package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType

/** Test-only probe for the bounded top-k aggregate's STATE bound: drives
  * `CollectTopK.update` row by row and reports the LARGEST buffer size ever
  * observed — the number the O(k)-state claims in `knnTop3`, the PQ
  * shortlist and `pipeline_quota_sample` rest on. Lives in the aggregate
  * package (test tree) purely for access, like GraftTopKBridge.
  */
object TopKBufferProbe {
  /** Max buffer size while folding `values` (as longs) into a k-bounded
    * collector; also returns the final sorted output for a semantics pin.
    */
  def maxBufferSize(values: Seq[Long], k: Int, reverse: Boolean): (Int, Seq[Long]) = {
    val agg = CollectTopK(BoundReference(0, LongType, nullable = false), k, reverse)
    val buf = agg.createAggregationBuffer()
    var maxSize = 0
    values.foreach { v =>
      agg.update(buf, InternalRow(v))
      maxSize = math.max(maxSize, buf.size)
    }
    val out = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    (maxSize, out)
  }
}
