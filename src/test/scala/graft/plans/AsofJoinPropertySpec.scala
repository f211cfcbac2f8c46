package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Randomized equivalence: the native merge must agree with an independent
  * window-based formulation on adversarial data — small key/time domains so
  * duplicate left rows, same-(k,t) left/right collisions, keys with no
  * right rows, and multi-row time ties all occur.
  *
  * The right side's (k, t, rid) tuples are unique (rid is a sequence
  * number appended to `on`), per the operator's tie contract; left rows
  * duplicate freely.
  */
class AsofJoinPropertySpec extends SparkSuite {

  import spark.implicits._

  // Deterministic pseudo-random fixture (fixed seed — bench/CI stable).
  private val rng = new scala.util.Random(20260812L)
  private val nKeys = 12

  private def leftRows: Seq[(String, Long, Int)] =
    (0 until 400).map(i =>
      (s"k${rng.nextInt(nKeys)}", rng.nextInt(40).toLong, i))

  // (k, t) unique on the right — the operator leaves same-(by, on) right
  // ties unspecified, so a deterministic cross-check needs them gone; the
  // left still duplicates and collides with right times freely.
  private def rightRows: Seq[(String, Long, Long, Double)] =
    (0 until 300).map(i =>
      (s"k${rng.nextInt(nKeys + 3)}", rng.nextInt(40).toLong, i.toLong,
        rng.nextInt(1000) / 10.0))
      .distinctBy(r => (r._1, r._2))

  /** Reference implementation: union both sides, window over (k) ordered
    * by (t, side, rid) — side places right rows before (inclusive) or
    * after (exclusive) left rows at an equal t — and take the last right
    * value strictly before each left row in that order.
    */
  private def emulated(
      left: DataFrame, right: DataFrame, exclusive: Boolean): Map[Int, Option[Double]] = {
    val rightSide = if (exclusive) 1 else 0
    val leftSide = if (exclusive) 0 else 1
    val unioned =
      left.select(col("k"), col("t"), lit(leftSide).as("side"),
        lit(Long.MaxValue).as("rid"), col("lid"), lit(null).cast("double").as("v"))
        .unionAll(right.select(col("rk").as("k"), col("rt").as("t"),
          lit(rightSide).as("side"), col("rid"), lit(-1).as("lid"), col("v")))
    val w = Window.partitionBy("k").orderBy("t", "side", "rid")
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn("asof_v", last(when(col("lid") === -1, col("v")), ignoreNulls = true).over(w))
      .filter(col("lid") =!= -1)
      .select(col("lid"), col("asof_v"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
  }

  private def native(
      left: DataFrame, right: DataFrame, exclusive: Boolean): Map[Int, Option[Double]] =
    Asof.join(left, right,
      by = Seq("k"), on = Seq("t"), exclusive = exclusive,
      rightBy = Seq("rk"), rightOn = Seq("rt"))
      .select(col("lid"), col("v"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("native merge equals the window emulation on adversarial random data") {
    (1 to 3).foreach { round =>
      val left = leftRows.toDF("k", "t", "lid")
      val right = rightRows.toDF("rk", "rt", "rid", "v")
      Seq(true, false).foreach { exclusive =>
        val n = native(left, right, exclusive)
        val e = emulated(left, right, exclusive)
        val diff = (n.keySet ++ e.keySet).filter(k => n.get(k) != e.get(k))
        assert(diff.isEmpty,
          s"round $round exclusive=$exclusive mismatches: " +
            diff.take(5).map(k => s"lid=$k native=${n.get(k)} emu=${e.get(k)}").mkString("; "))
      }
    }
  }
}
