package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import MinHashSig.{estJaccard, minhash_sig}

/** The one-pass MinHash signature aggregate: determinism across partial
  * merges, agreement with the direct per-slot computation, and the Jaccard
  * estimator property.
  */
class MinHashSigSpec extends SparkSuite {

  test("signature is deterministic and partition-layout independent") {
    import spark.implicits._
    val toks = (1 to 500).map(i => ("g", s"tok${i % 97}"))
    val one = toks.toDF("g", "t").repartition(1)
      .groupBy("g").agg(minhash_sig(col("t"), 16).as("sig")).collect().head.getSeq[Long](1)
    val many = toks.toDF("g", "t").repartition(7)
      .groupBy("g").agg(minhash_sig(col("t"), 16).as("sig")).collect().head.getSeq[Long](1)
    assert(one == many) // partial/final merges commute
    assert(one.length == 16)
  }

  test("slots equal the direct min over per-seed hashes") {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val tokens = Seq("alpha", "beta", "gamma", "delta")
    val sig = tokens.map(("g", _)).toDF("g", "t")
      .groupBy("g").agg(minhash_sig(col("t"), 8).as("sig"))
      .collect().head.getSeq[Long](1)
    (0 until 8).foreach { i =>
      val expect = tokens
        .map(t => XxHash64Function.hash(UTF8String.fromString(t), StringType, i.toLong)).min
      assert(sig(i) == expect, s"slot $i")
    }
  }

  test("estimator property: matching-slot fraction approximates true Jaccard") {
    import spark.implicits._
    // two sets with known Jaccard 50/150 ≈ 0.333
    val a = (1 to 100).map(i => ("a", s"t$i"))
    val b = (51 to 150).map(i => ("b", s"t$i"))
    val sigs = (a ++ b).toDF("g", "t")
      .groupBy("g").agg(minhash_sig(col("t"), 256).as("sig"))
    val est = sigs.groupBy().pivot("g").agg(first("sig"))
      .select(estJaccard(col("a"), col("b")).as("j"))
      .collect().head.getDouble(0)
    val trueJ = 50.0 / 150.0
    assert(math.abs(est - trueJ) < 0.1, s"est=$est true=$trueJ")
  }
}
