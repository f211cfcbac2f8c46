package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimHashSpec extends SparkSuite {

  private def fp(tokens: Seq[String]): Long = {
    import spark.implicits._
    Seq(tokens).toDF("t").select(SimHash64.simhash64(col("t")).as("f"))
      .collect().head.getLong(0)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical token sets → identical fingerprints") {
    val t = Seq("the", "quick", "brown", "fox", "jumps")
    assert(fp(t) == fp(t))
  }

  test("near-duplicates land within small Hamming distance; unrelated far") {
    val base = (1 to 40).map(i => s"tok$i")
    val nearDup = base.updated(3, "CHANGED") // 1 of 40 tokens differs
    val unrelated = (1 to 40).map(i => s"other$i")
    val (a, b, c) = (fp(base), fp(nearDup), fp(unrelated))
    assert(hamming(a, b) <= 12, s"near-dup hamming ${hamming(a, b)}")
    assert(hamming(a, c) > 12, s"unrelated hamming ${hamming(a, c)}")
  }

  test("hamming64 column expr matches bitCount") {
    import spark.implicits._
    val got = Seq((0xff00L, 0x0ff0L)).toDF("a", "b")
      .select(SimHash64.hamming64(col("a"), col("b")).as("h"))
      .collect().head.getInt(0)
    assert(got == java.lang.Long.bitCount(0xff00L ^ 0x0ff0L))
  }
}
