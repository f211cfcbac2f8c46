package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The Bloom membership sketch: no false negatives ever (the property the
  * incremental-dedup prune is sound on), a false-positive rate near the
  * analytic estimate, distributed partial/final merge, and the codegen'd
  * probe path over a DataFrame.
  */
class BloomFilterSpec extends SparkSuite {

  import BloomFilterAgg.{bloom_agg, bloom_might_contain}

  private val NumBits = 1 << 17 // 128 Kbit for ~10k elems ≈ 13 bits/elem
  private val K = 5

  test("no false negatives, fpp near the analytic bound, merge across partitions") {
    import spark.implicits._
    val n = 10000
    val members = (0 until n).map(i => i.toLong * 2654435761L + 17)
    // 8 partitions force real partial buffers + merges
    val blob = members.toDF("x").repartition(8)
      .agg(bloom_agg(col("x"), NumBits, K)).head.getAs[Array[Byte]](0)
    assert(blob.length == 8 + NumBits / 8)
    // every inserted element probes true — unconditionally
    assert(members.forall(BloomFilterAgg.mightContain(blob, _)))
    // fpp on 20k non-members ≈ (1 - e^(-k n / m))^k ≈ 0.9% here; allow 3×
    val nonMembers = (0 until 20000).map(i => -1L - i * 40503L)
    val fp = nonMembers.count(BloomFilterAgg.mightContain(blob, _))
    val expected = math.pow(1 - math.exp(-K.toDouble * n / NumBits), K)
    assert(fp.toDouble / nonMembers.size < expected * 3 + 0.003,
      s"fpp ${fp.toDouble / nonMembers.size} vs analytic $expected")
  }

  test("codegen probe path and SQL registration") {
    import spark.implicits._
    val blob = Seq(1L, 2L, 3L).toDF("x")
      .agg(bloom_agg(xxhash64(col("x")), 1 << 10, 5)).head.getAs[Array[Byte]](0)
    val got = Seq(1L, 2L, 3L, 4L, 5L).toDF("x")
      .select(col("x"), bloom_might_contain(lit(blob), xxhash64(col("x"))).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && got(2L) && got(3L), "false negative")
    // null input → null out (not a crash, not false)
    val nulls = Seq[java.lang.Long](6L, null).toDF("x")
      .select(bloom_might_contain(lit(blob), when(col("x").isNotNull, xxhash64(col("x")))).as("hit"))
      .collect()
    assert(nulls.exists(_.isNullAt(0)))
    // SQL surface
    GraftExtensions.register(spark)
    Seq(10L, 20L).toDF("v").createOrReplaceTempView("bloom_in")
    val sqlBlob = spark.sql(
      "SELECT bloom_agg(xxhash64(v), 1024, 3) AS b FROM bloom_in")
      .head.getAs[Array[Byte]](0)
    assert(sqlBlob.length == 8 + 1024 / 8)
    val viaSql = spark.sql(
      "SELECT bloom_might_contain(bloom_agg(xxhash64(v), 1024, 3), xxhash64(20L)) FROM bloom_in")
      .head.getBoolean(0)
    assert(viaSql)
  }
}
