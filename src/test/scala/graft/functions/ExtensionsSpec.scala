package graft.functions

import graft.SparkSuite

/** Custom expressions callable from SQL text like built-ins, registered on
  * the live session (`GraftExtensions.register`; the `spark.sql.extensions`
  * config path applies the same builders at session construction).
  */
class ExtensionsSpec extends SparkSuite {

  test("custom functions resolve through the SQL surface") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT strict_base64_decode('aGVsbG8=') AS dec,
        |       strict_base64_decode('not base64!') AS raw,
        |       simhash64(array('a', 'b', 'c')) AS fp,
        |       vector_dot(array(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)),
        |                  array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS dp""".stripMargin)
      .collect().head
    assert(row.getString(0) == "hello")
    assert(row.getString(1) == "not base64!")
    // deterministic fingerprint — same value every run/JVM
    val again = spark.sql("SELECT simhash64(array('a', 'b', 'c'))").collect().head.getLong(0)
    assert(row.getLong(2) == again)
    assert(row.getDouble(3) == 4.0)
  }

  test("minhash_sig resolves through SQL for int and long k literals") {
    GraftExtensions.register(spark)
    val sig = spark.sql(
      """SELECT minhash_sig(t, 8) AS sig
        |FROM VALUES ('a'), ('b'), ('c') AS v(t)""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8)
    // a BIGINT literal k is just as valid as an INT one
    val sigL = spark.sql(
      """SELECT minhash_sig(t, 8L) AS sig
        |FROM VALUES ('a'), ('b'), ('c') AS v(t)""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(sigL == sig)
    // and agrees with the typed-API construction
    import org.apache.spark.sql.functions.col
    val typed = spark.createDataFrame(Seq(Tuple1("a"), Tuple1("b"), Tuple1("c")))
      .toDF("t")
      .agg(MinHashSig.minhash_sig(col("t"), 8).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(typed == sig)
  }
}
