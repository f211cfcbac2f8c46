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
}
