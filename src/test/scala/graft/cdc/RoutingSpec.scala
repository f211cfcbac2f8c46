package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RoutingSpec extends SparkSuite {

  val yaml =
    """# comment
      |db1:
      |  - table1
      |  - table2
      |db2:
      |  - table3
      |  - table1
      |""".stripMargin

  test("YAML subset parses group → tables") {
    assert(Routing.parseTableGroups(yaml) ==
      Map("db1" -> Seq("table1", "table2"), "db2" -> Seq("table3", "table1")))
  }

  test("inversion keeps first group in declared order (fixes the reference's nondeterminism)") {
    val groups = Routing.parseTableGroups(yaml)
    val inv = Routing.invert(groups, Seq("db1", "db2"))
    assert(inv == Map("table1" -> "db1", "table2" -> "db1", "table3" -> "db2"))
  }

  test("groupExpr routes and drops unmapped (main.go:51-55 semantics)") {
    import spark.implicits._
    val inv = Map("t1" -> "g1", "t2" -> "g2")
    val out = Seq("t1", "t2", "unknown").toDF("table")
      .select(col("table"), Routing.groupExpr(col("table"), inv).as("g"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map("t1" -> Some("g1"), "t2" -> Some("g2"), "unknown" -> None))
  }

  test("routeJoin broadcast variant agrees with groupExpr and drops unmapped") {
    import spark.implicits._
    val inv = Map("t1" -> "g1", "t2" -> "g2")
    val df = Seq("t1", "t2", "unknown", "t1").toDF("table")
    val joined = Routing.routeJoin(df, "table", inv)
    assert(joined.count() == 3)
    assert(joined.filter(col("group") === "g1").count() == 2)
  }
}
