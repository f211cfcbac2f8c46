package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table→group routing (reference `main.go:313-332`): a YAML map
  * `group → [table...]` inverted at load into `table → group`; events whose
  * table has no group are dropped (`main.go:51-55`), and the group names the
  * delivery path (`POST_URL + "/" + group`, `main.go:105`).
  *
  * At scale this lookup is a broadcast hash join of the stream against a
  * tiny static dimension — or, cheaper still, a literal CASE expression that
  * never leaves whole-stage codegen. Both are provided.
  */
object Routing {

  /** Parse the minimal YAML subset the reference uses
    * (`config/table_groups.example.yaml`):
    * {{{
    * group1:
    *   - table1
    *   - table2
    * }}}
    * No YAML lib needed (and none is resolvable offline).
    */
  def parseTableGroups(yaml: String): Map[String, Seq[String]] = {
    val groupRe = "^([A-Za-z0-9_.-]+):\\s*$".r
    val itemRe = "^\\s+-\\s*(\\S+)\\s*$".r
    var current: Option[String] = None
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    yaml.linesIterator.foreach {
      case groupRe(g) => current = Some(g); acc.getOrElseUpdate(g, Vector.empty)
      case itemRe(t) => current.foreach(g => acc(g) = acc(g) :+ t)
      case _ => // comments / blanks
    }
    acc.toMap
  }

  /** Invert group→tables into table→group. The reference's inversion is
    * nondeterministic when a table appears under two groups (Go map
    * iteration, `main.go:325-329`); we fix that by keeping the first group
    * in YAML order (documented deviation).
    */
  def invert(groups: Map[String, Seq[String]], order: Seq[String] = Nil): Map[String, String] = {
    val ordered = if (order.nonEmpty) order else groups.keys.toSeq.sorted
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    ordered.foreach { g =>
      groups.getOrElse(g, Nil).foreach { t => if (!out.contains(t)) out(t) = g }
    }
    out.toMap
  }

  /** Group lookup as a literal expression (no join, stays in codegen).
    * Unmapped tables → null (callers filter, matching `main.go:51-55`).
    */
  def groupExpr(table: Column, tableToGroup: Map[String, String]): Column = {
    val sorted = tableToGroup.toSeq.sortBy(_._1) // deterministic plan
    sorted.foldLeft(lit(null).cast("string")) { case (acc, (t, g)) =>
      when(table === t, g).otherwise(acc)
    }
  }

  /** Group lookup via broadcast join — the shape to use when the routing
    * dimension is too large for a literal expression. Drops unmapped rows
    * (inner join = the reference's filter semantics).
    */
  def routeJoin(df: DataFrame, tableCol: String, tableToGroup: Map[String, String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = tableToGroup.toSeq.sortBy(_._1).toDF("__route_table", "group")
    df.join(broadcast(dim), df(tableCol) === col("__route_table"), "inner")
      .drop("__route_table")
  }
}
