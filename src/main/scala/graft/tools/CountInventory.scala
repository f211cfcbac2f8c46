package graft.tools

/** Dev utility: print the declared inventory sizes (used to keep the
  * machine-checked Inventory lines in COVERAGE.md / README.md honest).
  */
object CountInventory {
  def main(args: Array[String]): Unit = {
    println(s"QCOUNT=${graft.SparkEntry.queries.size} OCOUNT=${graft.SparkEntry.oracleSql.size}")
  }
}
