package graft.tools

/** Print one oracle SQL by name (debug aid for generated oracles). */
object DumpOracle {
  def main(args: Array[String]): Unit =
    for (n <- args) { println(s"-- ORACLE $n"); println(graft.SparkEntry.oracleSql(n)); println("-- END") }
}
