object CountQ { def main(a: Array[String]): Unit = { println(graft.SparkEntry.queries.size); println(graft.SparkEntry.oracleSql.size) } }
