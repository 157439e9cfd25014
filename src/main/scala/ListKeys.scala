object ListKeys extends App {
  val ks = graft.SparkEntry.queries.keys.toSeq.sorted
  println(ks.size)
  println(ks.mkString(" "))
  val os = graft.SparkEntry.oracleSql.keySet
  println("no_oracle: " + ks.filterNot(os).mkString(" "))
}
