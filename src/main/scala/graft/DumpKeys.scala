package graft

/** Prints every registry key, one per line — feeds scripts/slope_full.sh
  * (the full-registry decade-3 slope batcher needs the key list without
  * booting a SparkSession).
  */
object DumpKeys {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
