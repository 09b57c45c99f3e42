package graft.tools

/** Prints every registered query id, one per line (local shard/profiling
  * helper — lets shell tooling split the registry without parsing Scala). */
object ListQ {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
