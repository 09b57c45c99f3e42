package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the round-15 SQL-surface ids (VARIANT / recursive CTE /
  * pipe syntax / parse_url): verified all supported in this Spark 4.1.2
  * build, then used to pin exact output values (schema_of_variant literal)
  * before writing the DuckDB oracles. */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]").appName("feature-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    println("== fn_variant ==")
    graft.ops.Functions.queries("fn_variant")(s, d).show(5, false)
    println("== text_url_normalize ==")
    graft.ops.Functions.queries("text_url_normalize")(s, d).show(3, false)
    s.stop()
  }
}
