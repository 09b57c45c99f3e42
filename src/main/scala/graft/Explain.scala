package graft
import org.apache.spark.sql.SparkSession
/** Plan-inspection helper: prints formatted physical plans for headline
  * queries so scan pushdown / join strategy / agg shape can be audited. */
object Explain {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("scan_parquet_pushdown", "join_broadcast", "agg_pricing_summary",
        "topk_global", "join_inner_equi")
    // SPARK_GRAFT_EXPLAIN_EXEC=1: execute first and print the FINAL
    // adaptive plan — the only view where AQE decisions (ReusedExchange,
    // skew-join splits, runtime join demotions) are visible.
    val exec = sys.env.get("SPARK_GRAFT_EXPLAIN_EXEC").contains("1")
    for (n <- names) {
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(s, sf)
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    s.stop()
  }
}
