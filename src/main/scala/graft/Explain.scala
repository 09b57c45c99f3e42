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
    for (n <- names) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(s, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    s.stop()
  }
}
