package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Scratch probe: dump FileSourceScanExec metrics (incl. the pruned
  * partition count) from the FINAL adaptive plan, descending through
  * QueryStageExec wrappers that hide stage subtrees from plain foreach. */
object MetricsProbe {
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case qs: QueryStageExec => p +: allNodes(qs.plan)
    case other => other +: other.children.flatMap(allNodes)
  }
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("scan_parquet_partitioned", "join_dpp_date")) {
      println(s"===== $name")
      val q = graft.SparkEntry.queries(name)(s, "/root/testdata/sf0.01")
      q.collect()
      allNodes(q.queryExecution.executedPlan).foreach {
        case f: FileSourceScanExec =>
          println("SCAN loc=" + f.relation.location.rootPaths.mkString(","))
          f.metrics.foreach { case (k, m) => println(s"  $k = ${m.value}") }
        case _ =>
      }
    }
    s.stop()
  }
}
