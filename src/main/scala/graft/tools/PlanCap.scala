package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-capture helper for PLANS.md: prints the executed plan of one
  * registered query id (FormattedMode-equivalent toString), optionally
  * filtered to lines matching a substring.
  *
  * Usage: runMain graft.tools.PlanCap <id> [sfDir] [filterSubstring]
  */
object PlanCap {
  def main(args: Array[String]): Unit = {
    val id = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val filt = if (args.length > 2) Some(args(2)) else None
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(id)(s, sf)
    df.collect() // AQE finalizes the plan only after execution
    val plan = df.queryExecution.executedPlan.toString
    println(s"=== PLAN $id ===")
    filt match {
      case Some(f) => println(plan.linesIterator.filter(_.contains(f)).mkString("\n"))
      case None => println(plan)
    }
    s.stop()
  }
}
