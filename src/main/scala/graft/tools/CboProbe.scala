package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-15 cost-based-optimization demonstration (r14 verdict item 3):
  * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` on catalog-managed
  * copies of the TPC-H tables + `spark.sql.cbo.enabled` /
  * `spark.sql.cbo.joinReorder.enabled`, driving Catalyst's
  * CostBasedJoinReorder on a q9-class 5-way star join written in a
  * DELIBERATELY bad syntactic order (orders ⋈ lineitem first, the filtered
  * part table last). With stats, the optimizer must re-anchor the join
  * order around the selective dimension; without CBO the syntactic order
  * survives. Results must be identical either way — the reorder is a cost
  * move, not a semantic one.
  *
  * At 100 TB this is a first-class lever: AQE re-plans at shuffle
  * boundaries from RUNTIME sizes, but only CBO (catalog stats) can pick the
  * join ORDER before the first shuffle is laid down — a mis-ordered 6-way
  * star join materializes a fact×fact intermediate no runtime re-plan can
  * undo. CboSpec pins the reorder + result equality; the probe prints both
  * optimized plans for PLANS.md.
  */
object CboProbe {
  /** q9-class shape: revenue by nation over a selective part slice —
    * shared with the registry id `join_cbo_star` (ops/Scale.scala). */
  val Query: String = graft.ops.Scale.cboStarQuery

  /** Stage + analyze catalog tables (idempotent per content stamp). */
  def stage(s: SparkSession, sfDir: String): Unit =
    graft.ops.Scale.cboStageTables(s, sfDir)

  /** Join order as the left-to-right sequence of cbo_* leaves in the
    * optimized plan (tree order = join order for a left-deep tree). */
  def joinOrder(df: DataFrame): Seq[String] =
    "cbo_[a-z]+".r.findAllIn(df.queryExecution.optimizedPlan.toString).toSeq
      .distinct

  /** Runs the scenario under cbo=off then cbo=on. Returns (orderOff,
    * orderOn, rowsEqual, plansDiffer). */
  def runScenario(s: SparkSession, sfDir: String): (Seq[String], Seq[String],
      Boolean, Boolean) = {
    stage(s, sfDir)
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      def run(on: Boolean): (Seq[String], Set[Seq[Any]], String) = {
        keys.foreach(k => s.conf.set(k, on.toString))
        val df = s.sql(Query)
        (joinOrder(df), df.collect().map(_.toSeq).toSet,
          df.queryExecution.optimizedPlan.treeString)
      }
      val (offOrder, offRows, offPlan) = run(false)
      val (onOrder, onRows, onPlan) = run(true)
      if (sys.env.contains("SPARK_GRAFT_CBO_PRINT")) {
        println("===== optimized plan, cbo OFF =====\n" + offPlan)
        println("===== optimized plan, cbo ON (stats + joinReorder) =====\n"
          + onPlan)
      }
      (offOrder, onOrder, offRows == onRows && offRows.nonEmpty,
        offOrder != onOrder)
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]").appName("cbo-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val (off, on, same, differ) = runScenario(s, sf)
    println(s"join order cbo OFF: ${off.mkString(" -> ")}")
    println(s"join order cbo ON : ${on.mkString(" -> ")}")
    println(s"results identical: $same; order changed: $differ")
    s.stop()
  }
}
