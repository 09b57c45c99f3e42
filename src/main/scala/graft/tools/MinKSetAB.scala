package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 (VERDICT r17 item 6) — settle the graph_label_propagation
  * regression attribution with a SAME-JVM paired A/B of the cooc-cell
  * aggregate on the LPA path specifically: the r17 MinKSet
  * TypedImperativeAggregate (`graft_min_k_set(u, 64)`) vs the r16
  * `slice(sort_array(collect_set(u)), 1, 64)` form it replaced. Both arms
  * run the FULL consumer (`lpaCore(coocEdges-shape, rounds=3)`), arms
  * alternate within each rep pair so regime drift hits both equally, a
  * constant sentinel exposes the machine regime, and the two arms' final
  * label frames are asserted identical (they truncate to the same
  * k-smallest distinct set by construction).
  *
  * Usage: MinKSetAB [sfDir] [reps]
  */
object MinKSetAB {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("minkset-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7
    val cap = graft.ops.Graph.CoocCellCap
    graft.ext.CatalystExt.register(s)

    def loadavg(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString("[", ",", "]")

    // the builder base, replicated from Graph.coocEdgesCore
    def base() = graft.util.Canon.tbl(s, sf, "events")
      .where(col("user_id").isNotNull)
      .select(col("user_id").as("u"), col("event_type"),
        date_trunc("minute", col("ts")).as("w"))

    def edgesFrom(agg: org.apache.spark.sql.Column) = base()
      .groupBy(col("event_type"), col("w")).agg(agg.as("us"))
      .where(size(col("us")) >= 2)
      .select(explode(col("us")).as("u"), col("us"))
      .select(col("u").as("a"),
        explode(expr("filter(us, x -> x > u)")).as("b"))
      .distinct()

    val minkAgg = expr(s"graft_min_k_set(u, $cap)")
    val csetAgg = expr(s"slice(sort_array(collect_set(u)), 1, $cap)")

    def lpaWall(agg: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      graft.ops.Graph.lpaCore(edgesFrom(agg), rounds = 3).count()
      (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      s.read.parquet(s"$sf/lineitem.parquet")
        .selectExpr("sum(l_orderkey % 97)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // result-identity gate: same labels from both arms
    val la = graft.ops.Graph.lpaCore(edgesFrom(minkAgg), rounds = 3)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val lb = graft.ops.Graph.lpaCore(edgesFrom(csetAgg), rounds = 3)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    println(s"arms_identical=${la == lb} rows=${la.size}")

    println(s"load_start=${loadavg()}")
    val mink = collection.mutable.ArrayBuffer[Double]()
    val cset = collection.mutable.ArrayBuffer[Double]()
    val sent = collection.mutable.ArrayBuffer[Double]()
    for (r <- 1 to reps) {
      sent += sentinel()
      if (r % 2 == 1) { mink += lpaWall(minkAgg); cset += lpaWall(csetAgg) }
      else { cset += lpaWall(csetAgg); mink += lpaWall(minkAgg) }
      println(f"rep $r: sentinel=${sent.last}%.3f minkset=${mink.last}%.3f collectset=${cset.last}%.3f")
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(s"load_end=${loadavg()}")
    println(f"MEDIANS sentinel=${med(sent.toSeq)}%.3f minkset=${med(mink.toSeq)}%.3f collectset=${med(cset.toSeq)}%.3f ratio_mink_over_cset=${med(mink.toSeq) / med(cset.toSeq)}%.3f reps=$reps")
    s.stop()
  }
}
