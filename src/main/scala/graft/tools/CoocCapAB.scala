package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 verdict item 4 — close the graph-family drift attribution with
  * a SAME-JVM paired A/B of the r15 co-occurrence cell cap: run the heavy
  * cooc consumer (`kcoreCore(coocEdges(...))`, the id that read
  * 1.39 s → 2.14 s across the builder-change round) with the production cap
  * (CoocCellCap = 64) and uncapped (Int.MaxValue ⇒ the rank/filter stage is
  * planned but never truncates AND, in the uncapped arm, is REMOVED
  * entirely — the true r14 builder) over the sf0.1 bench path, n reps of
  * each, ARMS ALTERNATING within each rep pair so regime drift hits both
  * equally, a constant sentinel query timed before every rep to expose the
  * machine regime, and loadavg brackets.
  *
  * Expected per CoocSkewProbe (isolated, fixture-scale): cap ≈ free below
  * the cap (the window sorts on the same (event_type, w) shuffle key — no
  * extra exchange). If the paired medians confirm, the r15 drift is regime
  * noise and BASELINE.md gets the note; if the capped arm is genuinely
  * slower, gate the rank stage on a max-cell-count pre-check.
  */
object CoocCapAB {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("cooc-cap-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7

    def loadavg(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString("[", ",", "]")

    // the bench-path consumer: k-core peel over the cooc edge set
    def kcoreWall(cap: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.Graph.kcoreCore(graft.ops.Graph.coocEdges(s, sf, cap)).count()
      (System.nanoTime() - t0) / 1e9
    }
    // constant regime sentinel: a fixed scan+agg untouched by the cap
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      s.read.parquet(s"$sf/lineitem.parquet")
        .selectExpr("sum(l_orderkey % 97)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup both arms once (JIT/codegen parity)
    kcoreWall(graft.ops.Graph.CoocCellCap); kcoreWall(Int.MaxValue)

    println(s"load_start=${loadavg()}")
    val capped = collection.mutable.ArrayBuffer[Double]()
    val uncapped = collection.mutable.ArrayBuffer[Double]()
    val sentinels = collection.mutable.ArrayBuffer[Double]()
    for (r <- 1 to reps) {
      sentinels += sentinel()
      // alternate arm order each rep: odd reps capped-first
      if (r % 2 == 1) {
        capped += kcoreWall(graft.ops.Graph.CoocCellCap)
        uncapped += kcoreWall(Int.MaxValue)
      } else {
        uncapped += kcoreWall(Int.MaxValue)
        capped += kcoreWall(graft.ops.Graph.CoocCellCap)
      }
      println(f"rep $r: sentinel=${sentinels.last}%.3f capped=${capped.last}%.3f uncapped=${uncapped.last}%.3f")
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(s"load_end=${loadavg()}")
    println(f"MEDIANS sentinel=${med(sentinels.toSeq)}%.3f capped=${med(capped.toSeq)}%.3f uncapped=${med(uncapped.toSeq)}%.3f ratio=${med(capped.toSeq) / med(uncapped.toSeq)}%.3f reps=$reps")
    s.stop()
  }
}
