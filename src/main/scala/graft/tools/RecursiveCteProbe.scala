package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe-scale evidence for the r15 recursive-CTE surface: the binary-heap
  * ancestor walk at 10 M keys (vs 15 k in the fixture — 667×). Depth grows
  * only logarithmically (24 rounds at 10 M), every round is a narrow
  * Project+Filter over the previous frontier, and the result has a closed
  * form to check exactly:
  *   total nodes  = Σ_c (floor(log2 c) + 1)
  *   grand path sum = Σ_c Σ_i (c >> i)
  * Both recomputed driver-side in O(n) longs. Loadavg bracketing as in
  * ScaleCurve (shared box). */
object RecursiveCteProbe {
  def main(args: Array[String]): Unit = {
    def load(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(",")
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    println(s"keys=$n loadavg_start=[${load()}]")
    val s = SparkSession.builder().master("local[32]")
      .appName("recursive-cte-probe")
      .config("spark.sql.shuffle.partitions", "32")
      // default guardrail is 1M rows across the whole recursion — a
      // governance knob, not a capability bound; 10M keys expand to
      // ~2.3e8 rows, so raise it (at 100 TB the operator needs the same
      // sizing decision any iterative job's round budget needs)
      .config("spark.sql.cteRecursionRowLimit", "400000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(1, n + 1).toDF("k").createOrReplaceTempView("rc_keys")
    val t0 = System.nanoTime()
    val r = s.sql("""
      WITH RECURSIVE anc(k, node) AS (
        SELECT k, k FROM rc_keys
        UNION ALL
        SELECT k, node DIV 2 FROM anc WHERE node > 1)
      SELECT count(*) AS n_nodes, sum(node) AS path_sum FROM anc""").head()
    val wall = (System.nanoTime() - t0) / 1e9
    // closed-form recompute in O(n) driver longs
    var nodes = 0L; var sum = 0L
    var c = 1L
    while (c <= n) {
      var node = c
      while (node >= 1) { nodes += 1; sum += node; if (node == 1) node = 0 else node /= 2 }
      c += 1
    }
    val okN = r.getLong(0) == nodes
    val okS = r.getLong(1) == sum
    println(f"wall=$wall%6.1f s rows_expanded=${r.getLong(0)}%d nodes_ok=$okN path_sum_ok=$okS")
    println(s"loadavg_end=[${load()}]")
    assert(okN && okS, s"closed form mismatch: ${r.getLong(0)} vs $nodes, ${r.getLong(1)} vs $sum")
    s.stop()
  }
}
