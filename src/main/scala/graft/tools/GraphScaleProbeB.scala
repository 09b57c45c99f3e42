package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 graph scale probe, part B (r13 verdict item 4, closing the
  * remaining reasoned-only families): execute modularity and bounded-hop
  * BFS at 2M nodes with CLOSED-FORM correctness checks, mirroring
  * GraphScaleProbe's kcore/LPA runs and the r10c pagerank probe.
  *
  *  - modularity on the 500k-disjoint-4-clique graph (2M nodes, 3M edges)
  *    under the TRUE partition (lbl = 4·(node div 4)): every edge is
  *    intra ⇒ intra_edges = 3,000,000 exactly, n_communities = 500,000,
  *    Σd_c² = 500,000·12² = 72e6, so Q = 1 − 72e6/(4m²·…) = 1 − 2e−6
  *    (r4 ⇒ 1.0). A second run under the deliberately-halved pair
  *    partition (lbl = 2·(node div 2)) must read intra = 1,000,000,
  *    n_communities = 1,000,000, Q = 1/3 − 1e−6 (r4 ⇒ 0.3333) — the
  *    probe checks modularity moves, not just that the pipe runs.
  *  - bfsCore (hops = 8) on the 4-regular ring±1/skip±997 graph from
  *    source 0: a node at lattice offset x·1 + y·997 has graph distance
  *    |x|+|y| (offsets are unique: |Δx| ≤ 16 < 997 forces Δy = 0, and
  *    8·997 + 8 ≪ 2M so nothing wraps), so the frontier must hold
  *    EXACTLY 4k nodes at each distance k ∈ [1,8] and 145 nodes total.
  */
object GraphScaleProbeB {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("graph-probe-b")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = 2000000L; val skip = 997L

    // --- modularity on 500k disjoint 4-cliques: 2M nodes, 3M edges
    val base = s.range(n / 4).select((col("id") * 4).as("c"))
    val cliq = base.select(col("c").as("a"), (col("c") + 1).as("b"))
      .unionAll(base.select(col("c").as("a"), (col("c") + 2).as("b")))
      .unionAll(base.select(col("c").as("a"), (col("c") + 3).as("b")))
      .unionAll(base.select((col("c") + 1).as("a"), (col("c") + 2).as("b")))
      .unionAll(base.select((col("c") + 1).as("a"), (col("c") + 3).as("b")))
      .unionAll(base.select((col("c") + 2).as("a"), (col("c") + 3).as("b")))
      .localCheckpoint(true)
    val nodes = cliq.select(col("a").as("node"))
      .unionAll(cliq.select(col("b").as("node"))).distinct()
    def run(grain: Long, qExp: Double, intraExp: Long, ncExp: Long,
        tag: String): Unit = {
      val lbl = nodes.select(col("node"),
        (col("node") - pmod(col("node"), lit(grain))).as("lbl"))
      val t0 = System.nanoTime()
      val row = graft.ops.Graph.modularityCore(cliq, lbl).head()
      val w = (System.nanoTime() - t0) / 1e9
      val ok = row.getLong(0) == ncExp && row.getLong(1) == 3000000L &&
        row.getLong(2) == intraExp &&
        math.abs(row.getDouble(3) - qExp) < 1e-9
      println(f"modularity $tag @2M/3M: nc=${row.getLong(0)} " +
        f"m=${row.getLong(1)} intra=${row.getLong(2)} Q=${row.getDouble(3)} " +
        f"wall=$w%.1f s CLOSED_FORM_OK=$ok")
    }
    run(4L, 1.0, 3000000L, 500000L, "true-partition")
    run(2L, 0.3333, 1000000L, 1000000L, "halved-partition")

    // --- bounded-hop BFS on ring±1 / skip±997: 2M nodes, 8M directed edges
    val ring = s.range(n).select(col("id").as("a"), ((col("id") + 1) % n).as("b"))
      .unionAll(s.range(n).select(col("id").as("a"),
        ((col("id") + skip) % n).as("b")))
    val dir = ring.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(ring.select(col("b").as("src"), col("a").as("dst")))
    val src = s.range(1).select(col("id").as("node"))
    val t0 = System.nanoTime()
    val dist = graft.ops.Graph.bfsCore(dir, src, hops = 8)
    val perD = dist.groupBy(col("d")).agg(count(lit(1)).as("cnt"))
      .orderBy("d").collect()
    val w = (System.nanoTime() - t0) / 1e9
    val okD = perD.forall { r =>
      val d = r.getInt(0); val c = r.getLong(1)
      if (d == 0) c == 1L else c == 4L * d
    }
    val tot = perD.map(_.getLong(1)).sum
    println(f"bfs hops=8 @2M/8M: reached=$tot " +
      s"per_d=${perD.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(",")} " +
      f"wall=$w%.1f s LATTICE_DIST_OK=${okD && tot == 145L}")
    s.stop()
  }
}
