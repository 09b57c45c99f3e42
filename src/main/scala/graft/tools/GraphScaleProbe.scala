package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 graph scale probe (r13 verdict item 4): execute kcore and LPA
  * at 2M nodes with CLOSED-FORM correctness checks, mirroring the r10c
  * pagerank probe (a09daec).
  *
  *  - kcore on the same 2M-node symmetric ring+skip graph pagerank used:
  *    the graph is 4-regular (ring ±1 plus skip ±997), so k=2 peeling
  *    removes nothing — the residual degree table must be exactly
  *    uniform deg=4 over all 2M nodes (vertex-transitive ⇒ uniform core
  *    number). k=5 must cascade to empty in round 1 (every degree < 5).
  *  - LPA (T=3) on a 500k-component union of 4-cliques (2M nodes, 3M
  *    edges): min-tie-break LPA provably converges to each clique's
  *    minimum id by round 2 (round 1: the min node adopts the second
  *    smallest, everyone else adopts the min; round 2: the min label has
  *    majority everywhere), so every node's label must equal
  *    4*(node div 4) — per-node closed form, verified distributed.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("graph-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = 2000000L; val skip = 997L

    // --- kcore on ring+skip: 2M nodes, 4M undirected edges, 4-regular
    val ring = s.range(n).select(col("id").as("a"),
        ((col("id") + 1) % n).as("b"))
      .unionAll(s.range(n).select(col("id").as("a"),
        ((col("id") + skip) % n).as("b")))
    var t0 = System.nanoTime()
    val core2 = graft.ops.Graph.kcoreCore(ring, k = 2, rounds = 5)
      .agg(count(lit(1)).as("nodes"), min(col("deg")).as("dmin"),
        max(col("deg")).as("dmax")).head()
    val wK2 = (System.nanoTime() - t0) / 1e9
    println(f"kcore k=2 r=5 @2M: nodes=${core2.getLong(0)} " +
      f"deg=[${core2.getLong(1)},${core2.getLong(2)}] wall=$wK2%.1f s " +
      s"UNIFORM_CORE_OK=${core2.getLong(0) == n && core2.getLong(1) == 4 && core2.getLong(2) == 4}")
    t0 = System.nanoTime()
    val core5 = graft.ops.Graph.kcoreCore(ring, k = 5, rounds = 5).count()
    val wK5 = (System.nanoTime() - t0) / 1e9
    println(f"kcore k=5 r=5 @2M: residual=$core5 wall=$wK5%.1f s " +
      s"EMPTY_CASCADE_OK=${core5 == 0}")

    // --- LPA on 500k disjoint 4-cliques: 2M nodes, 3M undirected edges
    val base = s.range(n / 4).select((col("id") * 4).as("c"))
    val cliq = base.select(col("c").as("a"), (col("c") + 1).as("b"))
      .unionAll(base.select(col("c").as("a"), (col("c") + 2).as("b")))
      .unionAll(base.select(col("c").as("a"), (col("c") + 3).as("b")))
      .unionAll(base.select((col("c") + 1).as("a"), (col("c") + 2).as("b")))
      .unionAll(base.select((col("c") + 1).as("a"), (col("c") + 3).as("b")))
      .unionAll(base.select((col("c") + 2).as("a"), (col("c") + 3).as("b")))
    t0 = System.nanoTime()
    val lpa = graft.ops.Graph.lpaCore(cliq, rounds = 3)
    val bad = lpa.where(col("lbl") =!= (col("node") - pmod(col("node"), lit(4L)))).count()
    val tot = lpa.count()
    val wL = (System.nanoTime() - t0) / 1e9
    println(f"lpa T=3 @2M/500k cliques: nodes=$tot mismatches=$bad " +
      f"wall=$wL%.1f s CLIQUE_MIN_LABEL_OK=${bad == 0 && tot == n}")
    s.stop()
  }
}
