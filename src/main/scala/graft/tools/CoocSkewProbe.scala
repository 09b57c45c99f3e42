package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 hot-cell skew probe for the co-occurrence edge builder
  * (r14 verdict item 1 — the last unguarded quadratic in a hot path).
  *
  * coocEdges self-joins distinct (user, event_type, minute) cells and
  * emits u < v pairs: unbounded, a cell with k users emits C(k,2) rows —
  * a viral minute at 100× scale (k ~ 10⁵) emits ~5×10⁹ pairs before
  * `distinct`. Round 15 bounds the builder with [[graft.ops.Graph.CoocCellCap]]
  * (keep the 64 smallest user ids per cell); this probe EXECUTES the A/B:
  *
  *  - synthetic corpus = ONE hot cell (k users, one event_type+minute)
  *    + 200,000 background cells of exactly 2 unique users each;
  *  - closed form: capped edge count = C(min(k,cap),2) + 200,000, and
  *    with k=10 (below cap) capped ≡ uncapped — both asserted exactly;
  *  - uncapped blowup measured at k=10,000 (C(k,2) = 49,995,000 pairs —
  *    large enough to show the wall, small enough to finish); the k=10⁵
  *    uncapped run is NOT executed (≈5×10⁹ pairs would spill the box) —
  *    its emission is the analytic bound printed for the table;
  *  - capped wall at k=10⁵ must sit in the background-only band (flat).
  *
  * Output rows feed SCALING.md's round-15 table.
  */
object CoocSkewProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("cooc-skew")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val nBg = 200000L
    // background: cell i holds users (1e9+2i, 1e9+2i+1) — one pair each,
    // all users unique across cells so edge count is exactly nBg
    val bg = s.range(nBg).select(
        (lit(1000000000L) + col("id") * 2).as("u0"),
        concat(lit("bg_"), col("id")).as("event_type"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp")
          + expr("make_interval(0,0,0,0,0, cast(id % 1440 as int), 0)")).as("ts"))
    val bgEvents = bg.select(col("u0").as("user_id"), col("event_type"), col("ts"))
      .unionAll(bg.select((col("u0") + 1).as("user_id"), col("event_type"),
        col("ts")))

    def hot(k: Long) = s.range(k).select(
      col("id").as("user_id"), lit("viral").as("event_type"),
      lit(java.sql.Timestamp.valueOf("2024-06-01 12:34:00")).cast("timestamp")
        .as("ts"))

    def run(tag: String, k: Long, cap: Int, expect: Long): Double = {
      val ev = bgEvents.unionAll(hot(k)).localCheckpoint(true)
      val t0 = System.nanoTime()
      val edges = graft.ops.Graph.coocEdgesCore(ev, cap).count()
      val w = (System.nanoTime() - t0) / 1e9
      val ok = edges == expect
      println(f"cooc $tag: k=$k cap=$cap edges=$edges expect=$expect " +
        f"wall=$w%.2f s CLOSED_FORM_OK=$ok")
      w
    }

    def c2(n: Long) = n * (n - 1) / 2
    val capL = graft.ops.Graph.CoocCellCap.toLong

    // capped ≡ uncapped below the cap (k=10): same exact edge set size
    run("k<cap uncapped", 10L, Int.MaxValue, nBg + c2(10))
    run("k<cap capped  ", 10L, graft.ops.Graph.CoocCellCap, nBg + c2(10))
    // the measured blowup: 10k-user cell uncapped = 49,995,000 hot pairs
    val wUn = run("k=10k UNCAPPED ", 10000L, Int.MaxValue, nBg + c2(10000))
    val wCp = run("k=10k capped   ", 10000L, graft.ops.Graph.CoocCellCap,
      nBg + c2(capL))
    // the viral cell the verdict names: 1e5 users. Uncapped analytic bound
    // only (C(1e5,2) ≈ 5.0e9 pairs); capped must execute flat.
    val wXl = run("k=100k capped  ", 100000L, graft.ops.Graph.CoocCellCap,
      nBg + c2(capL))
    println(f"uncapped k=100k ANALYTIC emission = ${c2(100000L)}%,d pairs " +
      "(not executed)")
    println(f"blowup ratio uncapped/capped at k=10k: ${wUn / wCp}%.1fx; " +
      f"capped k=100k wall vs capped k=10k: ${wXl / wCp}%.2fx (flat ⇒ bounded)")
    s.stop()
  }
}
