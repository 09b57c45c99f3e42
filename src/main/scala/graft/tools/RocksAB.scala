package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 state-store provider A/B (r14 verdict item 4): run every
  * STATEFUL streaming id under the default HDFS-backed state store and
  * again under RocksDBStateStoreProvider, assert the results are
  * hash-identical, and record both walls. Until now only
  * `stream_transform_with_state` pinned RocksDB (the transformWithState
  * API requires it); at 100 TB state the provider choice is load-bearing —
  * RocksDB keeps state OFF-HEAP and spills to local SSD, so per-executor
  * state is bounded by disk, not JVM heap, and snapshot/changelog uploads
  * replace full-state HDFS files at checkpoint time.
  *
  * The provider is a session conf read at QUERY START, so the A/B scopes it
  * per run and restores the previous value — the exact pattern
  * streamTransformWithState uses (Streaming.scala:460).
  *
  * Verdict rows feed SCALING.md §Streaming round-15.
  */
object RocksAB {
  private val ProviderKey = graft.ops.Streaming.ProviderKey
  private val Rocks = graft.ops.Streaming.RocksProvider
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** Every registered stream id with a state store in its plan (windowed
    * aggs, dedup, session windows, stream-stream joins, flatMapGroups
    * state). transform_with_state is excluded — it already pins RocksDB
    * internally, so an A/B would compare RocksDB to itself. */
  val StatefulIds: Seq[String] = Seq(
    "stream_tumbling_count", "stream_sliding_avg", "stream_session_window",
    "stream_watermark_late", "stream_dedup", "stream_stateful_session",
    "stream_stream_join", "stream_stream_outer_join", "stream_cms_freq",
    "stream_mix_monitor", "stream_constraint_monitor", "stream_neardup",
    "stream_ohlc", "stream_observe_metrics")

  /** Runs one id under an EXPLICIT provider (runToTable's round-15 RocksDB
    * pin respects a caller-set conf, so setting the HDFS class here is how
    * the baseline arm still runs the default store). */
  def runOne(s: SparkSession, sf: String, id: String,
      provider: Option[String]): (Set[String], Double) = {
    val prev = s.conf.getOption(ProviderKey)
    provider.foreach(s.conf.set(ProviderKey, _))
    try {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(id)(s, sf).collect()
        .map(_.toSeq.map(String.valueOf).mkString("")).toSet
      (rows, (System.nanoTime() - t0) / 1e9)
    } finally prev match {
      case Some(v) => s.conf.set(ProviderKey, v)
      case None => s.conf.unset(ProviderKey)
    }
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]").appName("rocks-ab")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    var allOk = true
    println(f"${"id"}%-28s ${"hdfs_s"}%8s ${"rocks_s"}%8s  identical")
    for (id <- StatefulIds) {
      val (h, th) = runOne(s, sf, id, Some(Hdfs))
      val (r, tr) = runOne(s, sf, id, Some(Rocks))
      val ok = h == r && h.nonEmpty
      allOk &&= ok
      println(f"$id%-28s $th%8.2f $tr%8.2f  $ok (${h.size} rows)")
    }
    println(s"ALL_IDENTICAL=$allOk")
    s.stop()
  }
}
