package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 streaming sketch scale probe: does `stream_cms_freq`'s state
  * stay FLAT when the stream carries many more rows (and, in the fresh-id
  * regime, many more distinct keys)? The r13 streaming probe measured the
  * per-key monitors' state growing linearly with distinct ids (that IS
  * their dedup state); the CMS monitor's pitch is O(windows · d·w) state
  * no matter what the keys do — this executes that claim.
  *
  * Method mirrors the r13 probe: sf0.1 events multiplied 1×/16×/64×
  * through an AvailableNow replay of the windowed `graft_cms` aggregate
  * (maxFilesPerTrigger staging not needed — state is what's probed, and
  * `stateOperators.numRowsTotal` from the progress events is the state
  * store's own row count). DUP regime copies rows verbatim; FRESH regime
  * offsets user_id by 10k per copy so distinct keys grow 64× too — the
  * regime that blows up per-key state cannot move sketch state at all.
  * A correctness guard re-asserts est ≥ exact on the multiplied corpus. */
object StreamCmsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("cms-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.ext.CatalystExt.register(s)
    val base = graft.util.Canon.tbl(s, "/root/testdata/sf0.1", "events")
      .select(col("ts"), col("user_id"))

    def run(mult: Int, fresh: Boolean): Unit = {
      val tag = if (fresh) "fresh" else "dup"
      val df = (0 until mult).map { i =>
        if (fresh) base.withColumn("user_id", col("user_id") + lit(i * 10000L))
        else base
      }.reduce(_ unionAll _)
      val dir = s"/tmp/graft_io/cms_probe_${mult}_$tag"
      df.write.mode("overwrite").parquet(dir)
      val t0 = System.nanoTime()
      val q = s.readStream.schema(s.read.parquet(dir).schema).parquet(dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(expr("graft_cms(user_id)").as("sk"), count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(s"cms_$mult$tag")
        .outputMode("complete")
        .option("checkpointLocation", s"/tmp/graft_io/cms_probe_ck_${mult}_$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val stateRows = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsTotal)).maxOption.getOrElse(-1L)
      val sink: DataFrame = s.table(s"cms_$mult$tag")
      val nWin = sink.count()
      // guard: min-of-rows estimate for user 0 ≥ its exact count, summed
      // over windows (exact per-window replay is the oracle's job; the
      // probe asserts the deterministic inequality on the big corpus)
      import graft.ext.CatalystExt.{CmsA, CmsB, CmsD, CmsP, CmsW}
      val ests = (0 until CmsD).map { i =>
        val h = pmod(pmod(lit(CmsA(i)) * lit(0L) + lit(CmsB(i)), lit(CmsP)),
          lit(CmsW.toLong))
        element_at(col("sk"), (lit(i * CmsW) + h + lit(1L)).cast("int"))
      }
      val estSum = sink.select(least(ests: _*).as("e"))
        .agg(sum(col("e"))).head().getLong(0)
      val exact0 = df.where(col("user_id") === 0L).count()
      println(f"cms ${mult}x $tag: rows=${df.count()} windows=$nWin " +
        f"stateRows=$stateRows wall=$wall%.1f s " +
        s"NO_UNDERCOUNT_OK=${estSum >= exact0}")
      q.stop()
    }
    run(1, fresh = false)
    run(16, fresh = false)
    run(64, fresh = false)
    run(16, fresh = true)
    run(64, fresh = true)
    s.stop()
  }
}
