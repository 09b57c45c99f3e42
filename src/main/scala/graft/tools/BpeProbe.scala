package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 measurement of the BPE trainer's distributed merge loop (r14
  * verdict item 7): force the distributed path (localSolveCap = 0) and
  * measure the per-merge job cost against the adaptive driver-side solve,
  * plus the job count the Spark UI would show. K merges are SEQUENTIAL BY
  * DEFINITION in Sennrich BPE — merge k+1's pair counts depend on merge
  * k's rewrite — so "fold the loop into one job" is not semantics-
  * preserving; what this probe quantifies is the fixed per-merge cost
  * (one pair-count hash agg + 1-row TakeOrdered + dict rewrite
  * checkpoint) that a 32k-merge production vocabulary would pay 32k
  * times. Verdict lives in SCALING.md's tokenizer entry. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]").appName("bpe-probe")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    def run(cap: Long, tag: String): Set[String] = {
      val t0 = System.nanoTime()
      val jobs0 = s.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val rows = graft.ops.Bpe.tokenizerFit(s, sf, cap).collect()
      val w = (System.nanoTime() - t0) / 1e9
      val jobs = s.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobs0
      println(f"$tag%-22s wall=$w%6.2f s merges=${rows.length} jobs=$jobs " +
        f"(${w / math.max(rows.length, 1)}%.3f s/merge)")
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    }
    val a = run(1L << 16, "adaptive (driver)")
    val b = run(0L, "forced distributed")
    println(s"paths identical: ${a == b}")
    s.stop()
  }
}
