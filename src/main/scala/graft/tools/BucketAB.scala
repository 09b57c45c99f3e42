package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 A/B: the bucketed co-located join vs the same join planned as
  * a shuffle SortMergeJoin over the plain parquet tables (broadcast
  * disabled on both sides so the comparison is SMJ-vs-SMJ — the 100 TB
  * regime where neither side broadcasts). Prints wall per rep plus the
  * exchange counts from the final adaptive plans. */
object BucketAB {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("bucket-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def agg(j: DataFrame): DataFrame =
      j.groupBy(col("o_orderstatus"))
        .agg((sum(graft.util.Canon.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 100.0)
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    def shuffled(): DataFrame = {
      val li = graft.util.Canon.tbl(s, d, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = graft.util.Canon.tbl(s, d, "orders")
        .select("o_orderkey", "o_orderstatus")
      agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
    }
    def bucketed(): DataFrame =
      agg(graft.ops.Scale.bucketedJoinPlan(s, d))
    // stage the bucketed tables + warm both paths once
    bucketed().collect(); shuffled().collect()
    def time(mk: () => DataFrame, reps: Int): (Double, DataFrame) = {
      var last: DataFrame = null
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        last = mk(); last.collect()
        (System.nanoTime() - t0) / 1e9
      }
      (walls.sorted.apply(reps / 2), last)
    }
    val (wS, dfS) = time(() => shuffled(), 5)
    val (wB, dfB) = time(() => bucketed(), 5)
    def exchanges(df: DataFrame): Int =
      MetricsProbe.allNodes(df.queryExecution.executedPlan)
        .count(_.getClass.getSimpleName.contains("ShuffleExchange"))
    println(f"shuffled SMJ : median $wS%5.2f s, exchanges=${exchanges(dfS)}")
    println(f"bucketed SMJ : median $wB%5.2f s, exchanges=${exchanges(dfB)}")
    println("bucketed final plan:")
    println(dfB.queryExecution.executedPlan.toString.linesIterator
      .take(30).mkString("\n"))
    s.stop()
  }
}
