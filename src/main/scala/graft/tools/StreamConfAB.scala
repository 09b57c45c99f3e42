package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-17 streaming-overhead A/B (optimization guide §1: measure first).
  *
  * The r17 box showed the streaming family 3–9x slower than the r16 quiet
  * regime while the batch families moved ~1.6x (the plain machine-regime
  * shift), with per-rep stalls of 20–50 s on identical code — i.e. a
  * streaming-specific fixed cost got more expensive AND a suite-context
  * degradation appeared (isolated medians are 2–3x better than in-suite).
  * Candidate mechanisms, each mapped to a conf arm below:
  *
  *  - RocksDB full-snapshot upload per commit per store
  *    → `changelog` arm (rocksdb.changelogCheckpointing.enabled=true)
  *  - one RocksDB instance per shuffle partition per stateful op (32 per op
  *    under the bench session), each with native open/commit/close cost
  *    → `parts8` arm (spark.sql.shuffle.partitions=8 scoped to the query)
  *  - zombie providers from completed queries unloaded only on the 60 s
  *    maintenance tick, stalling the next query's store load
  *    → `maint5` arm (stateStore.maintenanceInterval=5s)
  *  - the provider itself
  *    → `hdfs` arm (HDFSBackedStateStoreProvider, the pre-r15 default)
  *
  * Arms alternate per rep so machine drift decorrelates; results are
  * asserted identical across arms (same row-set as the base arm).
  *
  * Usage: StreamConfAB <sfDir> <reps> <id> [id ...]
  */
object StreamConfAB {
  private val ProviderKey = graft.ops.Streaming.ProviderKey
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val Changelog =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
  private val Maint = "spark.sql.streaming.stateStore.maintenanceInterval"
  private val Parts = "spark.sql.shuffle.partitions"

  final case class Arm(label: String, confs: Map[String, String])

  def main(args: Array[String]): Unit = {
    val sf = args(0); val reps = args(1).toInt; val ids = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config(Parts, cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = Seq(
      Arm("base", Map.empty),
      Arm("hdfs", Map(ProviderKey -> Hdfs)),
      Arm("changelog", Map(Changelog -> "true")),
      Arm("maint5", Map(Maint -> "5s")),
      Arm("parts8", Map(Parts -> "8")),
      Arm("combo", Map(Changelog -> "true", Maint -> "5s", Parts -> "8")))
    // warmup (same as Bench)
    spark.range(100000).selectExpr("sum(id % 7)").collect()
    for (id <- ids) {
      val fn = graft.SparkEntry.queries(id)
      val times = mutable.Map[String, mutable.ArrayBuffer[Double]]()
      val rowsets = mutable.Map[String, Seq[String]]()
      for (_ <- 1 to reps; arm <- arms) {
        val prev = arm.confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
        arm.confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          System.gc()
          val t0 = System.nanoTime()
          val rows = fn(spark, sf).collect()
          val dt = (System.nanoTime() - t0) / 1e9
          times.getOrElseUpdate(arm.label, mutable.ArrayBuffer()) += dt
          val rs = rows.map(_.toSeq.map(String.valueOf).mkString("")).toSeq.sorted
          rowsets.get(arm.label) match {
            case Some(r0) => require(r0 == rs, s"$id/${arm.label}: row drift")
            case None => rowsets(arm.label) = rs
          }
        } finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      val base = rowsets("base")
      val same = arms.forall(a => rowsets(a.label) == base)
      println(s"==== $id rows=${base.size} all_identical=$same")
      for (a <- arms) {
        val ts = times(a.label).sorted
        val med = ts(ts.length / 2)
        println(f"  ${a.label}%-10s med=$med%6.2f  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
