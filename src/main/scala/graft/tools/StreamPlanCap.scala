package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Streaming-plan evidence capture for plans/r17: runs one registered
  * streaming id under each given `graft.stream.maxStateParts` arm (warm
  * JVM, arms alternated, median of `reps`) and prints, per arm, the median
  * wall, the last run's StreamingQueryProgress rows (stateOperators with
  * numShufflePartitions, commit/addBatch durations) and the final batch
  * plan — the observable counterpart of the r17 withStreamConfs change
  * (PlanCap cannot see inside a MicroBatchExecution).
  *
  * Usage: StreamPlanCap <id> <sfDir> <reps> <parts> [parts ...]
  */
object StreamPlanCap {
  def main(args: Array[String]): Unit = {
    val id = args(0); val sf = args(1); val reps = args(2).toInt
    val arms = args.drop(3).toSeq
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    s.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        progress.add(e.progress.json)
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    // warmup: one untimed pass absorbs codegen/state-store classloading
    graft.SparkEntry.queries(id)(s, sf).count()
    val walls = mutable.Map[String, mutable.ArrayBuffer[Double]]()
    val lastProgress = mutable.Map[String, Seq[String]]()
    val rowsPerArm = mutable.Map[String, Long]()
    var lastPlan = ""
    for (_ <- 1 to reps; parts <- arms) {
      s.conf.set("graft.stream.maxStateParts", parts)
      progress.clear()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(id)(s, sf)
      rowsPerArm(parts) = df.count()
      walls.getOrElseUpdate(parts, mutable.ArrayBuffer()) +=
        (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      lastProgress(parts) = progress.asScala.toSeq
      lastPlan = df.queryExecution.executedPlan.toString.take(3000)
    }
    for (parts <- arms) {
      val w = walls(parts).toSeq.sorted
      println(s"=== STREAM $id maxStateParts=$parts rows=${rowsPerArm(parts)} " +
        f"medianWall=${w(w.length / 2)}%.2f s reps=${walls(parts).map(x => f"$x%.2f").mkString(",")} ===")
      lastProgress(parts).foreach(println)
    }
    println("=== final batch plan (identical across arms) ===")
    println(lastPlan)
    s.stop()
  }
}
