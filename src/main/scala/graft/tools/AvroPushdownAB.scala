package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 verdict item 6 — measure-then-decide on Avro data-filter
  * pushdown. Avro is a ROW format: the resolving decoder must walk every
  * record's bytes regardless, so unlike parquet there is no page/column
  * skip to win — the pushed predicate can only save the InternalRow
  * hand-off and Spark-side residual evaluation for non-matching rows.
  * This probe quantifies that bound honestly: lineitem at sf0.1 (600k
  * rows × 16 columns — wide enough for decode + hand-off to dominate)
  * staged as 8 container files, read back under three predicates of
  * decreasing selectivity, each arm (pushdown on / off via
  * `graft.avro.filter.pushdown`) alternating within reps, constant
  * sentinel + loadavg brackets, medians over n reps.
  *
  *  - `sel`  : l_partkey < 20      (~0.1% of rows survive)
  *  - `mid`  : l_returnflag='R'    (~25% survive)
  *  - `none` : l_quantity >= 0     (everything survives — pure overhead arm)
  *
  * Decision rule (BASELINE.md discipline): keep the default ON only if
  * the selective arm wins and the overhead arm does not lose.
  *
  * MEASURED (r17, n=7 alternating, sentinel 0.193 s stable, loadavg ~2):
  * ratio on/off = 1.054 (sel), 1.178 (mid), 1.018 (none) — the pushed
  * row-skip LOSES at every selectivity: the reader-side predicate is an
  * interpreted eval over boxed values, while the residual Filter it would
  * save is whole-stage-codegen'd over the already-materialized row; Avro
  * being a row format, decode cost is identical in both arms. DECLINED —
  * `graft.avro.filter.pushdown` defaults to FALSE (partition-listing
  * pruning is unaffected: it is exact, driver-side, and skips whole
  * files). SCALING.md r17 carries the table. */
object AvroPushdownAB {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("avro-push-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 7

    val dir = s"/tmp/graft_io/avro_pushdown_ab"
    // lineitem (600k rows × 16 cols at sf0.1): wide enough that decode +
    // row hand-off dominate and the arms can actually separate (the
    // events-table pilot had ~0.12 s walls — pure fixed cost, no signal)
    graft.sources.avro.AvroUtil.write(
      s.read.parquet(s"$sf/lineitem.parquet").repartition(8), dir)

    def loadavg(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString("[", ",", "]")

    def arm(push: Boolean, pred: String): Double = {
      val t0 = System.nanoTime()
      s.read.format("graft-avro")
        .option(graft.sources.avro.AvroDataSource.FilterPushdownKey,
          push.toString)
        .load(dir)
        .where(pred)
        .agg(count(lit(1)), sum(col("l_orderkey")), sum(col("l_quantity")))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      s.read.parquet(s"$sf/lineitem.parquet")
        .selectExpr("sum(l_orderkey % 97)").collect()
      (System.nanoTime() - t0) / 1e9
    }

    val preds = Seq(
      "sel" -> "l_partkey < 20",        // ~0.1% survive
      "mid" -> "l_returnflag = 'R'",    // ~25% survive
      "none" -> "l_quantity >= 0.0")    // all survive — overhead arm

    // warmup both arms (JIT/codegen parity)
    preds.foreach { case (_, p) => arm(push = true, p); arm(push = false, p) }

    println(s"load_start=${loadavg()}")
    val on = collection.mutable.Map[String, collection.mutable.ArrayBuffer[Double]]()
    val off = collection.mutable.Map[String, collection.mutable.ArrayBuffer[Double]]()
    preds.foreach { case (t, _) =>
      on(t) = collection.mutable.ArrayBuffer(); off(t) = collection.mutable.ArrayBuffer()
    }
    val sentinels = collection.mutable.ArrayBuffer[Double]()
    for (r <- 1 to reps) {
      sentinels += sentinel()
      preds.foreach { case (tag, p) =>
        if (r % 2 == 1) { on(tag) += arm(true, p); off(tag) += arm(false, p) }
        else { off(tag) += arm(false, p); on(tag) += arm(true, p) }
      }
      println(f"rep $r: sentinel=${sentinels.last}%.3f " +
        preds.map { case (t, _) =>
          f"$t on=${on(t).last}%.3f off=${off(t).last}%.3f" }.mkString(" "))
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    println(s"load_end=${loadavg()}")
    preds.foreach { case (t, p) =>
      val o = med(on(t).toSeq); val f = med(off(t).toSeq)
      println(f"MEDIANS $t ($p): on=$o%.3f off=$f%.3f ratio_on/off=${o / f}%.3f")
    }
    println(f"sentinel median=${med(sentinels.toSeq)}%.3f reps=$reps")
    s.stop()
  }
}
