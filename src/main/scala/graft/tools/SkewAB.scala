package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 skew A/B (r14 verdict item 5): AQE's OptimizeSkewedJoin vs the
  * manual salting pattern, EXECUTED on one deliberately skewed fixture —
  * and the case AQE cannot help: per-key ordered work (window top-k) on a
  * skewed key, where only manual salting/decomposition removes the hot
  * partition.
  *
  * Fixture: 2M-row fact, ~97% of rows on key 0 (the viral-entity shape),
  * sha2 payload so the hot shuffle partition is incompressible (the skew
  * detector reads compressed sizes); 97-row dimension.
  *
  * Arms:
  *  1. join, AQE skew ON  — OptimizeSkewedJoin splits the hot partition
  *     (asserted: `skew=true` in the final adaptive SMJ).
  *  2. join, AQE skew OFF — the one-reducer-owns-the-hot-key baseline.
  *  3. join, manual ×16 salt, AQE skew OFF — join_skew_salted's pattern.
  *  4. window top-10 per key, plain — AQE does NOT split window/agg
  *     partitions: the hot key sorts ~1.94M rows in ONE task.
  *  5. window top-10 per key, salted two-stage — per-(key, salt) partial
  *     top-10, then final top-10 over ≤ 16·10 rows per key; result set
  *     asserted EQUAL to arm 4.
  *
  * Broadcast is disabled in the join arms: the probe demonstrates shuffle
  * skew, and at 100 TB the dimension may not broadcast anyway.
  */
object SkewAB {
  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]").appName("skew-ab")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val n = 2000000L
    val fact = s.range(n).select(
      when(col("id") % 32 === 0, pmod(col("id"), lit(97))).otherwise(lit(0L))
        .as("k"),
      col("id").as("v"),
      sha2(col("id").cast("string"), 256).as("pay"))
      .localCheckpoint(true)
    val dim = s.range(97).select(col("id").as("k"), col("id").as("r"))
      .localCheckpoint(true)

    def setSkew(on: Boolean): Unit =
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)

    // the agg keeps max(pay) so column pruning cannot drop the
    // incompressible payload from the join shuffle — without it the hot
    // partition is 16 B/row of sequential longs, compresses to almost
    // nothing, and the skew detector (which reads compressed sizes)
    // never fires
    def joinAgg(f: DataFrame, d2: DataFrame, keys: Seq[String]): DataFrame =
      f.join(d2, keys).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        max(col("pay")).as("mp"))

    // untimed warmup: JIT + shuffle service init land outside the arms
    joinAgg(fact, dim, Seq("k")).collect()

    // --- arm 1: AQE skew-join ON
    setSkew(true)
    val j1 = joinAgg(fact, dim, Seq("k"))
    val (r1, t1) = timed(j1.collect()(0))
    val plan1 = j1.queryExecution.executedPlan.toString
    val split = plan1.contains("skew=true")
    println(f"join AQE-skew-ON : wall=$t1%6.2f s rows=${r1.getLong(0)} " +
      f"skew_split=$split")
    if (sys.env.contains("SPARK_GRAFT_SKEW_PRINT"))
      println(plan1.linesIterator.filter(l =>
        l.contains("SortMergeJoin") || l.contains("skew") ||
          l.contains("AQEShuffleRead")).mkString("\n"))

    // --- arm 2: skew OFF (hot partition on one reducer)
    setSkew(false)
    val (r2, t2) = timed(joinAgg(fact, dim, Seq("k")).collect()(0))
    println(f"join AQE-skew-OFF: wall=$t2%6.2f s rows=${r2.getLong(0)}")

    // --- arm 3: manual ×16 salt, skew OFF (join_skew_salted's pattern)
    val Salts = 16
    val saltedFact = fact.withColumn("salt", pmod(col("v"), lit(Salts.toLong)))
    val repDim = dim.withColumn("salt",
      explode(sequence(lit(0L), lit(Salts - 1L))))
    val (r3, t3) = timed(joinAgg(saltedFact, repDim, Seq("k", "salt"))
      .collect()(0))
    println(f"join manual-salt : wall=$t3%6.2f s rows=${r3.getLong(0)}")
    val joinsAgree = r1.getLong(0) == r2.getLong(0) &&
      r2.getLong(0) == r3.getLong(0) && r1.getLong(1) == r3.getLong(1)
    println(s"join arms agree: $joinsAgree (n=${r1.getLong(0)})")

    // --- arm 4: window TOP-10 per key on a skewed key. Spark 3.5+'s
    // InferWindowGroupLimit turns a rank<=k filter into a WindowGroupLimit
    // that runs in PARTIAL mode before the exchange — automatic
    // decomposition, so top-k window skew is already absorbed by the
    // optimizer (asserted below by finding the node in the plan).
    setSkew(true) // on, to show join-skew handling does NOT cover windows
    val nBig = 8000000L
    val big = s.range(nBig).select(
      when(col("id") % 32 === 0, pmod(col("id"), lit(97))).otherwise(lit(0L))
        .as("k"),
      col("id").as("v"),
      sha2(col("id").cast("string"), 256).as("pay"))
      .localCheckpoint(true)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy(desc("v"))
    val top = big.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10).select("k", "v", "pay")
    val (top4, t4) = timed(top.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
    val wgl = top.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit")
    println(f"window top-k     : wall=$t4%6.2f s rows=${top4.size} " +
      f"auto_partial_limit=$wgl")

    // --- arm 5: EMIT-ALL row_number per key, plain — the per-key ordered
    // work neither OptimizeSkewedJoin (joins only) nor WindowGroupLimit
    // (rank filters only) can bound: ONE task sorts+numbers ~97% of 8M
    // wide rows.
    def sig(df: DataFrame) = df.agg(count(lit(1)).as("n"),
      sum(col("rn").cast("decimal(28,0)")).as("sr"),
      sum((col("rn") * pmod(col("v"), lit(1000003L))).cast("decimal(28,0)"))
        .as("sig")).collect()(0)
    val (s5, t5) = timed(sig(big.withColumn("rn", row_number().over(w))))
    println(f"window emit-all plain : wall=$t5%6.2f s")

    // --- arm 6: range-bucketed DECOMPOSITION of the same emit-all
    // numbering (manual skew handling where no automatic rewrite exists):
    // bucket by value range (order-aligned), number per (k, bucket), add
    // per-bucket offsets (a tiny windowed agg over ≤ k·B rows). Exactly
    // the distributed prefix-sum pattern; result proven identical via an
    // exact signature.
    val B = 16L
    val bucketed = big.withColumn("b", (col("v") * B / nBig).cast("long"))
    val wb = Window.partitionBy("k", "b").orderBy(desc("v"))
    val cnts = bucketed.groupBy("k", "b").agg(count(lit(1)).as("c"))
    val woff = Window.partitionBy("k").orderBy(desc("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cnts.withColumn("off", coalesce(sum(col("c")).over(woff), lit(0L)))
      .select("k", "b", "off")
    val (s6, t6) = timed(sig(bucketed
      .withColumn("rnp", row_number().over(wb))
      .join(broadcast(offs), Seq("k", "b"))
      .withColumn("rn", col("rnp") + col("off"))))
    println(f"window emit-all salted: wall=$t6%6.2f s")
    println(s"emit-all arms agree: ${s5 == s6} " +
      s"(n=${s5.getLong(0)}, sig=${s5.getDecimal(2)})")
    println(f"SUMMARY join: off/on=${t2 / t1}%.2fx salt/on=${t3 / t1}%.2fx; " +
      f"emit-all window: plain/decomposed=${t5 / t6}%.2fx")
    s.stop()
  }
}
