package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 measurement harness for the PQ-family recall fix (VERDICT r13
  * item 1): prints recall@5 vs the exact brute-force top-5 for sim_pq_ann
  * and sim_ivfpq_ann under (K codewords, training-sample rows, Cand)
  * configurations, per scale factor. Temporary tool — results land in
  * SCALING.md; the winning config is hardcoded into the operators.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
              else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1")
    for (d <- sfs) {
      val exact = graft.ops.TextDedup.queries("sim_cosine_topk")(s, d)
        .select(col("qid"), col("vec_id")).localCheckpoint(true)
      val nExact = exact.count()
      def recall(df: DataFrame): Double = {
        val hits = df.select(col("qid"), col("vec_id"))
          .join(exact, Seq("qid", "vec_id")).count()
        hits.toDouble / nExact
      }
      val n = s.read.parquet(s"$d/embeddings.parquet").count()
      println(f"== $d (n=$n, exact rows=$nExact)")
      val e = s.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val model = graft.ops.TextDedup.ivfPqTrain(e, 256, 2048).get
      for (p <- Seq(2, 3, 4)) {
        val t0 = System.nanoTime()
        val rIvf = recall(graft.ops.TextDedup.simIvfAnnImpl(s, d, probes = p))
        val t1 = System.nanoTime()
        val rIvfPq = recall(graft.ops.TextDedup.ivfPqQuery(s, e, model,
          candOverride = 200, probes = p))
        val t2 = System.nanoTime()
        println(f"  probes=$p : ivf=${rIvf * 100}%5.1f%% (${(t1 - t0) / 1e9}%5.2f s)  " +
          f"ivfpq(K256,s2048,c200)=${rIvfPq * 100}%5.1f%% (${(t2 - t1) / 1e9}%5.2f s)")
      }
      // K ~ sqrt(n) coarse-quantizer scaling rule (the production sizing
      // the nprobe-4-of-8 comments assert): lists grow with the corpus,
      // probed FRACTION shrinks, recall must hold.
      for ((kL, p) <- Seq((math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt),
                           math.max(2, math.ceil(math.sqrt(n.toDouble) / 8).toInt)))) {
        val t0 = System.nanoTime()
        val r = recall(graft.ops.TextDedup.simIvfAnnImpl(s, d, probes = p, kLists = kL))
        val t1 = System.nanoTime()
        println(f"  sqrt-rule K=$kL probes=$p (${p * 100.0 / kL}%4.1f%% of lists) : " +
          f"ivf=${r * 100}%5.1f%% (${(t1 - t0) / 1e9}%5.2f s)")
      }
      // 16x perturbed-copy corpus (the r13 A/B's scale posture check):
      // copies keep their source's neighborhoods, so the ADC/candidate
      // stages carry 16x the rows — wall must stay near-flat per the
      // bucket/list equi-join scale argument. Recall is NOT comparable on
      // the blown-up corpus (copies crowd the true top-5), so report wall.
      if (sys.env.get("RECALL_PROBE_16X").contains("1")) {
        val big = (0 until 16).map { r =>
          e.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
            transform(col("embedding"),
              x => x + lit(r.toFloat * 1e-4f)).as("embedding"))
        }.reduce(_ unionAll _).localCheckpoint(true)
        val m16 = graft.ops.TextDedup.ivfPqTrain(big, 256, 2048).get
        val t0 = System.nanoTime()
        graft.ops.TextDedup.ivfPqQuery(s, big, m16,
          qIn = big.where(col("vec_id") < 10)).count()
        val t1 = System.nanoTime()
        println(f"  16x corpus (n=${big.count()}): ivfpq serve wall=${(t1 - t0) / 1e9}%5.2f s")
      }
    }
    s.stop()
  }
}
