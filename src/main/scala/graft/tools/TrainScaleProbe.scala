package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 trainer scale probe: `pipeline_train_classifier` on the sf0.1
  * corpus multiplied 1× / 16× (fresh doc_ids, verbatim text+lang), with a
  * CLOSED-FORM equivariance check — on a k-duplicated corpus the batch
  * perceptron is exactly scale-equivariant (epoch 1: w ← k·w₁, bias
  * k·bias₁; inductively every epoch's scores scale by k, signs — and
  * therefore the per-copy error sets — are unchanged), so every epoch
  * must read n_errors(k×) = k·n_errors(1×) and w_l1(k×) = k·w_l1(1×)
  * EXACTLY. Wall should track the corpus scan (3 epochs × 2 passes), not
  * blow up: state is the 256-weight model at any size. */
object TrainScaleProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("train-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val base = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()

    def run(mult: Int): Array[(Int, Long, Long, Long)] = {
      val df = (0 until mult).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
      val dir = s"/tmp/graft_io/train_probe_$mult"
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("pipeline_train_classifier")(s, dir)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val w = (System.nanoTime() - t0) / 1e9
      println(f"train ${mult}x (${n * mult} docs): " +
        rows.map(r => s"e${r._1}:${r._2}err/${r._3}L1").mkString(" ") +
        f" wall=$w%.1f s")
      rows
    }
    val r1 = run(1)
    val r16 = run(16)
    val ok = r1.zip(r16).forall { case ((e, ne, l1, b), (e2, ne2, l12, b2)) =>
      e == e2 && ne2 == 16L * ne && l12 == 16L * l1 && b2 == 16L * b
    }
    println(s"EQUIVARIANCE_OK=$ok")
    s.stop()
  }
}
