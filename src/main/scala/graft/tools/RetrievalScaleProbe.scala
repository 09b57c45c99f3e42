package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 retrieval scale probe: `sim_rrf_fusion` on the sf0.1 corpus
  * multiplied 1× / 16× (documents AND embeddings, fresh ids — the
  * query-side rows doc 0 / vec 0 keep their ids, so the request is
  * unchanged while the corpus grows 16×). The claim under test (PLANS.md):
  * both list plans are scan-bound (BM25 postings aggregate; one
  * broadcast-query cosine pass) and the fusion stage is CONSTANT work —
  * so wall should track the corpus scan, and the top-10 fused ids must
  * still contain the 1× corpus's winners wherever their copies tie-break
  * first (weaker structural check: result stays exactly 10 rows and the
  * per-row rrf_scaled values are from the same Σ 1e9 div (60+rank)
  * lattice). */
object RetrievalScaleProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("rrf-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val embs = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def run(mult: Int): Unit = {
      val dir = s"/tmp/graft_io/rrf_probe_$mult"
      (0 until mult).map(i =>
        if (i == 0) docs else docs.withColumn("doc_id",
          col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (0 until mult).map(i =>
        if (i == 0) embs else embs.withColumn("vec_id",
          col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries("sim_rrf_fusion")(s, dir).collect()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"rrf ${mult}x: rows=${rows.length} " +
        s"top3=${rows.take(3).map(_.getLong(0)).mkString(",")} " +
        f"wall=$w%.1f s TEN_ROWS_OK=${rows.length == 10}")
    }
    run(1)
    run(16)
    s.stop()
  }
}
