package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the training-pipeline operators (Pipeline.scala)
  * beyond the oracle hash-match: the properties a 100 TB dataset release
  * actually depends on.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("split_group_hash is leakage-free: every user in exactly one split") {
    // Recompute the per-user split assignment the query is built on and
    // assert it is a function of user_id alone.
    val ev = graft.util.Canon.events(spark, sf)
      .withColumn("b", ((col("user_id") % 1000003L) * 2654435761L)
        % 4294967296L % 100)
      .withColumn("split", when(col("b") < 80, "train")
        .when(col("b") < 90, "val").otherwise("test"))
    val leaky = ev.groupBy("user_id")
      .agg(countDistinct("split").as("k")).where(col("k") > 1).count()
    assert(leaky == 0)
    // And the three splits cover all events.
    val rep = SparkEntry.queries("split_group_hash")(spark, sf)
    val total = rep.agg(sum("n_events")).first().getLong(0)
    assert(total == ev.count())
  }

  test("sample_stratified is deterministic across runs and repartitioning") {
    val a = SparkEntry.queries("sample_stratified")(spark, sf)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("sample_stratified")(spark, sf)
      .repartition(13).sort("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("sample_fixed_k returns at most k rows per stratum") {
    val over = SparkEntry.queries("sample_fixed_k")(spark, sf)
      .groupBy("lang").count().where(col("count") > 25).count()
    assert(over == 0)
  }

  test("pack_sequences: packs overflow by less than one max document") {
    val packs = SparkEntry.queries("pack_sequences")(spark, sf).cache()
    try {
      val maxTok = spark.read.parquet(s"$sf/documents.parquet")
        .select(size(split(regexp_replace(lower(trim(col("text"))),
          "\\s+", " "), " ")).cast("long").as("tok"))
        .agg(max("tok")).first().getLong(0)
      val worst = packs.agg(max("pack_tokens")).first().getLong(0)
      assert(worst < 512 + maxTok)
      // Token mass is conserved: packs partition the corpus.
      val packed = packs.agg(sum("pack_tokens")).first().getLong(0)
      val corpus = spark.read.parquet(s"$sf/documents.parquet")
        .select(size(split(regexp_replace(lower(trim(col("text"))),
          "\\s+", " "), " ")).cast("long").as("tok"))
        .agg(sum("tok")).first().getLong(0)
      assert(packed == corpus)
    } finally packs.unpersist()
  }

  test("pack_sequences_bfd: balanced packing never truncates more than contiguous") {
    val rep = SparkEntry.queries("pack_sequences_bfd")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("tokens_dropped"), r.getAs[Long]("max_pack_tokens")))
      .toMap
    val langs = rep.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    langs.foreach { lang =>
      val (dBal, mBal) = rep((lang, "balanced"))
      val (dCon, mCon) = rep((lang, "contiguous"))
      assert(dBal <= dCon, s"$lang: balanced truncates more ($dBal > $dCon)")
      assert(mBal <= mCon, s"$lang: balanced max pack larger ($mBal > $mCon)")
    }
  }

  test("chunk_documents covers every token with stride-40 starts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "),
          " ")).cast("long").as("n"))
    val chunks = SparkEntry.queries("chunk_documents")(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("start").as("last_start"),
        max(col("start") + col("chunk_toks") - 1).as("covered"))
    val bad = chunks.join(docs, "doc_id")
      // expected chunk count = ceil((n - 1) / 40) rounded up from starts
      // 1, 41, 81, ... <= n; coverage must reach the last token.
      .where(col("n_chunks") =!= floor((col("n") - 1) / 40) + 1 ||
        col("covered") =!= col("n"))
      .count()
    assert(bad == 0)
  }

  test("mix_domains: weights in (0,1], downsample never upsamples") {
    val m = SparkEntry.queries("mix_domains")(spark, sf).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(w > 0.0 && w <= 1.0)
      assert(r.getAs[Long]("docs_after") <= r.getAs[Long]("docs_before"))
    }
  }

  test("scd2_intervals: versions chain without gaps or overlaps") {
    val h = SparkEntry.queries("scd2_intervals")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type").orderBy("version")
    val broken = h
      .withColumn("next_from", lead(col("valid_from_ms"), 1).over(w))
      // each version's valid_to must equal the next version's valid_from
      .where(col("next_from").isNotNull &&
        col("valid_to_ms") =!= col("next_from"))
      .count()
    assert(broken == 0)
    // exactly one open (current) version per key
    val multiCurrent = h.where(col("is_current"))
      .groupBy("user_id", "event_type").count()
      .where(col("count") =!= 1).count()
    assert(multiCurrent == 0)
  }
}
