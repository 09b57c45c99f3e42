package graft.ops

import graft.util.Canon._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique operators — the shuffle-shaping patterns SURVEY.md §4
  * mandates for 100 TB (skew salting, bucketed co-located joins), expressed
  * as verifiable queries: each technique must produce the same answer as its
  * naive formulation, so the DuckDB oracle is the plain SQL.
  */
object Scale {
  type Q = (SparkSession, String) => DataFrame

  /** Two-stage salted aggregation: heavy keys (5 event types over all rows)
    * are pre-split across 16 deterministic salts for the partial aggregate,
    * then combined — bounds any single reducer's load at 100 TB. The salt is
    * event_id-derived (deterministic), and cent sums recombine exactly. */
  private val aggSkewSalted: Q = (s, d) =>
    tbl(s, d, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(cents(col("value"))).as("pc"), count(lit(1)).as("pn"))
      .groupBy(col("event_type"))
      .agg((sum(col("pc")) / 100.0).as("v_sum"), sum(col("pn")).as("n"))
      .orderBy("event_type")

  /** Salted skew join: the big (skewed) side gets a deterministic salt, the
    * small side is replicated across all 16 salts, and the join runs on
    * (key, salt) — no single reducer ever owns a whole hot key. Must produce
    * exactly the plain join's answer. (AQE's skew-join split is the
    * automatic variant; this is the explicit lever for joins AQE can't
    * split, e.g. under required distributions.) */
  private val joinSkewSalted: Q = (s, d) => {
    val Salts = 16
    val li = tbl(s, d, "lineitem")
      .withColumn("salt", pmod(col("l_linenumber") + col("l_orderkey"), lit(Salts)))
    // shuffle_hash hint: both sides still shuffle on (key, salt) — so the
    // pattern actually demonstrates salting (no reducer owns a whole hot
    // key) — but the replicated side becomes a hash build instead of being
    // SORTED through a merge join, which was the round-1 19.5s outlier
    // (sorting the ×16 replica cost more than the skew it cures). A
    // broadcast would be faster here but removes the salted shuffle the
    // query exists to demonstrate, and broadcasting a ×16 fact replica
    // stops scaling long before the shuffle does.
    val ord = tbl(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(sequence(lit(0L), lit(Salts - 1L))))
      .hint("shuffle_hash")
    li.join(ord, col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
      .groupBy(col("o_orderpriority"))
      .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 100.0)
        .as("revenue"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** Bucketed co-located join: lineitem and orders written bucketed+sorted
    * by the join key (8 buckets), then joined — the plan is a SortMergeJoin
    * with NO shuffle exchange on either side (verified by BucketedJoinSpec).
    * This is the pre-partitioning lever for repeated big-big joins at scale. */
  private val joinBucketed: Q = (s, d) => {
    val tag = math.abs(d.hashCode).toHexString
    val liT = s"graft_li_b_$tag"; val ordT = s"graft_ord_b_$tag"
    if (!s.catalog.tableExists(liT)) {
      tbl(s, d, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite")
        .option("path", s"/tmp/graft_io/bucketed/$liT")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liT)
      tbl(s, d, "orders")
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .option("path", s"/tmp/graft_io/bucketed/$ordT")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordT)
    }
    s.table(liT)
      .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 100.0)
        .as("revenue"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** The bucketed join's DataFrame, pre-aggregation — exposed so tests can
    * assert the no-exchange plan shape. */
  private[graft] def bucketedJoinPlan(s: SparkSession, d: String): DataFrame = {
    joinBucketed(s, d) // ensures tables exist
    val tag = math.abs(d.hashCode).toHexString
    s.table(s"graft_li_b_$tag")
      .join(s.table(s"graft_ord_b_$tag"), col("l_orderkey") === col("o_orderkey"))
  }

  private val stagedDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Hive-style partitioned layout: documents written partitionBy(lang),
    * read back with a partition predicate — the scan must list only the
    * lang=en directory (PartitionFilters; asserted by PartitionPruneSpec).
    * At 100 TB this is the partition-pruning lever for selective reads. */
  private val sinkPartitioned: Q = (s, d) => {
    partitionedDocsDir(s, d)
    partitionedDocs(s, d)
      .where(col("lang") === "en")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  private[graft] def partitionedDocsDir(s: SparkSession, d: String): String = {
    val dir = s"/tmp/graft_io/docs_by_lang_${d.hashCode.toHexString}"
    if (stagedDirs.add(dir))
      tbl(s, d, "documents").write.partitionBy("lang").mode("overwrite").parquet(dir)
    dir
  }
  private[graft] def partitionedDocs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(partitionedDocsDir(s, d))

  val queries: Map[String, Q] = Map(
    "agg_skew_salted" -> aggSkewSalted,
    "join_skew_salted" -> joinSkewSalted,
    "join_bucketed" -> joinBucketed,
    "sink_partitioned" -> sinkPartitioned,
  )

  val oracle: Map[String, String] = Map(
    "agg_skew_salted" ->
      """SELECT event_type,
                sum(CAST(floor(value*100 + 0.5) AS BIGINT))/100.0 AS v_sum,
                count(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "join_skew_salted" ->
      """SELECT o_orderpriority,
                sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "join_bucketed" ->
      """SELECT o_orderstatus,
                sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT))/100.0 AS revenue,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "sink_partitioned" ->
      """SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en'
         ORDER BY doc_id""",
  )
}
