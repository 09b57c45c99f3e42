package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured A/B for the VARIANT family's 100 TB claim (round 15):
  * on a replicated 10 M-row corpus with an ~8-field nested JSON envelope,
  * compare the three ways to serve k typed extractions per row:
  *
  *   (a) string column + k × get_json_object  — k parses per row per query
  *   (b) string column + one from_json(struct) — 1 parse per row per query,
  *       but needs the full schema declared up front
  *   (c) VARIANT column in parquet (parse_json at INGEST) — 0 parses per
  *       row per query; each variant_get is a binary path walk
  *
  * Both tables are written to parquet first so the scan side is identical;
  * each arm is a full aggregate over 10 M rows, n=3 median, loadavg
  * recorded. Results land in SCALING.md. */
object VariantProbe {
  private def timed(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime(); val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }
  private def median3(body: => Long): (Double, Long) = {
    val runs = (1 to 3).map(_ => timed(body))
    (runs.map(_._1).sorted.apply(1), runs.head._2)
  }
  private def load(): String = {
    val l = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
    l.split(" ").take(3).mkString("/")
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]").appName("variant-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 100
    val base = "/tmp/graft_io/variant_probe"

    println(s"loadavg at start: ${load()}")

    // 10M rows: events sf0.1 (100k) × reps, each with a nested envelope
    val ev = graft.util.Canon.tbl(s, d, "events")
      .select(col("event_id"), col("event_type"), col("props"))
      .crossJoin(s.range(reps).select(col("id").as("rep")))
      .select(
        (col("event_id") * reps + col("rep")).as("rid"),
        concat(
          lit("""{"meta": {"id": """), col("event_id"),
          lit(""", "rep": """), col("rep"),
          lit(""", "et": """"), col("event_type"),
          lit("""", "flags": [1, """), col("event_id") % 7,
          lit(""", """), col("rep") % 5,
          lit("""]}, "payload": """), col("props"),
          lit(""", "score": """), (col("event_id") % 1000) / lit(10.0),
          lit("}")).as("j"))

    val (wStr, _) = timed {
      ev.write.mode("overwrite").parquet(s"$base/str"); 0L
    }
    val (wVar, _) = timed {
      ev.selectExpr("rid", "parse_json(j) AS v")
        .write.mode("overwrite").parquet(s"$base/var"); 0L
    }
    val strT = s.read.parquet(s"$base/str")
    val varT = s.read.parquet(s"$base/var")
    val n = strT.count()
    println(f"rows: $n%d  write_str: $wStr%.2f s  write_var(parse at ingest): $wVar%.2f s")

    // combined checksum over ALL FOUR extracted fields (review r15: the
    // first cut compared only sum(id), which could not catch a path-
    // semantics divergence in flags[1]/score between the three arms)
    def agg4(df: DataFrame): Long = {
      val r = df.agg(
        sum(col("id")), sum(col("rep")), sum(col("f2")),
        sum((col("sc").cast("double") * 10).cast("long"))).collect().head
      r.getLong(0) ^ (r.getLong(1) * 31) ^ (r.getLong(2) * 1009) ^
        (r.getLong(3) * 524287)
    }

    // (a) k=4 independent get_json_object extractions (4 parses/row)
    val (ta, ra) = median3 {
      agg4(strT.select(
        get_json_object(col("j"), "$.meta.id").cast("long").as("id"),
        get_json_object(col("j"), "$.meta.rep").cast("long").as("rep"),
        get_json_object(col("j"), "$.meta.flags[1]").cast("long").as("f2"),
        get_json_object(col("j"), "$.score").cast("double").as("sc")))
    }
    // (b) one from_json into a declared struct, then 4 field reads
    val sch = "STRUCT<meta: STRUCT<id: BIGINT, rep: BIGINT, et: STRING, flags: ARRAY<BIGINT>>, payload: STRUCT<k: BIGINT>, score: DOUBLE>"
    val (tb, rb) = median3 {
      agg4(strT.select(from_json(col("j"), org.apache.spark.sql.types.DataType
          .fromDDL(sch).asInstanceOf[org.apache.spark.sql.types.StructType]).as("o"))
        .select(
          col("o.meta.id").as("id"), col("o.meta.rep").as("rep"),
          element_at(col("o.meta.flags"), 2).as("f2"), col("o.score").as("sc")))
    }
    // (c) variant path walks over the stored binary (0 parses)
    val (tc, rc) = median3 {
      agg4(varT.selectExpr(
        "variant_get(v, '$.meta.id', 'long') AS id",
        "variant_get(v, '$.meta.rep', 'long') AS rep",
        "variant_get(v, '$.meta.flags[1]', 'long') AS f2",
        "variant_get(v, '$.score', 'double') AS sc"))
    }
    assert(ra == rb && rb == rc, s"arms disagree: $ra $rb $rc")
    println(f"(a) 4x get_json_object : $ta%.2f s")
    println(f"(b) 1x from_json struct: $tb%.2f s")
    println(f"(c) 4x variant_get     : $tc%.2f s")
    println(s"checksum agrees across arms: $ra")
    println(s"loadavg at end: ${load()}")
    s.stop()
  }
}
