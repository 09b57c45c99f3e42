package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.avro.{AvroDataSource, AvroUtil}

/** Behavior the oracle hash-match can't pin for the DSv2 Avro source
  * (graft.sources.avro): exotic-type round-trips, split planning, reader-
  * schema pruning reaching the PLAN, and evolution resolution semantics. */
class AvroSourceSpec extends AnyFunSuite {
  import TestSession._

  private val dir = "/tmp/graft_io/avro_spec"

  test("exotic types round-trip: struct/array/map/binary/date/timestamp/null") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("day", DateType),
      StructField("ts", TimestampType),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("rec", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, "héllo \"q\"", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-06-01"),
        java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456"),
        Seq(1L, 2L, 3L), Map("x" -> 1.5, "y" -> -2.25), Row(7, "n")),
      Row(2L, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    AvroUtil.write(df, s"$dir/exotic")
    val back = spark.read.format("graft-avro").load(s"$dir/exotic")
      .orderBy("id").collect()
    assert(back.length == 2)
    val r = back(0)
    assert(r.getLong(0) == 1L && r.getString(1) == "héllo \"q\"")
    assert(r.getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getDate(3) == java.sql.Date.valueOf("2024-06-01"))
    assert(r.getTimestamp(4) ==
      java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456"))
    assert(r.getSeq[Long](5) == Seq(1L, 2L, 3L))
    assert(r.getMap[String, Double](6) == Map("x" -> 1.5, "y" -> -2.25))
    assert(r.getStruct(7) == Row(7, "n"))
    assert((1 to 7).forall(back(1).isNullAt), "null row must stay null")
  }

  test("schema inference off the file header matches the written frame") {
    val df = graft.util.Canon.tbl(spark, sf, "supplier")
    AvroUtil.write(df.repartition(3), s"$dir/sup")
    val got = spark.read.format("graft-avro").load(s"$dir/sup").schema
    assert(got.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)),
      s"inferred $got vs source ${df.schema}")
  }

  test("split planning: small split.bytes fans one file into many partitions, no row lost") {
    val src = graft.util.Canon.tbl(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    AvroUtil.write(src.coalesce(1), s"$dir/split")
    val whole = spark.read.format("graft-avro").load(s"$dir/split")
    val sliced = spark.read.format("graft-avro")
      .option(AvroDataSource.SplitBytesKey, 16384L).load(s"$dir/split")
    assert(sliced.rdd.getNumPartitions > 1,
      s"expected multiple byte-range splits, got ${sliced.rdd.getNumPartitions}")
    assert(sliced.rdd.getNumPartitions > whole.rdd.getNumPartitions)
    // every block claimed exactly once: multiset of keys identical
    val a = sliced.groupBy("l_orderkey", "l_linenumber").count()
    val b = whole.groupBy("l_orderkey", "l_linenumber").count()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "split read dropped or duplicated a block")
    assert(whole.count() == src.count())
  }

  test("column pruning reaches the plan: pruned ReadSchema, bulk column skipped") {
    val df = SparkEntry.queries("scan_avro_evolution")(spark, sf)
    // the projection kept doc_id/language/quality, so the scan node's
    // ReadSchema must carry exactly those — n_chars pruned at the READER
    // SCHEMA level (Avro skips its bytes, the native analogue of parquet
    // column pruning). String-level because AQE wraps the plan before
    // BatchScanExec is reachable by collect.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(
      "ReadSchema: struct<doc_id:bigint,language:string,quality:int>"),
      s"pruned read schema missing from plan:\n$plan")
    assert(!plan.contains("n_chars"),
      s"unprojected field must be pruned from the scan:\n$plan")
  }

  test("v2 write: overwrite-twice leaves only the second commit, no stage dir") {
    val df = graft.util.Canon.tbl(spark, sf, "nation")
    df.repartition(4).write.format("graft-avro").mode("overwrite").save(s"$dir/w")
    df.repartition(2).write.format("graft-avro").mode("overwrite").save(s"$dir/w")
    val root = new java.io.File(s"$dir/w")
    val avros = root.listFiles().filter(_.getName.endsWith(".avro"))
    assert(avros.length == 2,
      s"second overwrite must retire the first commit's 4 files: ${avros.toSeq}")
    assert(!root.listFiles().exists(_.getName == "_stage"),
      "commit must clean the stage directory")
    val back = spark.read.format("graft-avro").load(s"$dir/w")
      .orderBy("n_nationkey").collect()
    assert(back.sameElements(df.orderBy("n_nationkey").collect()))
  }

  test("v2 write: exotic types through the internal-row converter path") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("rec", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType)))),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456"),
        Seq(3L, 1L), Map("k" -> 0.5), Row(9, "x"), Array[Byte](9, 8)),
      Row(2L, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    df.write.format("graft-avro").mode("overwrite").save(s"$dir/wx")
    val back = spark.read.format("graft-avro").load(s"$dir/wx")
    // JSON canonicalization makes binary/map/struct comparable by value
    assert(back.toJSON.collect().sorted.toSeq ==
      df.toJSON.collect().sorted.toSeq)
  }

  test("multi-path load: Spark's JSON-encoded paths option resolves both dirs") {
    val df = graft.util.Canon.tbl(spark, sf, "nation")
    AvroUtil.write(df.where(col("n_nationkey") < 12).coalesce(1), s"$dir/mp_a")
    AvroUtil.write(df.where(col("n_nationkey") >= 12).coalesce(1), s"$dir/mp_b")
    // load(dir1, dir2) reaches the provider as paths=["dir1","dir2"]
    // (JSON array, not comma-joined — review r16)
    val back = spark.read.format("graft-avro")
      .load(s"$dir/mp_a", s"$dir/mp_b")
      .orderBy("n_nationkey").collect()
    assert(back.sameElements(df.orderBy("n_nationkey").collect()),
      s"multi-path union mismatch (${back.length} rows)")
  }

  test("codecs: null/deflate/snappy/zstd round-trip; split reader unaffected") {
    val df = graft.util.Canon.tbl(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    val want = df.orderBy("l_orderkey", "l_linenumber").collect()
    for (c <- Seq("null", "deflate", "snappy", "zstd")) {
      AvroUtil.write(df.coalesce(1), s"$dir/c_$c", c)
      val f = new java.io.File(s"$dir/c_$c").listFiles()
        .filter(_.getName.endsWith(".avro")).head
      val hdr = new org.apache.avro.file.DataFileReader(f,
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val meta = Option(hdr.getMetaString("avro.codec")).getOrElse("null")
      hdr.close()
      val expectMeta = if (c == "zstd") "zstandard" else c
      assert(meta == expectMeta, s"container header codec: $meta vs $c")
      // compressed blocks sit between the same sync markers — the
      // byte-range split reader must fan out and still lose nothing
      val back = spark.read.format("graft-avro")
        .option(AvroDataSource.SplitBytesKey, 16384L)
        .load(s"$dir/c_$c")
      assert(c == "null" || back.rdd.getNumPartitions > 1,
        s"$c file should split (${back.rdd.getNumPartitions} parts)")
      assert(back.orderBy("l_orderkey", "l_linenumber").collect()
        .sameElements(want), s"codec $c round-trip mismatch")
    }
  }

  test("micro-batch stream: offsets track files, new batch reads only new files") {
    val d2 = s"$dir/stream"
    val df = graft.util.Canon.tbl(spark, sf, "nation")
    AvroUtil.write(df.repartition(2), d2)
    val schema = spark.read.format("graft-avro").load(d2).schema
    val stream = new graft.sources.avro.AvroMicroBatchStream(
      Seq(d2), None, schema, 1L << 20)
    val start = stream.initialOffset()
    val mid = stream.latestOffset()
    assert(stream.planInputPartitions(start, mid).length == 2,
      "first batch must cover both staged files")
    // a third file lands; the next batch must read ONLY it
    val extra = df.where(org.apache.spark.sql.functions.col("n_nationkey") < 3)
    AvroUtil.write(extra.coalesce(1), s"$dir/stream_extra")
    val src = new java.io.File(s"$dir/stream_extra").listFiles()
      .filter(_.getName.endsWith(".avro")).head
    java.nio.file.Files.copy(src.toPath,
      new java.io.File(d2, "part-late.avro").toPath)
    val end = stream.latestOffset()
    val fresh = stream.planInputPartitions(mid, end)
    assert(fresh.length == 1 &&
      fresh.head.asInstanceOf[graft.sources.avro.AvroInputPartition]
        .path.endsWith("part-late.avro"),
      s"incremental batch must be exactly the late file: ${fresh.toSeq}")
    // offset log round-trip: deserialize(json) is the identity
    assert(stream.deserializeOffset(mid.json()) == mid)
    assert(stream.deserializeOffset(start.json()) == start)
  }

  test("evolution resolution: alias renames, default fills, values match v1") {
    val got = SparkEntry.queries("scan_avro_evolution")(spark, sf).collect()
    val want = graft.util.Canon.tbl(spark, sf, "documents")
      .select(col("doc_id"), col("lang").as("language"), lit(0).as("quality"))
      .orderBy("doc_id").collect()
    assert(got.length == want.length && got.sameElements(want))
  }
}
