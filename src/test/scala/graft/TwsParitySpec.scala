package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, Trigger, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Row types must be top-level for stable encoders. */
case class TwsSessEv(user_id: Long, tsm: java.sql.Timestamp, value: Double)
case class TwsSessOut(user_id: Long, start_ms: Long, end_ms: Long,
    n_events: Int, v_cents: Long)

/** Top-level (a suite-inner class would capture the non-serializable
  * AnyFunSuite as its outer pointer and fail closure cleaning). */
class TwsSessionizer extends StatefulProcessor[Long, TwsSessEv, TwsSessOut] {
  @transient private var st: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("n_batches",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[TwsSessEv],
      tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TwsSessOut] = {
    st.update((if (st.exists()) st.get() else 0L) + 1L) // exercise state
    val gapMs = 30L * 60 * 1000
    val evs = rows.toArray.sortBy(e => (e.tsm.getTime, e.value))
    if (evs.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[TwsSessOut]
      var start = evs(0).tsm.getTime; var last = start
      var n = 0; var cents = 0L
      for (e <- evs) {
        val ems = e.tsm.getTime
        if (ems - last >= gapMs) {
          out += TwsSessOut(key, start, last, n, cents)
          start = ems; n = 0; cents = 0L
        }
        last = ems; n += 1
        cents += math.floor(e.value * 100 + 0.5).toLong
      }
      out += TwsSessOut(key, start, last, n, cents)
      out.iterator
    }
  }
}

/** Spark-4 API parity (r12 verdict stretch item 8): the SAME 30-min-gap
  * sessionization implemented as a transformWithState StatefulProcessor
  * must emit row-for-row what the stable flatMapGroupsWithState contract
  * query (stream_stateful_session) emits on the same bounded replay — the
  * new arbitrary-state surface is pinned against the old one on real
  * semantics (splitting, exact cents, ordering ties), not just on a
  * running-total toy. State rides through a typed ValueState handle and
  * RocksDB (the provider the API requires), exercising the genuine state
  * path even though bounded replay delivers each key in one batch. */
class TwsParitySpec extends AnyFunSuite {
  import TestSession._

  test("transformWithState sessionization == flatMapGroupsWithState " +
      "on the same replay") {
    import spark.implicits._
    val expected = SparkEntry.queries("stream_stateful_session")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)

    val dir = "/tmp/graft_io/tws_parity_events"
    graft.util.Canon.events(spark, sf).withColumn("tsm", tsMsCol)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
        .select(col("user_id"), col("tsm"), col("value"))
        .as[TwsSessEv]
        .groupByKey(_.user_id)
        .transformWithState(new TwsSessionizer, TimeMode.None(), OutputMode.Append())
      val ckpt = s"/tmp/graft_io/tws_parity_ckpt_${System.nanoTime()}"
      val q = stream.toDF().writeStream.format("memory")
        .queryName("tws_parity")
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("tws_parity").collect().map(_.toSeq).toSet
      assert(got == expected,
        s"TWS/fMGWS divergence, e.g. ${got.diff(expected).take(2)} vs " +
          s"${expected.diff(got).take(2)}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.sql("DROP TABLE IF EXISTS tws_parity")
    }
  }

  private def tsMsCol = graft.util.Canon.tsMs(col("ts"))
}
