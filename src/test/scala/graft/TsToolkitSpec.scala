package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the gapfill/LOCF/interp chain (SURVEY §5.4). */
class TsToolkitSpec extends AnyFunSuite {
  import TestSession._

  private lazy val gap = SparkEntry.queries("ts_gapfill")(spark, sf).collect()
    .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
      if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))

  test("gapfill produces a dense hourly grid per key") {
    val byUser = gap.groupBy(_._1)
    for ((u, rows) <- byUser) {
      val ts = rows.map(_._2).sorted
      assert(ts.distinct.length == ts.length, s"user $u has duplicate buckets")
      val diffs = ts.sliding(2).collect { case Array(a, b) => b - a }.toSet
      assert(diffs.subsetOf(Set(3600000L)),
        s"user $u grid not hourly: steps $diffs")
    }
  }

  test("is_gap flag matches null v") {
    assert(gap.forall { case (_, _, v, g) => v.isEmpty == g })
  }

  test("ts_dtw_distance equals a plain-Scala DP recompute; DTW axioms hold") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("ts_dtw_distance")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // rebuild the exact 31-slot cent profiles independently
    val prof = graft.util.Canon.events(spark, sf)
      .select(col("user_id"), dayofmonth(col("ts")).as("dd"),
        graft.util.Canon.cents(col("value")).as("c"))
      .groupBy("user_id", "dd").agg(sum("c").as("v")).collect()
      .groupBy(_.getLong(0)).view.mapValues { rows =>
        val m = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
        Array.tabulate(31)(i => m.getOrElse(i + 1, 0L))
      }.toMap
    def dtw(a: Array[Long], b: Array[Long]): Long = {
      val big = Long.MaxValue / 4
      val dp = Array.fill(a.length + 1, b.length + 1)(big)
      dp(0)(0) = 0L
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
      dp(a.length)(b.length)
    }
    val cohort = prof.keys.toSeq.sorted.take(10)
    for (i <- cohort.indices; j <- i + 1 until cohort.length) {
      val (a, b) = (cohort(i), cohort(j))
      assert(got((a, b)) == dtw(prof(a), prof(b)),
        s"DTW mismatch for ($a, $b)")
    }
    assert(got.keys.size == cohort.length * (cohort.length - 1) / 2)
    // identity axiom on a self-pair (not emitted, but the DP must agree)
    assert(dtw(prof(cohort.head), prof(cohort.head)) == 0L)
  }

  test("locf equals a direct scan-forward recompute") {
    val expected: Map[(Long, Long), Option[Double]] =
      gap.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
        var last: Option[Double] = None
        rows.sortBy(_._2).map { case (_, b, v, _) =>
          if (v.isDefined) last = v
          ((u, b), last)
        }.toSeq
      }.toMap
    val got = SparkEntry.queries("ts_locf")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getTimestamp(1).getTime),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == expected.size)
    assert(expected.forall { case (k, v) => got(k) == v })
  }

  test("interpolation is exact at observations and bounded between them") {
    val obs = gap.collect { case (u, b, Some(v), _) => (u, b) -> v }.toMap
    val interp = SparkEntry.queries("ts_interp_linear")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getTimestamp(1).getTime),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // exact at observed slots
    assert(obs.forall { case (k, v) => interp(k).contains(v) })
    // interior gaps are filled with values inside the neighbors' range
    val byUser = gap.groupBy(_._1)
    for ((u, rows) <- byUser) {
      val sorted = rows.sortBy(_._2)
      val obsIdx = sorted.zipWithIndex.filter(_._1._3.isDefined).map(_._2)
      if (obsIdx.nonEmpty) {
        for (i <- obsIdx.head until obsIdx.last if sorted(i)._3.isEmpty) {
          val k = (u, sorted(i)._2)
          assert(interp(k).isDefined, s"interior gap not filled at $k")
          val prev = obsIdx.filter(_ < i).map(j => sorted(j)._3.get).last
          val next = obsIdx.filter(_ > i).map(j => sorted(j)._3.get).head
          val v = interp(k).get
          val (lo, hi) = (math.min(prev, next), math.max(prev, next))
          assert(v >= lo - 1e-4 && v <= hi + 1e-4,
            s"interp $v outside [$lo,$hi] at $k")
        }
      }
    }
  }
}

/** Edge-case properties of the Canon rounding primitives. */
class CanonSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._

  test("cents/r4 handle negatives and halves deterministically") {
    import spark.implicits._
    val vals = Seq(-2.675, -0.005, -0.0049, 0.0, 0.0049, 0.005, 2.675,
      1e9 + 0.005, -1e9 - 0.005)
    val got = vals.toDF("x")
      .select(graft.util.Canon.cents(col("x")).as("c"),
        graft.util.Canon.r4(col("x")).as("r"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = vals.map(v => (
      math.floor(v * 100 + 0.5).toLong,
      math.floor(v * 10000 + 0.5) / 10000.0))
    assert(got.toSeq == expected)
  }
}
