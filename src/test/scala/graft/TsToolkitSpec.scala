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
