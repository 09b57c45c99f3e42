package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Round-5 verdict item 6 — the two fixed ADVICE findings that could
  * silently regress, encoded as properties:
  *  (a) the executor-side IVF top-2 centroid assignment (ivfTop2 UDF) must
  *      stay bit-identical to the driver-side twin (ivfTop2Local) — a
  *      divergence in summation order or tie-break surfaces as a
  *      missing-LUT runtime error in sim_ivfpq_ann;
  *  (b) hbucket must land in [0, m) for EVERY integer key, negatives
  *      included — both engines' `%` truncates toward zero, so an unfolded
  *      negative key yields a negative bucket that corrupts every
  *      sample/split consumer identically on both engines (invisible to
  *      the oracle; fn_hbucket_domain covers the cross-engine half).
  */
object AdviceProps extends Properties("advice") {

  // each case runs a (tiny) Spark job; 15 cases keep the suite fast while
  // still sweeping the tie-break and negative-key corners
  override def overrideParameters(p: org.scalacheck.Test.Parameters):
      org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(15)

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-4.0, 4.0).map(_.toFloat))

  property("ivfTop2 UDF ≡ ivfTop2Local on random vectors/centroids") =
    Prop.forAll(Gen.listOfN(5, vecGen), Gen.listOfN(6, vecGen)) { (vs, cs) =>
      val spark = TestSession.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val centroids = cs.map(_.map(_.toDouble).toArray).toArray
      val dim = 8
      val got = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray.toSeq) }
        .toDF("id", "emb")
        .select(col("id"), ops.TextDedup.ivfTop2(centroids, dim)(col("emb")).as("t2"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray)
        .toMap
      vs.zipWithIndex.forall { case (v, i) =>
        val want = ops.TextDedup.ivfTop2Local(v.map(_.toDouble).toArray, centroids)
        got(i.toLong).sameElements(want)
      }
    }

  property("hbucket ∈ [0, m) for any key, negatives included") =
    Prop.forAll(Gen.listOfN(64, Gen.choose(Long.MinValue / 4, Long.MaxValue / 4)),
        Gen.choose(2, 10000)) { (keys, m) =>
      val spark = TestSession.spark
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val buckets = keys.toDF("k")
        .select(ops.Pipeline.hbucket(col("k"), m).as("b"))
        .collect().map(_.getLong(0))
      buckets.forall(b => b >= 0 && b < m)
    }
}
