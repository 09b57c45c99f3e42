package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Semantic verification of the dataset-lifecycle tier (ops/Lifecycle.scala
  * and graph_assortativity) beyond the DuckDB hash-match: independent
  * plain-Scala recomputation of the snapshot diff, exact join cardinality,
  * Cohen's κ, the winsorized mean, the LSH S-curve sums, and the Newman
  * assortativity coefficient, each from the raw parquet rows. */
class LifecycleSpec extends AnyFunSuite {
  import TestSession._
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def norm(t: String): Array[String] =
    t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000.0

  private lazy val docs: Array[(Long, String, String, String, Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("pipeline_snapshot_diff: classes recomputed from raw rows") {
    val old = docs.filter(_._1 % 10 < 8)
      .map(t => t._1 -> (if (t._1 % 7 == 0) t._2 + " [v1]" else t._2)).toMap
    val nw = docs.filter(_._1 % 10 != 1).map(t => t._1 -> t._2).toMap
    val src = docs.map(t => t._1 -> t._4).toMap
    val ref = (old.keySet ++ nw.keySet).toSeq.map { id =>
      val st =
        if (!old.contains(id)) "added"
        else if (!nw.contains(id)) "removed"
        else if (old(id) != nw(id)) "changed"
        else "unchanged"
      (src(id), st)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("pipeline_snapshot_diff").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === ref)
    // every class the derivation can produce is present somewhere
    assert(got.keys.map(_._2).toSet === Set("added", "removed", "changed",
      "unchanged"))
  }

  test("pipeline_incremental_agg: merge equals full recompute everywhere") {
    val rows = q("pipeline_incremental_agg").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(4)),
      "a merged partial-aggregate group diverged from the full recompute")
  }

  test("agg_join_size_audit: exact cardinality from raw key counts") {
    val lk = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ok = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val matchKeys = lk.keySet.intersect(ok.keySet)
    val joinRows = matchKeys.toSeq.map(k => lk(k) * ok(k)).sum
    val r = q("agg_join_size_audit").collect().head
    assert(r.getLong(0) === lk.size.toLong)
    assert(r.getLong(1) === ok.size.toLong)
    assert(r.getLong(2) === matchKeys.size.toLong)
    assert(r.getLong(3) === joinRows)
    assert(r.getLong(4) === matchKeys.toSeq.map(k => lk(k) * ok(k)).max)
  }

  test("agg_rater_agreement: Cohen's kappa recomputed") {
    val cells = docs.map { t =>
      (if (t._5 >= 240) 1 else 0, if (norm(t._2).length >= 40) 1 else 0)
    }
    val n = cells.length.toDouble
    val n11 = cells.count(_ == (1, 1)).toDouble
    val n10 = cells.count(_ == (1, 0)).toDouble
    val n01 = cells.count(_ == (0, 1)).toDouble
    val n00 = cells.count(_ == (0, 0)).toDouble
    val po = (n11 + n00) / n
    val pa = (n11 + n10) / n
    val pb = (n11 + n01) / n
    val pe = pa * pb + (1.0 - pa) * (1.0 - pb)
    val r = q("agg_rater_agreement").collect().head
    assert(r.getLong(0) === cells.length.toLong)
    assert(r.getLong(1) === n11.toLong && r.getLong(4) === n00.toLong)
    if (pe < 1.0) assert(r.getDouble(5) === r4((po - pe) / (1.0 - pe)))
    // kappa never exceeds 1 and the confusion cells tile the corpus
    assert(r.getDouble(5) <= 1.0)
  }

  test("agg_winsorize: clamped mean recomputed per source") {
    val bySrc = docs.groupBy(_._4)
    val got = q("agg_winsorize").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === bySrc.keySet)
    for ((srcName, rows) <- bySrc) {
      val xs = rows.map(_._5).sorted
      val nD = xs.length
      def disc(p: Double): Long = xs(math.ceil(p * nD).toInt - 1)
      val lo = disc(0.05)
      val hi = disc(0.95)
      val w = rows.map(t => math.min(math.max(t._5, lo), hi))
      val r = got(srcName)
      assert(r.getLong(2) === lo, s"$srcName p05")
      assert(r.getLong(3) === hi, s"$srcName p95")
      assert(r.getDouble(4) === r4(w.sum.toDouble / nD.toDouble))
      assert(r.getLong(5) === rows.count(_._5 < lo).toLong)
      assert(r.getLong(6) === rows.count(_._5 > hi).toLong)
    }
  }

  test("dedup_lsh_tuning: S-curve sums recomputed with identical IEEE shapes") {
    val sub = docs.filter(_._1 < 60)
      .map(t => t._1 -> norm(t._2).distinct.toSet)
    val sims = for {
      (ida, sa) <- sub; (idb, sb) <- sub
      if ida < idb
      inter = sa.intersect(sb).size.toLong
      if inter > 0
    } yield inter.toDouble / (sa.size + sb.size - inter).toDouble
    def chain(x: Double, k: Int): Double = k match {
      case 1 => x
      case 2 => x * x
      case 4 => (x * x) * (x * x)
      case 8 => ((x * x) * (x * x)) * ((x * x) * (x * x))
      case 16 =>
        (((x * x) * (x * x)) * ((x * x) * (x * x))) *
          (((x * x) * (x * x)) * ((x * x) * (x * x)))
    }
    val got = q("dedup_lsh_tuning").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet === Set((2, 8), (4, 4), (8, 2), (16, 1)))
    for (((b, r), (nCand, nTrue, expT, expF)) <- got) {
      def pe(s: Double): Long = {
        val v = 1.0 - chain(s, r)
        math.floor((1.0 - chain(v, b)) * 1000000000L + 0.5).toLong
      }
      assert(nCand === sims.size.toLong)
      assert(nTrue === sims.count(_ >= 0.8).toLong)
      assert(expT === sims.filter(_ >= 0.8).map(pe).sum)
      assert(expF === sims.filter(_ < 0.8).map(pe).sum)
    }
    // more rows per band = sharper curve = less false-positive mass
    val byR = got.toSeq.sortBy(_._1._2).map(_._2._4)
    assert(byR === byR.sorted.reverse || byR.distinct.size <= 1)
  }

  test("pipeline_quota_sample: Hamilton apportionment sums exactly to budget") {
    val bySrc = docs.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val rows = q("pipeline_quota_sample").collect()
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    assert(rows.map(_.getLong(2)).sum === 1000L,
      "allocations must sum exactly to the budget")
    val t = bySrc.values.sum
    for (r <- rows) {
      val n = bySrc(r.getString(0))
      val base = 1000L * n / t
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === base || r.getLong(2) === base + 1L,
        s"${r.getString(0)}: alloc must be base or base+1")
    }
    // facade ≡ registry
    val viaApi = graft.api.Graft.quotaSample(
      spark.read.parquet(s"$sf/documents.parquet"), "source", 1000L)
      .collect().map(_.toString)
    assert(viaApi sameElements rows.map(_.toString))
  }

  test("agg_k_anonymity: recomputed from raw rows") {
    val groups = docs.groupBy(t => (t._3, t._4, t._5 / 100))
      .view.mapValues(_.size.toLong).toMap
    val r = q("agg_k_anonymity").collect().head
    assert(r.getLong(0) === groups.size.toLong)
    assert(r.getLong(1) === docs.length.toLong)
    assert(r.getLong(2) === groups.values.count(_ < 5).toLong)
    val atRisk = groups.values.filter(_ < 5).sum
    assert(r.getLong(3) === atRisk)
    assert(r.getLong(4) === groups.values.min)
    assert(r.getDouble(5) === r4(atRisk.toDouble / docs.length.toDouble))
  }

  test("cdc_apply_deletes: tombstoned keys vanish, survivors recomputed") {
    val ev = graft.util.Canon.events(spark, sf)
      .select("user_id", "event_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getTimestamp(4).getTime))
    val byUser = ev.groupBy(_._1)
    val ref = byUser.flatMap { case (u, rows) =>
      val last = rows.maxBy(t => (t._5, t._2))
      if (last._3 == "error") None
      else Some(u -> (last._2, math.floor(last._4 * 100 + 0.5).toLong,
        rows.length.toLong, rows.count(_._3 == "error").toLong))
    }
    val got = q("cdc_apply_deletes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5))).toMap
    assert(got === ref)
    // at least one key must actually be tombstoned on the fixture
    assert(got.keySet.size < byUser.size)
  }

  test("win_gaps_islands: consecutive-day runs recomputed") {
    val days = graft.util.Canon.events(spark, sf)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 86400000L))
      .distinct
    val ref = days.groupBy(_._1).map { case (u, ds) =>
      val sortedD = ds.map(_._2).sorted
      val islands = sortedD.foldLeft(List.empty[List[Long]]) {
        case (acc, dayN) => acc match {
          case (h :: t) :: rest if dayN == h + 1 => (dayN :: h :: t) :: rest
          case _ => List(dayN) :: acc
        }
      }
      u -> (sortedD.length.toLong, islands.length.toLong,
        islands.map(_.length).max.toLong, sortedD.head)
    }
    val got = q("win_gaps_islands").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got === ref)
  }

  test("agg_benford_audit: first digits recomputed from exact cents") {
    val totals = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val digits = totals.map(v =>
      math.floor(v * 100 + 0.5).toLong.toString.substring(0, 1))
    val ref = digits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("agg_benford_audit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === ref)
    val shares = q("agg_benford_audit").collect().map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 0.001)
  }

  test("pipeline_profile_columns: o_orderstatus profile recomputed") {
    val st = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderstatus").collect().map(_.getString(0))
    val byV = st.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("pipeline_profile_columns").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("o_orderstatus", "o_orderpriority",
      "o_orderkey", "o_custkey"))
    val r = got("o_orderstatus")
    assert(r.getLong(1) === st.length.toLong)
    assert(r.getLong(2) === byV.size.toLong)
    assert(r.getLong(3) === 0L)
    val top = byV.toSeq.sortBy(t => (-t._2, t._1)).head
    assert(r.getString(4) === top._1 && r.getLong(5) === top._2)
    // the key column profiles as all-distinct
    assert(got("o_orderkey").getLong(2) === st.length.toLong)
  }

  test("scd2_point_in_time: exactly one live version per key at the cut") {
    val rows = q("scd2_point_in_time").collect()
    assert(rows.nonEmpty)
    val cut = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) == cut))
    // one row per (user, type) key — the defining snapshot property
    val keys = rows.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    // consistency with the full interval table: the snapshot picks the
    // interval covering the cut
    val iv = q("scd2_intervals").collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(3),
        if (r.isNullAt(4)) Long.MaxValue else r.getLong(4),
        r.getInt(6).toLong))
    val expect = iv.filter(t => t._2 <= cut && t._3 > cut)
      .map(t => t._1 -> t._4).toMap
    val got = rows.map(r => (r.getLong(0), r.getString(1)) ->
      r.getInt(3).toLong).toMap
    assert(got === expect)
  }

  test("embed_norm_stats: norms recomputed from raw embeddings") {
    val raw = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val ref = raw.groupBy(_._1).map { case (lbl, rows) =>
      val norms = rows.map { case (_, v) =>
        val ss = v.map(x =>
          math.floor(x.toDouble * 10000 + 0.5).toLong).map(s => s * s).sum
        math.floor(math.sqrt(ss.toDouble) + 0.5).toLong
      }
      lbl -> (rows.length.toLong, rows.map(_._2.length.toLong).min,
        norms.sum)
    }
    val got = q("embed_norm_stats").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet === ref.keySet)
    for ((lbl, (n, dmin, nsum)) <- ref) {
      val r = got(lbl)
      assert(r.getLong(1) === n && r.getLong(2) === dmin)
      assert(r.getDouble(4) ===
        math.floor(nsum.toDouble / n.toDouble / 1e4 * 10000 + 0.5) / 10000.0)
    }
  }

  test("agg_theil_inequality: recomputed with scaled-integer ln; T >= 0") {
    def li6(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val ref = docs.groupBy(_._4).map { case (srcName, rows) =>
      val xs = rows.map(_._5).filter(_ > 0)
      val n = xs.length.toLong
      val sx = xs.sum
      val sxl = xs.map(x => x * li6(x.toDouble)).sum
      val t = sxl.toDouble / sx.toDouble / 1e6 -
        (li6(sx.toDouble) - li6(n.toDouble)).toDouble / 1e6
      srcName -> (n, sx, r4(t))
    }
    val got = q("agg_theil_inequality").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got === ref)
    // Jensen: Theil T is non-negative (allow scaled-rounding slack)
    assert(got.values.forall(_._3 >= -1e-4))
  }

  test("drift trio: PSI / JSD / Cramér's V recomputed from raw rows") {
    def li6(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong

    // PSI over fixed-width length buckets of the doc_id-parity halves
    val bucketed = docs.map(t => (math.min(t._5 / 100, 9L), t._1 % 2 == 0))
    val byB = bucketed.groupBy(_._1).view.mapValues { rs =>
      (rs.count(_._2).toLong, rs.count(!_._2).toLong)
    }.toMap
    val tr = byB.values.map(_._1).sum; val tc = byB.values.map(_._2).sum
    val used = byB.values.filter(v => v._1 > 0 && v._2 > 0)
    val psiRef = r4(used.map { case (nr, nc) =>
      (nr * tc - nc * tr) * li6((nr * tc).toDouble / (nc * tr).toDouble)
    }.sum.toDouble / (tr * tc).toDouble / 1e6)
    val psiRow = q("agg_psi_drift").collect().head
    assert((psiRow.getLong(0), psiRow.getLong(1)) == (tr, tc))
    assert(psiRow.getLong(2) == used.size.toLong)
    assert(psiRow.getDouble(4) == psiRef)
    assert(psiRef >= -1e-4) // PSI is a sum of (p-q)ln(p/q) terms, each >= 0

    // JSD over the lang mix of the same halves; bounded by ln 2
    val byL = docs.groupBy(_._3).view.mapValues { rs =>
      (rs.count(_._1 % 2 == 0).toLong, rs.count(_._1 % 2 != 0).toLong)
    }.toMap
    val ta = byL.values.map(_._1).sum; val tb = byL.values.map(_._2).sum
    val sp = byL.values.map { case (a, _) =>
      if (a > 0) a * li6(a.toDouble / ta.toDouble) else 0L }.sum
    val sq = byL.values.map { case (_, b) =>
      if (b > 0) b * li6(b.toDouble / tb.toDouble) else 0L }.sum
    val sm = byL.values.map { case (a, b) =>
      (a * tb + b * ta) *
        li6((a * tb + b * ta).toDouble / (2.0 * ta * tb)) }.sum
    val jsdRef = r4(
      (-sm.toDouble / (2L * ta * tb).toDouble / 1e6) -
        ((-sp.toDouble / ta.toDouble / 1e6) +
          (-sq.toDouble / tb.toDouble / 1e6)) / 2.0)
    val jsdRow = q("agg_js_divergence").collect().head
    assert(jsdRow.getDouble(3) == jsdRef)
    assert(jsdRef >= -1e-4 && jsdRef <= math.log(2.0) + 1e-4)

    // Cramér's V from the χ² row the oracle already hash-checks; in [0,1]
    val vRow = q("agg_cramers_v").collect().head
    val chi = q("agg_chi2_independence").collect().head
    assert(vRow.getLong(0) == chi.getLong(0) && vRow.getLong(1) == chi.getLong(1))
    val k = vRow.getLong(2)
    val vRef = r4(math.sqrt(
      (chi.getLong(2).toDouble / 1e6) / (chi.getLong(0) * k).toDouble))
    assert(vRow.getDouble(3) == vRef)
    assert(vRef >= 0.0 && vRef <= 1.0 + 1e-4)
  }

  test("drift scores: identity ⇒ 0, disjoint mixes ⇒ ln 2, PSI quantile sane") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // identical cohorts: every bucket has nr == nc, all terms are ln(1)=0
    val same = (0L until 200L).flatMap(i => Seq((i % 7, true), (i % 7, false)))
      .toDF("bucket", "is_ref")
    val psi0 = graft.ops.Lifecycle.psiDriftCore(same).collect().head
    assert(psi0.getDouble(4) == 0.0 && psi0.getLong(3) == 0L)
    val js0 = graft.ops.Lifecycle.jsDivergenceCore(
      same.withColumnRenamed("bucket", "cat")).collect().head
    assert(js0.getDouble(3) == 0.0)
    // fully disjoint categorical mixes: JSD attains its ln 2 upper bound
    val disjoint = ((0L until 100L).map(i => (s"a${i % 3}", true)) ++
      (0L until 100L).map(i => (s"b${i % 4}", false))).toDF("cat", "is_ref")
    val jsMax = graft.ops.Lifecycle.jsDivergenceCore(disjoint).collect().head
    assert(math.abs(jsMax.getDouble(3) - math.log(2.0)) < 2e-4,
      s"disjoint JSD ${jsMax.getDouble(3)} != ln2")
    // disjoint PSI: every bucket one-sided -> audit row still emitted,
    // zero used buckets, NULL psi, all 7 buckets reported dropped
    val psiD = graft.ops.Lifecycle.psiDriftCore(
      disjoint.withColumnRenamed("cat", "bucket")).collect().head
    assert(psiD.getLong(2) == 0L && psiD.getLong(3) == 7L && psiD.isNullAt(4))
    // quantile PSI on the fixture: the reference cohort is bucketed by its
    // OWN deciles, so its occupancy is near-uniform and psi stays finite
    val pq = SparkEntry.queries("agg_psi_drift_quantile")(spark, sf)
      .collect().head
    assert(pq.getLong(2) >= 8L, s"deciles should yield >=8 two-sided buckets")
    assert(pq.getDouble(4) >= -1e-4)
  }

  test("pipeline_incremental_join merges exactly; label vote majority holds") {
    val ij = q("pipeline_incremental_join").collect()
    assert(ij.nonEmpty && ij.forall(_.getBoolean(3)),
      "delta-join merge must equal the full recompute on every status")

    val lv = q("pipeline_label_vote").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(lv.keySet == Set("len_240", "tok_40", "ttr_50"))
    // recompute one labeler end-to-end from raw rows
    val flags = docs.map { t =>
      val tk = norm(t._2)
      val la = t._5 >= 240
      val lb = tk.length >= 40
      val lc = tk.distinct.length.toLong * 2 >= tk.length.toLong
      (la, lb, lc, Seq(la, lb, lc).count(identity) >= 2)
    }
    val n = flags.length.toLong
    val ref = Map(
      "len_240" -> flags.map(f => (f._1, f._4)),
      "tok_40" -> flags.map(f => (f._2, f._4)),
      "ttr_50" -> flags.map(f => (f._3, f._4)))
    for ((name, fs) <- ref) {
      val pos = fs.count(_._1).toLong
      val agree = fs.count(f => f._1 == f._2).toLong
      assert(lv(name) == (n, pos, agree, r4(agree.toDouble / n.toDouble)),
        s"labeler $name")
    }
  }

  test("review-finding regressions: nulls, ragged vectors, partial labels") {
    import spark.implicits._
    // snapshotDiff: payload changing to NULL is a CHANGE, not "unchanged"
    val oldG = Seq((1L, "s", Option("a"), 1L), (2L, "s", Option("b"), 1L))
      .toDF("id", "source", "payload", "weight")
    val newG = Seq((1L, "s", Option.empty[String], 1L),
      (2L, "s", Option("b"), 1L)).toDF("id", "source", "payload", "weight")
    val sd = graft.api.Graft.snapshotDiff(oldG, newG, "id", "source",
      "payload", "weight").collect().map(r => r.getString(1) -> r.getLong(2))
      .toMap
    assert(sd === Map("changed" -> 1L, "unchanged" -> 1L))

    // joinSizeAudit: NULL keys never match — excluded from key counts
    val lNull = Seq(Option(1L), None, Option(1L)).toDF("k")
    val rNull = Seq(Option(1L), Option(3L)).toDF("k")
    val js = graft.api.Graft.joinSizeAudit(lNull, "k", rNull, "k")
      .collect().head
    assert(js.getLong(0) === 1L && js.getLong(1) === 2L)
    assert(js.getLong(2) === 1L && js.getLong(3) === 2L)

    // raterAgreement: rows with a NULL label are excluded from n too
    val rdf = Seq((Option(true), Option(true)), (None, Option(false)),
      (Option(false), Option(false))).toDF("a", "b")
    val ra = graft.api.Graft.raterAgreement(rdf, col("a"), col("b"))
      .collect().head
    assert(ra.getLong(0) === 2L)
    assert(ra.getDouble(5) === 1.0) // perfect agreement on surviving rows

    // profiler: an all-NULL column still appears, with a NULL top value
    val pdf = Seq((Option("x"), Option.empty[String]),
      (Option("x"), Option.empty[String])).toDF("c1", "c2")
    val prof = graft.ops.Lifecycle.profileCore(pdf, Seq("c1", "c2"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet === Set("c1", "c2"))
    assert(prof("c2").getLong(3) === 2L && prof("c2").isNullAt(4))
    assert(prof("c1").getString(4) === "x")

    // modularity: partial labels audit the labeled subgraph consistently
    val pe = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val pl = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "lbl")
    val pm = graft.api.Graft.modularity(pe, "a", "b", pl, "node", "lbl")
      .collect().head
    assert(pm.getLong(1) === 3L, "only both-endpoints-labeled edges count")
    assert(pm.getLong(2) === 3L)
    assert(pm.getDouble(3) === 0.0) // one community covering the whole subgraph

    // covariance: null vectors are skipped; ragged dimensions fail fast
    val cdf = Seq(Option(Seq(1.0f, 2.0f)), None, Option(Seq(3.0f, 4.0f)))
      .toDF("embedding")
    val cm = graft.ops.Curation.covCore(cdf).collect()
    assert(cm.nonEmpty && cm.forall(_.getLong(3) == 2L),
      "null vector must be excluded from n")
    val ragged = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("embedding")
    val ex = intercept[Exception] {
      graft.ops.Curation.covCore(ragged).collect()
    }
    assert(ex.getMessage != null)
  }

  test("graph_assortativity: Newman r recomputed on a synthetic graph") {
    import spark.implicits._
    // star(0;1..4) + path 5-6-7 + triangle 8-9-10: mixed degree profile
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L),
      (6L, 7L), (8L, 9L), (9L, 10L), (8L, 10L)).toDF("a", "b")
    val r = graft.ops.Graph.assortativityCore(edges).collect().head
    assert(r.getLong(0) === 11L && r.getLong(1) === 9L)
    // independent recompute over the symmetric closure
    val sym = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L),
      (6L, 7L), (8L, 9L), (9L, 10L), (8L, 10L)).flatMap {
      case (a, b) => Seq((a, b), (b, a))
    }
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = sym.map { case (a, _) => deg(a) }
    val ys = sym.map { case (_, b) => deg(b) }
    val m = sym.size.toLong
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val num = (m * sxy - sx * sy).toDouble
    val den = math.sqrt((m * sxx - sx * sx).toDouble * (m * syy - sy * sy).toDouble)
    assert(r.getDouble(2) === r4(num / den))
    // a star is maximally disassortative; the mix must land strictly inside
    assert(r.getDouble(2) > -1.0 && r.getDouble(2) < 1.0)
  }

  test("graph_assortativity: empty graph yields a single null-coefficient row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val rows = graft.ops.Graph.assortativityCore(empty).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 0L && rows.head.getLong(1) === 0L)
    assert(rows.head.isNullAt(2))
  }

  /** ×2-scaled average rank per distinct value (tie group at min-rank m of
    * size t → 2·avg = 2m + t − 1), the shared arithmetic of the two rank
    * tests below. */
  private def avgRank2(vals: Seq[Long]): Map[Long, Long] = {
    val cnt = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    cnt.keys.toSeq.sorted.map { v =>
      val nt = cnt(v); val a = 2 * cum + nt + 1; cum += nt; v -> a
    }.toMap
  }

  test("agg_mannwhitney_u: exact rank recomputation from raw rows") {
    val sel = docs.filter(t => t._3 == "en" || t._3 == "fr")
      .map(t => (t._3 == "en", t._5))
    val ar = avgRank2(sel.toSeq.map(_._2))
    val n1 = sel.count(_._1).toLong
    val n2 = sel.length.toLong - n1
    val r1x2 = sel.filter(_._1).map(t => ar(t._2)).sum
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val u2x2 = 2 * n1 * n2 - u1x2
    val tie = sel.map(_._2).groupBy(identity).values
      .map { g => val t = g.size.toLong; t * t * t - t }.sum
    val r = q("agg_mannwhitney_u").head()
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getLong(2) == u1x2 && r.getLong(3) == u2x2)
    assert(r.getLong(4) == tie)
    val n = n1 + n2
    val z = (u1x2 - n1 * n2).toDouble /
      (2.0 * math.sqrt(n1.toDouble * n2.toDouble *
        ((n + 1).toDouble - tie.toDouble / (n.toDouble * (n - 1).toDouble)) /
        12.0))
    assert(math.abs(r.getDouble(5) - r4(z)) < 1e-12)
  }

  test("agg_spearman_corr: exact rank moments per lang from raw rows") {
    val out = q("agg_spearman_corr").collect()
      .map(r => r.getString(0) -> r).toMap
    val byLang = docs.groupBy(_._3)
    assert(out.keySet == byLang.keySet)
    for ((lang, ds) <- byLang) {
      val ys = ds.map(t => norm(t._2).length.toLong)
      val rx = avgRank2(ds.toSeq.map(_._5))
      val ry = avgRank2(ys.toSeq)
      val n = ds.length.toLong
      // centered ×2-scaled deviations: the ×2 rank mean is n+1
      val prs = ds.map(_._5).map(rx(_) - n - 1).zip(ys.map(ry(_) - n - 1))
      val num = prs.map(p => p._1 * p._2).sum
      val row = out(lang)
      assert(row.getLong(1) == n && row.getLong(2) == num)
      val d1 = prs.map(p => p._1 * p._1).sum
      val d2 = prs.map(p => p._2 * p._2).sum
      // centered ranks fold to zero — structural identity of avg ranks
      assert(prs.map(_._1).sum == 0L && prs.map(_._2).sum == 0L)
      if (d1 > 0 && d2 > 0)
        assert(math.abs(row.getDouble(3) -
          r4(num.toDouble / math.sqrt(d1.toDouble * d2.toDouble))) < 1e-12)
      else assert(row.isNullAt(3))
    }
  }

  test("pipeline_constraint_audit: seeded violations are counted exactly " +
      "and the clean fixture passes every constraint") {
    // clean fixture: all 10 constraints pass
    val clean = SparkEntry.queries("pipeline_constraint_audit")(spark, sf)
      .collect()
    assert(clean.length == 10)
    assert(clean.forall(_.getAs[Boolean]("pass")),
      s"clean fixture must pass: ${clean.mkString(";")}")
    // corrupted frames: every constraint family must count its violations
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val liSch = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_quantity", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_shipdate", DateType)))
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val li = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10.0, 0.05, 100.0, d0),         // clean
        Row(1L, 0.0, 0.05, 100.0, d0),          // qty out of range
        Row(1L, 51.0, 0.20, 100.0, d0),         // qty AND discount bad
        Row(99L, 10.0, 0.05, 0.0, null),        // price, shipdate, dangling fk
        Row(2L, 10.0, -0.01, 100.0, d0))), liSch) // discount negative
    val ordSch = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    val ord = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 7L, "O", 10.0),                 // clean
        Row(1L, 7L, "F", 10.0),                 // duplicate orderkey
        Row(2L, null, "X", -5.0),               // null fk, bad status, bad total
        Row(3L, 8L, "P", 10.0))), ordSch)       // custkey 8 dangling
    val cust = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L))),
      StructType(Seq(StructField("c_custkey", LongType))))
    val got = graft.ops.Lifecycle.constraintAuditCore(li, ord, cust)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("lineitem_quantity_1_50") == (5L, 2L))
    assert(got("lineitem_discount_0_10pct") == (5L, 2L))
    assert(got("lineitem_extendedprice_positive") == (5L, 1L))
    assert(got("lineitem_shipdate_complete") == (5L, 1L))
    assert(got("orders_custkey_complete") == (4L, 1L))
    assert(got("orders_orderkey_unique") == (4L, 1L))
    assert(got("orders_status_in_OFP") == (4L, 1L))
    assert(got("orders_totalprice_positive") == (4L, 1L))
    assert(got("lineitem_orderkey_in_orders") == (5L, 1L))  // key 99
    // dangling custkey 8 + NULL custkey both fail containment
    assert(got("orders_custkey_in_customer") == (4L, 2L))
    // empty corpus: every constraint audits as 0 checked / 0 violations /
    // pass (sum() over empty is NULL on both engines — coalesced)
    val empty = graft.ops.Lifecycle.constraintAuditCore(
      li.limit(0), ord.limit(0), cust.limit(0)).collect()
    assert(empty.length == 10)
    assert(empty.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getAs[Boolean]("pass")), s"empty-corpus audit: ${empty.mkString(";")}")
  }
}
