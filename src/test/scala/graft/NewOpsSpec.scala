package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic properties of the round-6 additions that the oracle hash-match
  * can't express: value bounds, invariances, and the statistical tilt each
  * op exists to produce. */
class NewOpsSpec extends AnyFunSuite {
  import TestSession._
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("win_rn_decomposed core: NULL-user partition numbered like any other") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2 users (one NULL) × 2 buckets × 2 rows — the decomposed numbering
    // must equal the plain per-key row_number INCLUDING the null key (a
    // plain equi-join on user_id would silently drop it)
    val ev = Seq(
      (Some(1L), 10L, 100L, 0L), (Some(1L), 11L, 200L, 0L),
      (Some(1L), 12L, 300L, 1L), (None, 20L, 100L, 0L),
      (None, 21L, 250L, 1L), (None, 22L, 300L, 1L))
      .toDF("user_id", "event_id", "tsm", "b")
    val got = graft.ops.Windows.rnDecomposedCore(ev).collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2))).toSet
    val want = Set(
      (Some(1L), 12L, 1L), (Some(1L), 11L, 2L), (Some(1L), 10L, 3L),
      (None, 22L, 1L), (None, 21L, 2L), (None, 20L, 3L))
      .map { case (u, e, r) => (u.map(_.asInstanceOf[Any]), e, r) }
    assert(got == want, s"got $got")
  }

  test("agg_ks_drift: matches a plain-Scala exact KS over the same bins") {
    val r = q("agg_ks_drift").head()
    val (na, nb, ksS, ks) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))
    assert(ks >= 0.0 && ks <= 1.0)
    // ks is the r4 display of the exact rational num/(na*nb); ks_scaled is
    // its floor at 1e6 — they must agree within their rounding grids
    assert(math.abs(ks - ksS.toDouble / 1e6) <= 1e-4 + 1e-6)
    // independent recompute: cents-binned ECDFs in plain Scala
    val vals = graft.util.Canon.events(spark, sf)
      .where(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase"), col("value")).collect()
      .map(r => (r.getBoolean(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val (a, b) = vals.partition(_._1)
    assert(a.length.toLong == na && b.length.toLong == nb)
    val bins = vals.map(_._2).distinct.sorted
    var (ca, cb, best) = (0L, 0L, 0L)
    val aByBin = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bByBin = b.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    bins.foreach { bin =>
      ca += aByBin.getOrElse(bin, 0L); cb += bByBin.getOrElse(bin, 0L)
      best = math.max(best, math.abs(ca * nb - cb * na))
    }
    assert(ksS == 1000000L * best / (na * nb),
      s"scala KS ${1000000L * best / (na * nb)} vs op $ksS")
  }

  test("dedup_containment: threshold exact, containment recomputed") {
    val rows = q("dedup_containment").collect()
    assert(rows.nonEmpty)
    // independent token sets from the raw table
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 60).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ")
          .split(" ", -1).toSet).toMap
    rows.foreach { r =>
      val (da, db, inter, nMin) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      val exact = (sets(da) & sets(db)).size.toLong
      assert(inter == exact, s"pair ($da,$db): inter $inter != $exact")
      assert(nMin == math.min(sets(da).size, sets(db).size))
      assert(inter * 10 >= nMin * 9, "threshold violated")
      assert(math.abs(r.getDouble(4) - inter.toDouble / nMin) <= 5e-5)
    }
    // every exact-Jaccard dup pair is necessarily a containment pair at
    // the lower J=0.8 bar only when sizes are equal; but C >= J always,
    // so any jaccard pair at >= 0.9 must appear here
    val jacc = q("dedup_ngram_jaccard").collect()
      .filter(_.getDouble(3) >= 0.9).map(r => (r.getLong(0), r.getLong(1)))
    val have = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    jacc.foreach(p => assert(have.contains(p), s"missing jaccard pair $p"))
  }

  test("agg_chi2_independence: matches a plain-Scala chi-squared") {
    val r = q("agg_chi2_independence").head()
    val (n, dof, chi2s) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    val langs = docs.map(_._1).distinct.sorted
    val srcs = docs.map(_._2).distinct.sorted
    assert(n == docs.length.toLong)
    assert(dof == (langs.length - 1).toLong * (srcs.length - 1))
    val obs = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = (for { l <- langs; s0 <- srcs } yield {
      val o = obs.getOrElse((l, s0), 0L)
      val d = (n * o - rt(l) * ct(s0)).toDouble
      math.floor(d * d / (n * rt(l) * ct(s0)).toDouble * 1e6 + 0.5).toLong
    }).sum
    assert(chi2s == expect, s"op $chi2s vs scala $expect")
  }

  test("agg_gini_concentration: bounds hold and one source recomputes") {
    val rows = q("agg_gini_concentration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getDouble(4)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
    val src = rows.head.getString(0)
    val cs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("source") === src).select("n_chars").collect()
      .map(_.getLong(0)).sorted
    val nd = cs.length.toLong
    val num = cs.zipWithIndex
      .map { case (c, i) => (2L * (i + 1) - nd - 1) * c }.sum
    assert(rows.head.getLong(3) == 1000000L * num / (nd * cs.sum))
  }

  test("agg_entropy_balance: plain-Scala recompute; evenness bounded") {
    val rows = q("agg_entropy_balance").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("lang", "source"))
    rows.foreach { r =>
      val (axis, n, k, h) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-4,
        s"$axis entropy above ln(k): $r")
      if (!r.isNullAt(4)) {
        val ev = r.getDouble(4)
        assert(ev >= 0.0 && ev <= 1.0 + 1e-4, s"$axis evenness range: $r")
      }
      // independent recompute of the scaled-integer weighted sum
      val cs = spark.read.parquet(s"$sf/documents.parquet")
        .groupBy(axis).count().collect().map(_.getLong(1))
      assert(k == cs.length.toLong && n == cs.sum)
      val si = cs.map(c =>
        c * math.floor(math.log(n.toDouble / c) * 1e6 + 0.5).toLong).sum
      val exp = math.floor(si.toDouble / n / 1e6 * 10000 + 0.5) / 10000
      assert(h == exp, s"$axis: op $h vs scala $exp")
    }
  }

  test("agg_mutual_information: plain-Scala recompute; bounds hold") {
    val r = q("agg_mutual_information").head()
    val (n, mi) = (r.getLong(0), r.getDouble(1))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(n == docs.length.toLong)
    val obs = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val si = obs.map { case ((l, s0), o) =>
      o * math.floor(math.log((n * o).toDouble / (rt(l) * ct(s0))) * 1e6
        + 0.5).toLong
    }.sum
    val exp = math.floor(si.toDouble / n / 1e6 * 1e4 + 0.5) / 1e4
    assert(mi == exp, s"op $mi vs scala $exp")
    // I <= min(H(x), H(y)); normalized coefficient in [0, 1]
    if (!r.isNullAt(2)) {
      val miN = r.getDouble(2)
      assert(miN >= -1e-4 && miN <= 1.0 + 1e-4, s"mi_norm out of range: $r")
    }
  }

  test("pipeline_token_budget: per-lang prefix under budget, nothing skipped") {
    val rows = q("pipeline_token_budget").collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    byLang.foreach { case (lang, sel) =>
      // budget respected and cum_tok consistent with the tok column
      val ordered = sel.sortBy(_.getAs[Long]("cum_tok"))
      var run = 0L
      ordered.foreach { r =>
        run += r.getAs[Long]("tok")
        assert(r.getAs[Long]("cum_tok") == run)
      }
      assert(run <= 10000L)
      // prefix property: selected docs are exactly the top-|sel| by
      // (n_chars desc, doc_id) for the lang
      val want = docs.filter(_._1 == lang).sortBy(t => (-t._3, t._2))
        .take(sel.length).map(_._2).toSet
      assert(sel.map(_.getAs[Long]("doc_id")).toSet == want)
    }
  }

  test("text_source_similarity: all pairs present, one pair recomputed") {
    val rows = q("text_source_similarity").collect()
    val srcs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().collect().map(_.getString(0))
    assert(rows.length == srcs.length * (srcs.length - 1) / 2,
      s"${rows.length} pairs for ${srcs.length} sources")
    val (sa, sb) = (rows.head.getString(0), rows.head.getString(1))
    def vocab(s0: String) = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("source") === s0)
      .select(explode(split(regexp_replace(lower(trim(col("text"))),
        "\\s+", " "), " ")).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    val (va, vb) = (vocab(sa), vocab(sb))
    assert(rows.head.getLong(2) == (va & vb).size.toLong)
    assert(rows.head.getLong(3) == va.size.toLong)
    assert(rows.head.getLong(4) == vb.size.toLong)
  }

  test("dedup_keeper_quality: keeper is the longest cluster member") {
    val rows = q("dedup_keeper_quality").collect()
    assert(rows.nonEmpty)
    // independent cluster ground truth from the CC query it shares labels
    // with, and doc lengths straight from the table
    val labels = q("dedup_connected_components").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 60).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byLabel = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(rows.length == byLabel.size)
    rows.foreach { r =>
      val (label, size, keeper, kChars, removed) = (r.getLong(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val members = byLabel(label)
      assert(members.length.toLong == size)
      assert(members.contains(keeper), s"keeper $keeper not in cluster $label")
      val best = members.map(m => (chars(m), -m)).max
      assert(keeper == -best._2 && kChars == best._1,
        s"cluster $label kept $keeper, expected ${-best._2}")
      assert(removed == members.map(chars).sum - kChars)
    }
  }

  test("agg_corr_matrix values are in [-1,1] and match Spark's corr") {
    val rows = q("agg_corr_matrix").collect()
    assert(rows.length == 6)
    val m = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(c => c >= -1.0 && c <= 1.0))
    // cents-rounding + r4 vs double corr over raw values: within 1e-3
    val ref = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(corr(col("l_quantity"), col("l_extendedprice"))).head().getDouble(0)
    assert(math.abs(m("qty_price") - ref) <= 1e-3, s"${m("qty_price")} vs $ref")
  }

  test("text_unigram_logprob: rare-token docs score above common-token docs") {
    val out = q("text_unigram_logprob")
    // mean surprisal is positive and bounded by ln(corpus tokens)
    val n = out.agg(sum("n_tokens")).head().getLong(0)
    val bad = out.where(col("mean_surprisal") <= 0.0 ||
      col("mean_surprisal") > math.log(n.toDouble) + 1e-6).count()
    assert(bad == 0)
    // a doc of the single most frequent token would score the corpus
    // minimum surprisal; check the observed min is >= ln(N/max_count)
    val maxC = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")).as("t"))
      .groupBy("t").count().agg(max("count")).head().getLong(0)
    val minS = out.agg(min("mean_surprisal")).head().getDouble(0)
    assert(minS >= math.log(n.toDouble / maxC) - 1e-4)
  }

  test("text_pmi_bigrams honors the count floor and the PMI identity") {
    val rows = q("text_pmi_bigrams").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(_.getLong(1) >= 5L))
    // recompute PMI for the top row exactly from corpus counts
    val top = rows.head
    val Array(t1, t2) = top.getString(0).split(" ", 2)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ").as("tk"))
    val uni = toks.select(explode(col("tk")).as("t")).groupBy("t").count()
    val c1 = uni.where(col("t") === t1).head().getLong(1)
    val c2 = uni.where(col("t") === t2).head().getLong(1)
    val nu = uni.agg(sum("count")).head().getLong(0)
    val nb = toks.select((size(col("tk")) - 1).cast("long").as("m"))
      .agg(sum("m")).head().getLong(0)
    val pmi = math.log(top.getLong(1).toDouble) - math.log(nb.toDouble) -
      math.log(c1.toDouble) - math.log(c2.toDouble) + 2 * math.log(nu.toDouble)
    assert(math.abs(top.getDouble(2) - pmi) <= 1e-3, s"${top.getDouble(2)} vs $pmi")
  }

  test("mix_domains_temperature flattens the mix toward uniform") {
    val rows = q("mix_domains_temperature").collect()
    val ps = rows.map(_.getDouble(2)); val ws = rows.map(_.getDouble(3))
    // weights normalize — tolerance scales with the source count: each w_temp
    // is r4-rounded (±5e-5), so the worst-case sum drift is rows × 5e-5
    // (ADVICE r6: a fixed 1e-3 equals exactly 20 sources and would flake if
    // the fixture ever gained some)
    assert(math.abs(ws.sum - 1.0) <= rows.length * 5e-5)
    // temperature scaling never widens the spread, and strictly shrinks it
    // whenever the natural mix is non-uniform (at sf0.001 it IS uniform —
    // ratio 1.0 on both sides — so allow equality there)
    val natural = ps.max / ps.min
    if (natural > 1.0 + 1e-9) assert(ws.max / ws.min < natural)
    else assert(math.abs(ws.max / ws.min - 1.0) <= 1e-3)
    // every boost factor is positive and finite
    assert(rows.forall(r => r.getDouble(4) > 0.0 && !r.getDouble(4).isInfinite))
  }

  test("pipeline_gopher_rules: keep is the rule conjunction, every rule discriminates") {
    val rows = q("pipeline_gopher_rules").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val Seq(wc, ml, sw, rep, keep) = (5 to 9).map(r.getBoolean)
      assert(keep == (wc && ml && sw && rep), s"keep != conjunction at $r")
      assert(r.getDouble(2) > 1.0 && r.getDouble(2) < 20.0) // mean_word_len
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0) // max_word_frac
    }
    // a gate where some rule never fires isn't filtering anything
    for (i <- 5 to 8) {
      val vals = rows.map(_.getBoolean(i)).toSet
      assert(vals == Set(true, false), s"rule col $i is constant: $vals")
    }
  }

  test("pipeline_perplexity_gate: band conjunction, plausible surprisal range") {
    val rows = q("pipeline_perplexity_gate").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getBoolean(3) && r.getBoolean(4)))
      val ms = r.getDouble(2)
      assert(ms > 3.0 && ms < 4.0, s"surprisal $ms outside fixture range")
    }
    val kept = rows.count(_.getBoolean(5))
    assert(kept > 0 && kept < rows.length, s"gate is degenerate: $kept/500")
  }

  test("dedup_substring: counts nest, runs bound, grams match token count") {
    val rows = q("dedup_substring").collect()
    assert(rows.length == 500)
    val nTok = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " "))
          .cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var anyDup = false
    rows.foreach { r =>
      val (id, ng, nd, run) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))
      assert(ng == math.max(0L, nTok(id) - 4), s"gram count wrong for doc $id")
      assert(nd >= 0 && nd <= ng)
      assert(run <= nd, s"longest run $run exceeds dup positions $nd")
      assert((run > 0) == (nd > 0))
      if (nd > 0) { anyDup = true; assert(!r.isNullAt(3)) }
    }
    assert(anyDup, "fixture corpus has zero repeated 5-gram — vacuous test")
  }

  test("pipeline_pii_scrub: no digit survives, untouched rows pass through") {
    val rows = q("pipeline_pii_scrub").collect()
    assert(rows.nonEmpty)
    val props = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("props"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var anyNum = false
    rows.foreach { r =>
      val (id, nNum, nEmail, scrubbed) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(!scrubbed.exists(_.isDigit), s"digit survived scrub: $scrubbed")
      if (nNum > 0) anyNum = true
      if (nNum == 0 && nEmail == 0)
        assert(scrubbed == props(id), "untouched row was modified")
      else assert(scrubbed != props(id))
    }
    assert(anyNum, "no redactions happened — vacuous test")
  }

  test("sample_reservoir_weighted is deterministic and length-tilted") {
    val a = q("sample_reservoir_weighted").collect()
    val b = q("sample_reservoir_weighted").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(_.getInt(1) <= 10))
    // the weighted pick must skew long: sampled mean n_chars exceeds the
    // corpus mean (weight = n_chars; at sf0.001 the gap is comfortably wide)
    val sampled = a.map(_.getLong(3).toDouble)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampled.sum / sampled.length > corpus,
      s"sampled mean ${sampled.sum / sampled.length} vs corpus mean $corpus")
  }

  test("scan_schema_evolution: merged schema spans generations, " +
    "NULL backfill only on legacy rows") {
    val out = q("scan_schema_evolution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.foreach { case (lang, nDocs, nLegacy, charsKnown) =>
      val ofLang = docs.filter(_._2 == lang)
      assert(nDocs == ofLang.length.toLong)
      // gen 1 = even ids (written without n_chars) ⇒ NULL after merge
      assert(nLegacy == ofLang.count(_._1 % 2 == 0).toLong)
      assert(charsKnown == ofLang.filter(_._1 % 2 == 1).map(_._3).sum)
    }
  }

  test("stream_constraint_monitor: seeded violations are counted per " +
      "window and the clean fixture passes") {
    val clean = q("stream_constraint_monitor").collect()
    assert(clean.nonEmpty)
    assert(clean.forall(_.getAs[Boolean]("pass")),
      "clean fixture must pass every window")
    // corrupted micro-corpus: one window with every violation class
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val rows = Seq(
      Row(1L, t(1), 7L, "click", 1.0, "{}"),      // clean
      Row(2L, t(2), 7L, "teleport", 1.0, "{}"),   // unknown type
      Row(3L, t(3), 7L, "view", 0.0, "{}"),       // non-positive value
      Row(4L, t(4), null, "view", 1.0, "{}"),     // null user
      Row(5L, t(5), 7L, "view", 1.0, "{}"),       // |
      Row(5L, t(6), 7L, "view", 1.0, "{}"),       // | duplicate event_id
      // NULL ids are their OWN violation class, never dups (r12 ADVICE:
      // Spark one-NULL-group vs DuckDB count(DISTINCT)-drops-NULL would
      // otherwise diverge k-1 vs k)
      Row(null, t(7), 7L, "view", 1.0, "{}"),
      Row(null, t(8), 7L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_scm").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows), sch)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("stream_constraint_monitor")(spark, dir)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_events") == 8L)
    assert(r.getAs[Long]("v_type") == 1L, "unknown event_type")
    assert(r.getAs[Long]("v_value") == 1L, "non-positive value")
    assert(r.getAs[Long]("v_user") == 1L, "null user_id")
    assert(r.getAs[Long]("v_id_null") == 2L, "null event_ids counted apart")
    assert(r.getAs[Long]("v_dup") == 1L, "duplicate event_id (nulls excluded)")
    assert(!r.getAs[Boolean]("pass"))
  }

  test("fn_variant: extracted fields invert construction, miss path is null") {
    val rows = q("fn_variant").collect()
    assert(rows.nonEmpty)
    // independent recompute of the payload key from the raw props string
    val want = graft.util.Canon.tbl(spark, sf, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_type"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.getString(2)))).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == id, "vid must echo event_id through the variant")
      val (k, et) = want(id)
      assert(r.getString(2) == et, s"vet mismatch at $id")
      assert(r.get(3) == k, s"vk mismatch at $id")
      assert(r.isNullAt(4), "try_variant_get on an absent path must be null")
      assert(r.getLong(5) == id % 7, s"varr1 mismatch at $id")
      assert(r.getString(6).startsWith("OBJECT<meta:"),
        "schema_of_variant must describe the envelope")
    }
  }

  test("sub_recursive_cte: chain stats equal the closed form, plan has UnionLoop") {
    val df = q("sub_recursive_cte")
    // r16: the op pins/restores the recursion-row-limit conf and therefore
    // executes eagerly (localCheckpoint) inside the pinned scope — the
    // UnionLoop shape is asserted on the captured pre-checkpoint plan
    val plan = graft.ops.Relational.lastRecursivePlan
    assert(plan.contains("UnionLoop"),
      "recursion must execute as the set-based UnionLoop, not a driver loop")
    df.collect().foreach { r =>
      val c = r.getLong(0)
      // closed form: node halves until 1, so depth = floor(log2 c),
      // path_sum = sum of c >> i for i in 0..depth
      var (node, depth, sum) = (c, 0, c)
      while (node > 1) { node /= 2; depth += 1; sum += node }
      assert(r.getInt(1) == depth, s"chain_len at $c")
      assert(r.getLong(2) == sum, s"path_sum at $c")
      assert(r.getLong(3) == depth + 1L, s"n_nodes at $c")
    }
  }

  test("sql_pipe_syntax: pipe form equals the DataFrame-ANSI form exactly") {
    import graft.util.Canon._
    val pipe = q("sql_pipe_syntax").collect()
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val ansi = tbl(spark, sf, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"),
        (sum(cents(disc)) / 100.0).as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")
      .select("l_returnflag", "l_linestatus", "n", "sum_qty", "revenue")
      .collect()
    assert(pipe.length == ansi.length && pipe.length > 0)
    pipe.zip(ansi).foreach { case (p, a) =>
      assert(p.getString(0) == a.getString(0) && p.getString(1) == a.getString(1))
      assert(p.getLong(2) == a.getLong(2), s"n at ${p.getString(0)}")
      assert(p.getDouble(3) == a.getDouble(3), s"sum_qty at ${p.getString(0)}")
      assert(p.getDouble(4) == a.getDouble(4), s"revenue at ${p.getString(0)}")
    }
  }

  test("scan_xml: XML round-trip is lossless vs the parquet table") {
    val got = q("scan_xml").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    val want = graft.util.Canon.tbl(spark, sf, "nation")
      .orderBy("n_nationkey").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("scan_parquet_variant: stored column is VARIANT, extraction matches raw JSON") {
    import org.apache.spark.sql.types.VariantType
    val got = q("scan_parquet_variant").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    // the staging dir the op just wrote — re-read its footer schema
    val dir = graft.ops.Relational.variantEventsDir(sf)
    val stored = spark.read.parquet(dir).schema("v").dataType
    assert(stored.isInstanceOf[VariantType],
      s"props must persist as VARIANT, got $stored")
    graft.util.Canon.tbl(spark, sf, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int")).collect()
      .foreach(r => assert(got(r.getLong(0)) == r.get(1)))
  }

  test("fn_collation: LCASE collation dedups exactly like explicit lower()") {
    val r = q("fn_collation").head()
    val (nRows, ci, cs) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getLong(4) == nRows, "x = upper(x) under UTF8_LCASE for every row")
    assert(r.getLong(5) < nRows, "binary equality must discriminate case")
    assert(ci <= cs)
    val lowDistinct = graft.util.Canon.tbl(spark, sf, "part")
      .select(lower(col("p_name"))).distinct().count()
    assert(ci == lowDistinct,
      "collated DISTINCT must equal the explicit lower() DISTINCT")
  }

  test("udf_sql_scalar: SQL UDF inlines (no ScalaUDF node) and matches cents recompute") {
    import graft.util.Canon._
    val df = q("udf_sql_scalar")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      "a SQL UDF must inline into the plan, not run as an opaque closure")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      (lit(1.0) + col("l_tax"))
    val want = tbl(spark, sf, "lineitem").groupBy("l_returnflag")
      .agg(sum(cents(disc)).as("c"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("udtf_sql_lateral: per-doc expansion is contiguous 0..(n_chars div 100)") {
    val byDoc = q("udtf_sql_lateral").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getInt(1)).sorted.toSeq }
    val want = graft.util.Canon.tbl(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> (0 to (r.getLong(1) / 100).toInt).toSeq).toMap
    assert(byDoc == want)
  }

  test("sql_session_variables: bound parameter equals the literal form, filter pushed") {
    val df = q("sql_session_variables")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // assert on the PushedFilters section naming the column, not on the
    // exact rendered predicate string — the latter is brittle across Spark
    // formatting changes even when pushdown still works (ADVICE r15)
    val pushed = "(?s)PushedFilters: \\[[^\\]]*o_totalprice[^\\]]*\\]".r
    assert(pushed.findFirstIn(formatted).isDefined,
      s"the bound predicate must reach PushedFilters; plan:\n$formatted")
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = graft.util.Canon.tbl(spark, sf, "orders")
      .where(col("o_totalprice") > 450000.0).orderBy("o_orderkey")
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("multimodal_image_histogram: bins sum to w*h and match a Scala recompute") {
    val metas = graft.util.Canon.tbl(spark, sf, "documents")
      .where(col("doc_id") < 20)
      .select(col("doc_id"), octet_length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    q("multimodal_image_histogram").collect().foreach { r =>
      val id = r.getLong(0); val len = metas(id)
      val w = (8 + id % 16).toInt; val h = (8 + (id * 7) % 16).toInt
      val bins = new Array[Long](8)
      for (x <- 0 until w; y <- 0 until h)
        bins(((id * 31 + len * 17 + 7L * x + 13L * y) % 256).toInt >> 5) += 1
      val got = (1 to 8).map(r.getLong)
      assert(got.sum == w.toLong * h, s"bin mass at $id")
      assert(got == bins.toSeq, s"histogram mismatch at $id")
    }
  }

  test("multimodal_audio_energy: window masses partition frames, energies exact") {
    val rows = q("multimodal_audio_energy").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      val n = (64 + id % 64).toInt
      // windows cover the frames exactly: counts sum to n, all-but-last full
      assert(rs.map(_.getLong(2)).sum == n.toLong, s"frame mass at $id")
      val sorted = rs.sortBy(_.getLong(1))
      sorted.init.foreach(r => assert(r.getLong(2) == 32L))
      // exact recompute of each window's energy from the staging formula
      sorted.foreach { r =>
        val w = r.getLong(1).toInt
        val want = (w * 32 until math.min((w + 1) * 32, n)).map { i =>
          val v = ((id * 131 + i * 17) % 2003) - 1001; v * v
        }.sum
        assert(r.getLong(3) == want, s"energy at $id/$w")
      }
    }
  }

  test("fn_try_errors: every failure class yields NULL exactly where it must") {
    q("fn_try_errors").collect().foreach { r =>
      val k = r.getLong(0)
      assert(r.isNullAt(1) == (k % 3 == 0), s"div3 at $k")
      assert(r.isNullAt(2) == (k % 2 == 0), s"ovf_add at $k")
      if (k % 2 != 0) assert(r.getLong(2) == Long.MaxValue)
      assert(r.isNullAt(3) == (k % 3 == 2), s"ovf_mul at $k")
      assert(r.isNullAt(4) == (k % 2 == 0), s"bad_cast at $k")
      if (k % 2 != 0) assert(r.getLong(4) == k)
      assert(r.isNullAt(5) == (k % 5 + 1 > 3), s"elem at $k")
    }
  }

  test("join hints pin their physical operators and never change the rows") {
    def planOf(hint: String) = {
      val df = graft.ops.Joins.joinHinted(spark, sf, hint)
      (df.queryExecution.executedPlan.toString,
        df.collect().map(_.toSeq).toSet)
    }
    val (pb, rb) = planOf("broadcast")
    val (pm, rm) = planOf("merge")
    val (ph, rh) = planOf("shuffle_hash")
    assert(pb.contains("BroadcastHashJoin"), "broadcast hint ignored")
    assert(pm.contains("SortMergeJoin"), "merge hint ignored")
    assert(ph.contains("ShuffledHashJoin"), "shuffle_hash hint ignored")
    assert(rb == rm && rm == rh, "a hint changed the result")
  }

  test("agg_grouping_id: indicators separate data-NULL from subtotal-NULL") {
    val rows = q("agg_grouping_id").collect()
    val ev = graft.util.Canon.tbl(spark, sf, "events")
    val total = ev.count()
    // gid = 3 is the single grand-total row; every gid level re-sums to n
    (0 to 3 by 1).filter(Set(0, 1, 3)).foreach { g =>
      val atLevel = rows.filter(_.getInt(4) == g)
      assert(atLevel.map(_.getLong(5)).sum == total, s"mass at gid=$g")
    }
    assert(rows.count(_.getInt(4) == 3) == 1, "exactly one grand total")
    rows.foreach { r =>
      assert(r.getInt(4) == r.getInt(2) * 2 + r.getInt(3), "gid decomposition")
    }
    // the fixture's user_id is nullable by contract but currently all
    // non-null — drive the data-NULL vs subtotal-NULL distinction with an
    // inline frame: a NULL user in the DATA must surface at gid=0 with
    // g_user=0, structurally apart from the gid>=2 subtotal NULLs
    import spark.implicits._
    Seq((Some(1L), "a"), (None: Option[Long], "a"), (None, "b"))
      .toDF("user_id", "event_type").createOrReplaceTempView("gid_inline")
    val inl = spark.sql("""
      SELECT user_id, CAST(grouping(user_id) AS INT) AS g_user,
             CAST(grouping_id(user_id, event_type) AS INT) AS gid, count(*) AS n
      FROM gid_inline GROUP BY ROLLUP(user_id, event_type)""").collect()
    val dataNull = inl.filter(r => r.getInt(2) == 0 && r.isNullAt(0))
    assert(dataNull.map(_.getLong(3)).sum == 2, "data-NULL detail rows")
    assert(dataNull.forall(_.getInt(1) == 0),
      "grouping() must be 0 for a data NULL")
    assert(inl.filter(_.getInt(2) >= 2).forall(r =>
      r.isNullAt(0) && r.getInt(1) == 1),
      "subtotal rows carry grouping()=1")
  }

  test("agg_bitmap_native: native bitmap distinct equals countDistinct") {
    val got = q("agg_bitmap_native").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = graft.util.Canon.tbl(spark, sf, "orders")
      .join(graft.util.Canon.tbl(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("text_url_normalize: extraction inverts construction per row") {
    val docs = graft.util.Canon.tbl(spark, sf, "documents")
      .select("doc_id", "source", "lang").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val rows = q("text_url_normalize").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (src, lang) = docs(id)
      assert(r.getString(1) == s"$src.example.com", s"host at $id")
      assert(r.getString(2) == s"/docs/$id", s"path at $id")
      assert(r.getString(3) == lang, s"q_lang at $id")
      assert(r.getString(4) == s"https://$src.example.com/docs/$id",
        "canonical = scheme+host+path with params and fragment stripped")
    }
  }

  test("proto decode family is codegen-real: CODEGEN_ONLY with fallback off equals interpreted") {
    // the three r16/r17 proto expressions claim doGenCode with no
    // CodegenFallback — force the generated path (a compile failure would
    // ABORT, not silently interpret) and pin it equals NO_CODEGEN output
    def runAll() = Seq("fn_protobuf_decode", "fn_protobuf_repeated",
      "fn_protobuf_nested").map(id => id -> q(id).collect().toSeq).toMap
    val factoryKey = "spark.sql.codegen.factoryMode"
    val fallbackKey = "spark.sql.codegen.fallback"
    val priorFactory = spark.conf.getOption(factoryKey)
    val priorFallback = spark.conf.getOption(fallbackKey)
    try {
      spark.conf.set(factoryKey, "CODEGEN_ONLY")
      spark.conf.set(fallbackKey, "false")
      val gen = runAll()
      spark.conf.set(factoryKey, "NO_CODEGEN")
      val interp = runAll()
      gen.foreach { case (id, rows) =>
        assert(rows.nonEmpty && rows == interp(id),
          s"$id: codegen and interpreted paths disagree")
      }
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v match { case Some(x) => spark.conf.set(k, x)
                  case None => spark.conf.unset(k) }
      restore(factoryKey, priorFactory)
      restore(fallbackKey, priorFallback)
    }
  }
}
