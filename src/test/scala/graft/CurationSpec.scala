package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic verification of the curation/retrieval tier (ops/Curation.scala)
  * beyond the DuckDB hash-match: independent plain-Scala reference
  * implementations of BM25, DSIR, Adamic–Adar and the covariance moments,
  * plus the linear-algebra properties (PSD spectrum, trace preservation,
  * power-iteration agreement) that make embed_pca_variance trustworthy
  * without an oracle row. */
class CurationSpec extends AnyFunSuite {
  import TestSession._
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def norm(t: String): Array[String] =
    t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
  private def li(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000.0

  private lazy val docs: Array[(Long, String, Array[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), norm(r.getString(2))))

  test("text_bm25_search: exact match vs plain-Scala scaled-int BM25") {
    val terms = Seq("hash", "join", "stream")
    val n = docs.length.toLong
    val totTok = docs.map(_._3.length.toLong).sum
    val avgdl = totTok.toDouble / n.toDouble
    val df = terms.map(t => t -> docs.count(_._3.contains(t)).toLong).toMap
    val ref = docs.flatMap { case (id, _, tk) =>
      val scores = terms.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idfS = math.floor(math.log(
            (n.toDouble - df(t).toDouble + 0.5) / (df(t).toDouble + 0.5) + 1.0)
            * 1e6 + 0.5).toLong
          val frac = (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (tk.length.toDouble / avgdl)))
          Some(math.floor(idfS.toDouble * frac + 0.5).toLong)
        }
      }
      if (scores.isEmpty) None
      else Some((id, scores.size.toLong, scores.sum))
    }.sortBy { case (id, _, s) => (-s, id) }.take(15)
    val got = q("text_bm25_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == ref.length)
    got.zip(ref).foreach { case ((gi, gn, gs), (ri, rn, rs)) =>
      assert(gi == ri && gn == rn, s"doc $gi vs ref $ri")
      assert(math.abs(gs - r4(rs.toDouble / 1e6)) < 1e-9,
        s"doc $gi score $gs vs ${r4(rs.toDouble / 1e6)}")
    }
  }

  test("pipeline_dsir_weights: exact match vs plain-Scala hashed-unigram LMs") {
    val B = 256
    val p31 = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L,
      887503681L, 27512614111L)
    def bucket(t: String): Int = {
      val p = t.padTo(8, ' ')
      ((0 until 8).map(i => p(i).toLong * p31(i)).sum % B).toInt
    }
    val all = docs.flatMap { case (id, lang, tk) => tk.map(t => (id, lang, bucket(t))) }
    val cr = all.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nr = all.length.toLong
    val nt = all.count(_._2 == "en").toLong
    val kadj = li(nr.toDouble + B) - li(nt.toDouble + B)
    val ref = docs.map { case (id, lang, tk) =>
      val w = tk.map(bucket).groupBy(identity).map { case (b, g) =>
        g.length.toLong *
          (li(ct.getOrElse(b, 0L).toDouble + 1) - li(cr(b).toDouble + 1))
      }.sum + tk.length.toLong * kadj
      (id, lang, tk.length.toLong, w)
    }.sortBy { case (id, _, _, w) => (-w, id) }.take(25)
    val got = q("pipeline_dsir_weights").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == ref.length)
    got.zip(ref).foreach { case ((gi, gl, gn, gw), (ri, rl, rn, rw)) =>
      assert(gi == ri && gl == rl && gn == rn, s"doc $gi vs ref $ri")
      assert(math.abs(gw - r4(rw.toDouble / 1e6)) < 1e-9)
    }
    // the operator's reason to exist: target-language docs dominate the pick
    assert(got.count(_._2 == "en") > got.length / 2,
      s"en docs in top-25: ${got.count(_._2 == "en")}")
  }

  test("pipeline_dsir_ess: exact ESS from the reference weight frame") {
    // reuse the dsir reference machinery: recompute every doc's scaled
    // log-weight, then ESS over exp-weights exactly as the op defines it
    val B = 256
    val p31 = Array(1L, 31L, 961L, 29791L, 923521L, 28629151L,
      887503681L, 27512614111L)
    def bucket(t: String): Int = {
      val p = t.padTo(8, ' ')
      ((0 until 8).map(i => p(i).toLong * p31(i)).sum % B).toInt
    }
    val all = docs.flatMap { case (id, lang, tk) =>
      tk.map(t => (id, lang, bucket(t))) }
    val cr = all.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = all.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.length.toLong).toMap
    val kadj = li(all.length.toDouble + B) -
      li(all.count(_._2 == "en").toDouble + B)
    val lss = docs.map { case (_, _, tk) =>
      tk.map(bucket).groupBy(identity).map { case (b, g) =>
        g.length.toLong *
          (li(ct.getOrElse(b, 0L).toDouble + 1) - li(cr(b).toDouble + 1))
      }.sum + tk.length.toLong * kadj
    }
    // the op max-shifts before exp (log-sum-exp; ESS is scale-invariant)
    val mx = lss.max
    val wis = lss.map(ls =>
      math.floor(math.exp((ls - mx).toDouble / 1e6) * 1e6 + 0.5).toLong)
    val (sw, sw2) = (wis.sum, wis.map(w => w * w).sum)
    val ess = sw.toDouble * sw.toDouble / sw2.toDouble
    val got = q("pipeline_dsir_ess").head()
    assert(got.getLong(0) == docs.length.toLong)
    assert(got.getDouble(1) == r4(ess), s"${got.getDouble(1)} vs ${r4(ess)}")
    assert(got.getDouble(2) == r4(ess / docs.length.toDouble))
    // weights near exp(0): ESS should stay a large fraction of n
    assert(got.getDouble(2) > 0.5 && got.getDouble(2) <= 1.0)
  }

  test("link-prediction facades: symmetric both-directions edge input " +
    "gives the same answer as canonical input (review r8b regression)") {
    import spark.implicits._
    val canon = Seq((5L, 1L), (5L, 2L), (5L, 3L), (1L, 2L))
    val sym = canon ++ canon.map { case (a, b) => (b, a) }
    def run(f: DataFrame => DataFrame, edges: Seq[(Long, Long)]) =
      f(edges.toDF("a", "b")).collect().map(_.toString).sorted.toSeq
    for (f <- Seq[DataFrame => DataFrame](
        df => graft.api.Graft.adamicAdar(df, "a", "b"),
        df => graft.api.Graft.jaccardLinkpred(df, "a", "b"),
        df => graft.api.Graft.resourceAllocation(df, "a", "b"))) {
      assert(run(f, canon) == run(f, sym),
        "symmetric edge representation changed the prediction")
    }
  }

  test("facade hardening: empty pcaSpectrum, unnormalized bm25 terms " +
    "(review r8b regressions)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val empty = graft.api.Graft.pcaSpectrum(emb.where(col("vec_id") < 0),
      "vec_id", "embedding")
    assert(empty.collect().isEmpty)
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val messy = graft.api.Graft.bm25Search(docsDf, "doc_id", "text",
      Seq(" Hash ", "JOIN", "stream", "stream")).collect().map(_.toString)
    val clean = graft.api.Graft.bm25Search(docsDf, "doc_id", "text",
      Seq("hash", "join", "stream")).collect().map(_.toString)
    assert(messy sameElements clean)
  }

  test("pipeline_epoch_plan: budget conserved, tail sources upsampled") {
    val rows = q("pipeline_epoch_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val totTokens = rows.map(_._2).sum
    val planned = rows.map(_._3).sum
    // Σ planned ≈ budget (= tot/2) up to one rounding unit per source
    assert(math.abs(planned - totTokens / 2) <= rows.length,
      s"planned $planned vs budget ${totTokens / 2}")
    // α < 1: epochs (relative draw rate) decrease as source size grows
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(small, big) => assert(small._4 >= big._4 - 1e-9,
        s"${small._1} epochs ${small._4} < ${big._1} ${big._4}")
      case _ =>
    }
    // budget is half the corpus ⇒ nothing can exceed 1 epoch unless its
    // boost is > 2; assert everything stays in a sane band
    rows.foreach { case (_, _, _, ep) => assert(ep > 0.0 && ep < 2.0) }
  }

  test("pipeline_mix_temperature: normalized weights, tail upsampled") {
    val rows = q("pipeline_mix_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val mixSum = rows.map(_._4).sum
    assert(math.abs(mixSum - 1.0) < 1e-2, s"mix weights sum $mixSum")
    // α < 1 ⇒ the boost is strictly decreasing in share: every smaller
    // source is upsampled relative to every larger one
    rows.sortBy(_._3).sliding(2).foreach {
      case Array(small, big) =>
        assert(small._5 >= big._5 - 1e-9,
          s"boost not monotone: ${small._1} ${small._5} < ${big._1} ${big._5}")
      case _ =>
    }
  }

  test("embed_covariance: matches dense plain-Scala covariance") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * 10000 + 0.5).toLong))
    val n = vecs.length.toLong
    val d = vecs(0).length
    val got = q("embed_covariance").collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2))).toMap
    assert(got.size == d * (d + 1) / 2)
    for (i <- 0 until d; j <- i until d) {
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val sxi = vecs.map(_(i)).sum
      val sxj = vecs.map(_(j)).sum
      val cov = (n * sxy - sxi * sxj).toDouble / (n.toDouble * n.toDouble) / 1.0e8
      assert(math.abs(got((i, j)) - r4(cov)) < 1e-9, s"cov($i,$j)")
    }
  }

  test("jacobiEigenvalues: exact on a known 3x3 symmetric matrix") {
    // eigenvalues of [[2,1,0],[1,2,1],[0,1,2]] are 2, 2±√2
    val m = Array(Array(2.0, 1.0, 0.0), Array(1.0, 2.0, 1.0), Array(0.0, 1.0, 2.0))
    val ev = graft.ops.Curation.jacobiEigenvalues(m)
    val want = Array(2.0 + math.sqrt(2.0), 2.0, 2.0 - math.sqrt(2.0))
    ev.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("embed_pca_variance: PSD descending spectrum, trace preserved, " +
    "top eigenvalue matches power iteration") {
    val rows = q("embed_pca_variance").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1 to 10))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 - 1e-9, "eigenvalues not descending")
      assert(b._4 >= a._4 - 1e-9, "cumulative evr not monotone")
    case _ => }
    assert(rows.forall(_._2 >= -1e-9), "negative eigenvalue (not PSD)")
    assert(rows.last._4 <= 1.0 + 1e-6)
    // rebuild the covariance matrix from the oracle-checked entries and
    // check the solver against an independent power iteration
    val cov = {
      val entries = q("embed_covariance").collect()
        .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2)))
      val d = entries.map(_._1._2).max + 1
      val m = Array.ofDim[Double](d, d)
      entries.foreach { case ((i, j), v) => m(i)(j) = v; m(j)(i) = v }
      m
    }
    val d = cov.length
    val ev = graft.ops.Curation.jacobiEigenvalues(cov)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(ev.sum - trace) < 1e-9 * math.max(1.0, math.abs(trace)),
      s"trace ${trace} vs eigen sum ${ev.sum}")
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    for (_ <- 1 to 500) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nw = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nw)
      lambda = nw
    }
    // power iteration converges to λmax of the PSD matrix; spectrum is
    // near-degenerate on this isotropic fixture, so tolerance is loose
    assert(math.abs(ev.head - lambda) / ev.head < 5e-3,
      s"jacobi λmax ${ev.head} vs power iteration $lambda")
  }

  test("agg_bootstrap_ci: exact match vs plain-Scala Poisson bootstrap") {
    val rows = graft.util.Canon.events(spark, sf)
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    // same CDF thresholds as the op (JVM exp, floored at 2^32)
    val pmf = (0 to 4).map(k => math.exp(-1.0) / (1 to k).product.toDouble)
    val thr = pmf.scanLeft(0.0)(_ + _).drop(1)
      .map(c => math.floor(c * 4294967296.0).toLong)
    def weight(id: Long, b: Long): Long = {
      val u = (((id * 131 + b) % 1000003 + 1000003) % 1000003 *
        2654435761L) % 4294967296L
      thr.indexWhere(u < _) match { case -1 => 5L; case k => k.toLong }
    }
    val means = (0L until 100L).flatMap { b =>
      val (sw, nw) = rows.foldLeft((0L, 0L)) { case ((s0, n0), (id, v)) =>
        val w = weight(id, b); (s0 + w * v, n0 + w)
      }
      if (nw > 0) Some(sw.toDouble / nw.toDouble) else None
    }.sorted
    def r4d(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    val got = q("agg_bootstrap_ci").head()
    assert(got.getLong(0) == rows.length.toLong)
    val mean = rows.map(_._2).sum.toDouble / rows.length.toDouble / 100.0
    assert(got.getDouble(1) == r4d(mean))
    assert(got.getDouble(2) == r4d(means(2) / 100.0), "ci_lo")
    assert(got.getDouble(3) == r4d(means(97) / 100.0), "ci_hi")
    assert(got.getDouble(2) < got.getDouble(1) &&
      got.getDouble(1) < got.getDouble(3), "CI must straddle the mean")
  }

  test("pipeline_ccnet_bucket: balanced terciles with monotone bands") {
    val rows = q("pipeline_ccnet_bucket").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == (1 to bs.length),
        s"$lang buckets ${bs.map(_._2).toSeq}")
      // ntile balance: sizes differ by at most 1
      assert(bs.map(_._4).max - bs.map(_._4).min <= 1, s"$lang unbalanced")
      // bands are ordered and internally consistent
      bs.sortBy(_._2).sliding(2).foreach {
        case Array(lo, hi) => assert(lo._6 <= hi._5 + 1e-4,
          s"$lang band overlap: ${lo._6} > ${hi._5}")
        case _ =>
      }
      bs.foreach(b => assert(b._5 <= b._6))
    }
    assert(rows.filter(_._2 == 1).forall(_._3 == "head"))
    assert(rows.filter(_._2 == 3).forall(_._3 == "tail"))
  }

  test("sim_eval_label_precision: matches plain-Scala top-5 label agreement") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s0, i) => s0 + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val got = q("sim_eval_label_precision").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 10)
    got.foreach { case (qid, qlabel, nMatch, prec) =>
      val (_, qe, ql) = vecs.find(_._1 == qid).get
      assert(ql == qlabel)
      val top5 = vecs.filter(_._1 != qid)
        .map { case (id, v, l) => (id, l, cos(qe, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(5)
      val ref = top5.count(_._2 == qlabel).toLong
      assert(nMatch == ref, s"qid $qid: $nMatch vs $ref")
      assert(prec == math.floor(ref.toDouble / 5.0 * 10000 + 0.5) / 10000.0)
    }
  }

  test("embed_mmr_rerank: matches an independent greedy MMR recompute") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s0, i) => s0 + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val got = q("embed_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(got.keySet == Set(0L, 1L, 2L))
    got.foreach { case (qid, rows) =>
      val qe = vecs(qid)
      // pool: top-20 by (cos desc, id) excluding self
      val pool = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, v, cos(qe, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(20)
      // independent greedy (recursion instead of the op's while loop)
      def pick(sel: List[(Long, Array[Float])],
          acc: List[(Int, Long, Double)]): List[(Int, Long, Double)] =
        if (sel.length == 5) acc.reverse
        else {
          val cands = pool.filterNot(p => sel.exists(_._1 == p._1))
            .map { case (id, v, c) =>
              val div = if (sel.isEmpty) 0.0 else sel.map(s => cos(v, s._2)).max
              (id, v, 0.7 * c - 0.3 * div)
            }
          val best = cands.minBy { case (id, _, sc) => (-sc, id) }
          pick((best._1, best._2) :: sel,
            (sel.length + 1, best._1, best._3) :: acc)
        }
      val ref = pick(Nil, Nil)
      val gotRows = rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toList
      ref.zip(gotRows).foreach { case ((rr, ri, rs), (gr, gi, gs)) =>
        assert(rr == gr && ri == gi, s"qid $qid rank $rr: $ri vs $gi")
        assert(math.abs(gs - math.floor(rs * 10000 + 0.5) / 10000.0) < 1e-9)
      }
      // first pick is the plain top-1 (no diversity term yet)
      assert(gotRows.head._2 == pool.head._1)
    }
  }

  test("graph_jaccard_linkpred: hand-traced scores, non-edges only") {
    // star 5—{1,2,3} + edge 1—2: candidates (1,3) and (2,3) via center 5.
    // J(1,3) = 1/(2+1−1) = 1/2; J(2,3) = 1/2 (deg 1 = deg 2 = 2, deg 3 = 1)
    import spark.implicits._
    val fixEdges = Seq((5L, 1L), (5L, 2L), (5L, 3L), (1L, 2L)).toDF("a", "b")
    val out = graft.ops.Graph.jaccardLpCore(fixEdges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1L, 3L, 500000L, 1L), (2L, 3L, 500000L, 1L)),
      out.mkString(","))
    // path 1-2-3: Γ1 = Γ3 = {2} → J(1,3) = 1/(1+1−1) = 1 → 1e6
    val path = graft.ops.Graph.jaccardLpCore(
        Seq((1L, 2L), (2L, 3L)).toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(path.toSeq == Seq((1L, 3L, 1000000L, 1L)), path.mkString(","))
  }

  test("graph_adamic_adar: exact match vs plain-Scala AA over the op's edges") {
    val edges = graft.ops.Graph.coocEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbr = (edges.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = nbr.view.mapValues(_.size.toLong).toMap
    val w = deg.collect { case (nd, dg) if dg >= 2 =>
      nd -> 1000000000000L / li(dg.toDouble)
    }
    val cand = for {
      (c, ns) <- nbr.toSeq if w.contains(c)
      x <- ns; y <- ns if x < y
    } yield ((x, y), w(c))
    val edgeSet = edges.toSet
    val ref = cand.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.size.toLong)).toSeq
      .filterNot { case ((x, y), _) => edgeSet.contains((x, y)) }
      .map { case ((x, y), (aa, nc)) => (x, y, aa, nc) }
      .sortBy { case (x, y, aa, _) => (-aa, x, y) }.take(20)
    val got = q("graph_adamic_adar").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sf0.001's co-occurrence graph has no non-edge wedge pairs (both
    // sides empty — same as graph_resource_allocation's spec); the
    // sf0.01/sf0.1 oracle gate covers the populated case, and the
    // hand-traced graph below covers the arithmetic
    assert(got.length == ref.length)
    got.zip(ref).foreach { case (g, r) => assert(g == r, s"$g != $r") }
    // star 5—{1,2,3} plus edge 1—2: center 5 (deg 3) wedges (1,2), (1,3),
    // (2,3); (1,2) is an edge; centers 1 and 2 (deg 2) wedge only real
    // edges. Expect exactly (1,3) and (2,3) at w = 1e12 div li(3)
    import spark.implicits._
    val fixEdges = Seq((5L, 1L), (5L, 2L), (5L, 3L), (1L, 2L)).toDF("a", "b")
    val out = graft.ops.Graph.aaCore(fixEdges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val w5 = 1000000000000L / li(3.0)
    assert(out.toSeq == Seq((1L, 3L, w5, 1L), (2L, 3L, w5, 1L)),
      out.mkString(","))
  }

  test("pipeline_train_classifier: converges to zero errors on a separable corpus") {
    // one-token classes in distinct hash buckets — linearly separable, so
    // the batch perceptron must fit it after epoch 1 and stay fixed
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_train_sep"
    Seq((0L, "aa", "en", "s0", 2L), (1L, "bb", "de", "s0", 2L),
        (2L, "aa", "en", "s0", 2L), (3L, "bb", "de", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("pipeline_train_classifier")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // epoch 1: w=0 misclassifies all 4; update w[b(aa)]=+2, w[b(bb)]=-2,
    // bias 0. epochs 2-3: every doc correct, model frozen.
    assert(rows.toSeq == Seq((1, 4L, 4L, 0L), (2, 0L, 4L, 0L), (3, 0L, 4L, 0L)),
      rows.mkString(","))
  }

  test("sim_rrf_fusion: exact match vs plain-Scala RRF over both lists") {
    // lexical top-20 (doc 0 excluded): the same scaled-int BM25 reference
    // as the text_bm25_search test above
    val terms = Seq("hash", "join", "stream")
    val n = docs.length.toLong
    val avgdl = docs.map(_._3.length.toLong).sum.toDouble / n.toDouble
    val dfm = terms.map(t => t -> docs.count(_._3.contains(t)).toLong).toMap
    val lexScores = docs.flatMap { case (id, _, tk) =>
      val scores = terms.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idfS = math.floor(math.log(
            (n.toDouble - dfm(t).toDouble + 0.5) / (dfm(t).toDouble + 0.5) + 1.0)
            * 1e6 + 0.5).toLong
          val frac = (tf.toDouble * 2.2) /
            (tf.toDouble + 1.2 * (0.25 + 0.75 * (tk.length.toDouble / avgdl)))
          Some(math.floor(idfS.toDouble * frac + 0.5).toLong)
        }
      }
      if (scores.isEmpty || id == 0L) None else Some((id, scores.sum))
    }
    val lexRank = lexScores.sortBy { case (id, sc) => (-sc, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // dense top-20 (vec 0 = the query): sequential-fold cosine, the same
    // element order as the codegen expression / DuckDB list_sum
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = vecs.find(_._1 == 0L).get._2
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val denseRank = vecs.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, dot(v, qv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(qv, qv)))) }
      .sortBy { case (id, c) => (-c, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // RRF fuse: 1e9 div (60 + rank), absent list = 0
    val ref = (lexRank.keySet ++ denseRank.keySet).toSeq
      .map { id =>
        val lr = lexRank.getOrElse(id, 0L)
        val dr = denseRank.getOrElse(id, 0L)
        val s = (if (lr > 0) 1000000000L / (60L + lr) else 0L) +
          (if (dr > 0) 1000000000L / (60L + dr) else 0L)
        (id, lr, dr, s)
      }
      .sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    val got = q("sim_rrf_fusion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == ref, s"got=${got.mkString(",")}\nref=${ref.mkString(",")}")
  }
}
