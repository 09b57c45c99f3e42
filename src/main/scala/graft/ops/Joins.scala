package graft.ops

import graft.util.Canon._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join surface — SURVEY.md §2.3. Scale posture (§4.3): the as-of join is the
  * union+window plan (one shuffle, no range explosion), the banded theta join
  * is bucketized into an equi-join (no BroadcastNestedLoop at scale), and the
  * interval join is equi on the series key with a residual range predicate.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  private val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  private val joinInnerEqui: Q = (s, d) =>
    tbl(s, d, "lineitem")
      .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sumMoney(revenue).as("revenue"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  private val joinBroadcast: Q = (s, d) =>
    tbl(s, d, "lineitem")
      .join(broadcast(tbl(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(sumMoney(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n"))
      .orderBy("p_type")

  /** Join-strategy HINT surface — the per-query physical-operator control
    * a 100 TB tuner reaches for when AQE's size estimates are wrong: the
    * same supplier⋈nation equi-join under each hint. This id ships the
    * SHUFFLE_HASH arm (the strategy Spark never picks by default at
    * these sizes — proof the hint, not the planner, chose it);
    * JoinHintSpec pins all three hints to their physical nodes
    * (BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin) and equates
    * the three row sets. Hints change the HOW, never the WHAT. */
  private[graft] def joinHinted(s: SparkSession, d: String,
      hint: String): DataFrame =
    tbl(s, d, "supplier").hint(hint)
      .join(tbl(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_sup"),
        sumMoney(col("s_acctbal")).as("acctbal_sum"))
      .orderBy("n_name")

  private val joinHintStrategies: Q = (s, d) =>
    joinHinted(s, d, "shuffle_hash")

  private val joinLeftOuter: Q = (s, d) =>
    tbl(s, d, "customer")
      .join(tbl(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        (coalesce(sum(cents(col("o_totalprice"))), lit(0L)) / 100.0).as("total"))
      .orderBy("c_custkey")

  private val joinRightOuter: Q = (s, d) =>
    tbl(s, d, "orders")
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        (coalesce(sum(cents(col("o_totalprice"))), lit(0L)) / 100.0).as("total"))
      .orderBy("c_custkey")

  private val joinFullOuter: Q = (s, d) => {
    val cn = tbl(s, d, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = tbl(s, d, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nk"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nk")
  }

  private val joinLeftSemi: Q = (s, d) =>
    tbl(s, d, "orders")
      .join(tbl(s, d, "lineitem").where(col("l_discount") > 0.09),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  private val joinLeftAnti: Q = (s, d) =>
    tbl(s, d, "customer")
      .join(tbl(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  private val joinCross: Q = (s, d) =>
    tbl(s, d, "region").select("r_name")
      .crossJoin(tbl(s, d, "nation").select("n_name"))
      .orderBy("r_name", "n_name")

  /** Banded theta join, bucketized (§4.3.2): equi-join on floor(price/width)
    * buckets (probe side explodes its band into the covering buckets), then
    * the exact band predicate. Catalyst plans a shuffle hash/SMJ equi-join
    * instead of an O(n·m) BroadcastNestedLoopJoin — the 100 TB-safe shape. */
  private val joinThetaRange: Q = (s, d) => {
    val width = 10.0
    val parts = tbl(s, d, "part")
      .withColumn("bucket", floor(col("p_retailprice") / width).cast("long"))
    val lines = tbl(s, d, "lineitem")
      .withColumn("lo", col("l_extendedprice") * 0.999)
      .withColumn("hi", col("l_extendedprice") * 1.001)
      .withColumn("bucket",
        explode(sequence(floor(col("lo") / width).cast("long"),
          floor(col("hi") / width).cast("long"))))
    parts.join(lines, Seq("bucket"))
      .where(col("p_retailprice").between(col("lo"), col("hi")))
      .groupBy(col("p_partkey"))
      .agg(count(lit(1)).as("n_match"), sumMoney(col("l_extendedprice")).as("matched_total"))
      .orderBy("p_partkey")
  }

  /** Interval overlap join: signup events open a 1h window; count events of
    * the same user falling inside [start, start+1h). Equi on user_id + range
    * residual — shuffles once on the series key. */
  private val joinInterval: Q = (s, d) => {
    val ev = tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
    val iv = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("iu"), col("event_id").as("interval_id"),
        col("tsm").as("start"))
      .withColumn("end", col("start") + expr("INTERVAL 1 HOUR"))
    val e2 = ev.select(col("user_id").as("eu"), col("tsm").as("et"))
    iv.join(e2, col("eu") === col("iu") &&
        col("et") >= col("start") && col("et") < col("end"))
      .groupBy(col("iu").as("user_id"), col("interval_id"))
      .agg(count(lit(1)).as("n_in"))
      .orderBy("user_id", "interval_id")
  }

  /** As-of join (§4.3.1): for each purchase, the last click value at-or-before
    * its timestamp, per user. Union-tag both sides, single window pass with
    * last(ignoreNulls) — one shuffle on the series key, linear at 100 TB.
    * DuckDB oracle uses its native ASOF LEFT JOIN. */
  private val joinAsof: Q = (s, d) => {
    val ev = tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
    val ref = ev.where(col("event_type") === "click").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      col("value").as("click_value"), lit(0).as("side"),
      lit(null).cast("double").as("purchase_value"))
    val probe = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      lit(null).cast("double").as("click_value"), lit(1).as("side"),
      col("value").as("purchase_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ref.unionByName(probe)
      .withColumn("last_click_value",
        coalesce(last(col("click_value"), ignoreNulls = true).over(w), lit(-1.0)))
      .where(col("side") === 1)
      .select("user_id", "event_id", "ts", "purchase_value", "last_click_value")
      .orderBy("user_id", "event_id")
  }

  /** FORWARD as-of join: for each purchase, the FIRST click at-or-after its
    * timestamp — the other direction every as-of API exposes (backward /
    * forward / nearest; nearest = coalesce of these two by gap). Same
    * union-tag + single window pass, frame flipped to CURRENT→FOLLOWING;
    * at equal ts the ref row sorts after the probe (side desc) so the match
    * is inclusive. DuckDB oracle: native ASOF with p.ts <= c.cts. */
  private val joinAsofForward: Q = (s, d) => {
    val ev = tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
    val ref = ev.where(col("event_type") === "click").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      col("value").as("click_value"), lit(0).as("side"),
      lit(null).cast("double").as("purchase_value"))
    val probe = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      lit(null).cast("double").as("click_value"), lit(1).as("side"),
      col("value").as("purchase_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), desc("side"), col("event_id"))
      .rowsBetween(0, Window.unboundedFollowing)
    ref.unionByName(probe)
      .withColumn("next_click_value",
        coalesce(first(col("click_value"), ignoreNulls = true).over(w), lit(-1.0)))
      .where(col("side") === 1)
      .select("user_id", "event_id", "ts", "purchase_value", "next_click_value")
      .orderBy("user_id", "event_id")
  }

  /** NEAREST as-of join: the click closest in time in either direction
    * (tie → backward) — completing the backward/forward/nearest direction
    * triple. One hash shuffle on user_id feeds two sort-window passes
    * (backward-inclusive and forward-inclusive), then the smaller gap wins.
    * DuckDB oracle: two native ASOF joins + the same CASE. */
  private val joinAsofNearest: Q = (s, d) => {
    val ev = tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
    val ref = ev.where(col("event_type") === "click").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      col("value").as("click_value"), lit(0).as("side"),
      lit(null).cast("double").as("purchase_value"))
    val probe = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      lit(null).cast("double").as("click_value"), lit(1).as("side"),
      col("value").as("purchase_value"))
    val wB = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy("user_id")
      .orderBy(col("ts"), desc("side"), col("event_id"))
      .rowsBetween(0, Window.unboundedFollowing)
    val clickTs = when(col("side") === 0, col("ts"))
    val gapB = unix_millis(col("ts")) - unix_millis(col("b_ts"))
    val gapF = unix_millis(col("f_ts")) - unix_millis(col("ts"))
    ref.unionByName(probe)
      .withColumn("b_v", last(col("click_value"), ignoreNulls = true).over(wB))
      .withColumn("b_ts", last(clickTs, ignoreNulls = true).over(wB))
      .withColumn("f_v", first(col("click_value"), ignoreNulls = true).over(wF))
      .withColumn("f_ts", first(clickTs, ignoreNulls = true).over(wF))
      .where(col("side") === 1)
      .withColumn("nearest_click_value",
        when(col("b_ts").isNull && col("f_ts").isNull, lit(-1.0))
          .when(col("f_ts").isNull, col("b_v"))
          .when(col("b_ts").isNull, col("f_v"))
          .when(gapB <= gapF, col("b_v"))
          .otherwise(col("f_v")))
      .select("user_id", "event_id", "ts", "purchase_value", "nearest_click_value")
      .orderBy("user_id", "event_id")
  }

  /** TOLERANCE-bounded backward as-of join: the latest click at or before
    * each purchase counts only within a 1-hour window — the `tolerance`
    * knob every as-of API carries (a match staler than the bound is no
    * match). Same single hash shuffle + one window pass as join_asof; the
    * matched ref timestamp rides along so the gap test is one codegen
    * comparison, never a second join. DuckDB oracle: native ASOF LEFT JOIN
    * + the identical gap CASE. */
  private val joinAsofTolerance: Q = (s, d) => {
    val ev = tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
    val ref = ev.where(col("event_type") === "click").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      col("value").as("click_value"), lit(0).as("side"),
      lit(null).cast("double").as("purchase_value"))
    val probe = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("tsm").as("ts"), col("event_id"),
      lit(null).cast("double").as("click_value"), lit(1).as("side"),
      col("value").as("purchase_value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val clickTs = when(col("side") === 0, col("ts"))
    ref.unionByName(probe)
      .withColumn("b_v", last(col("click_value"), ignoreNulls = true).over(w))
      .withColumn("b_ts", last(clickTs, ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .withColumn("last_click_value_1h",
        when(col("b_ts").isNull ||
            unix_millis(col("ts")) - unix_millis(col("b_ts")) > 3600000L,
          lit(-1.0)).otherwise(col("b_v")))
      .select("user_id", "event_id", "ts", "purchase_value",
        "last_click_value_1h")
      .orderBy("user_id", "event_id")
  }

  /** The same as-of semantics through the NATIVE custom operator
    * (graft.plans.AsOfJoin: LogicalPlan + Strategy + merge SparkPlan) —
    * one exchange + sort per side, O(1)-state streaming merge. Must
    * hash-match the same oracle as the union-window formulation. */
  private val joinAsofNative: Q = (s, d) => {
    val ev = tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
    val probe = ev.where(col("event_type") === "purchase").select(
      col("user_id"), col("event_id"), col("tsm").as("ts"),
      col("value").as("purchase_value"), unix_millis(col("tsm")).as("p_ems"))
    val ref = ev.where(col("event_type") === "click").select(
      col("user_id").as("r_user"), unix_millis(col("tsm")).as("r_ems"),
      col("value").as("click_value"))
    graft.plans.AsOfJoin.join(s, probe, ref, "user_id", "p_ems", "r_user", "r_ems")
      .select(col("user_id"), col("event_id"), col("ts"), col("purchase_value"),
        coalesce(col("click_value"), lit(-1.0)).as("last_click_value"))
      .orderBy("user_id", "event_id")
  }

  /** TPC-H Q3-style shipping priority: top-10 undelivered orders by revenue
    * for one market segment — the canonical 3-way join + agg + global top-k
    * composition (BUILDING segment; o_orderpriority stands in for
    * o_shippriority, absent from this schema). Plans as two joins (customer
    * broadcast) → partial/final agg → TakeOrderedAndProject. */
  private val tpchQ3: Q = (s, d) => {
    val cust = tbl(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = tbl(s, d, "orders")
      .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = tbl(s, d, "lineitem")
      .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 100.0)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local supplier volume: revenue per nation where customer
    * and supplier share the nation, one region, one year — the 6-table join
    * chain with two broadcast dims. */
  private val tpchQ5: Q = (s, d) => {
    val ord = tbl(s, d, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    tbl(s, d, "lineitem")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(tbl(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(tbl(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(tbl(s, d, "region")),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 100.0)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** TPC-H Q10-style returned-item reporting: top-20 customers by revenue
    * lost to returns in a quarter. */
  private val tpchQ10: Q = (s, d) => {
    val ord = tbl(s, d, "orders")
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    tbl(s, d, "lineitem").where(col("l_returnflag") === "R")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg((sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 100.0)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q6-style forecast-revenue-change: one predicate-pushed scan, one
    * partial+final global aggregate — the canonical "filters must reach the
    * parquet reader" exhibit (no join, no shuffle beyond the 1-row agg). */
  private val tpchQ6: Q = (s, d) =>
    tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice") * col("l_discount"))) / 100.0)
        .as("revenue"), count(lit(1)).as("n"))

  /** TPC-H Q14-style promotion effect: month of lineitem ⋈ broadcast part,
    * promo revenue share as a ratio of two exact cent sums divided once
    * (fixture p_type domain is single-word, so the predicate is equality,
    * not LIKE 'PROMO%'). */
  private val tpchQ14: Q = (s, d) => {
    val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .join(broadcast(tbl(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .agg(r4(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))).cast("double") /
        sum(rev).cast("double")).as("promo_revenue"))
  }

  /** TPC-H Q18-style large-volume customers: the HAVING-subquery becomes a
    * pre-aggregated key filter applied as a broadcast LEFT SEMI join before
    * the fact re-join — at 100 TB the qualifying-order set is the small
    * side, so the fact table is filtered at the scan instead of shuffling
    * everything into the subquery compare. Quantity sums ride as exact
    * cents so the 180-unit threshold is an integer comparison. */
  private val tpchQ18: Q = (s, d) => {
    val big = tbl(s, d, "lineitem").groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_quantity"))).as("qc"))
      .where(col("qc") > 180L * 100)
      .select(col("l_orderkey").as("bk"))
    tbl(s, d, "lineitem")
      .join(broadcast(big), col("l_orderkey") === col("bk"), "left_semi")
      .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg((sum(cents(col("l_quantity"))) / 100.0).as("sum_qty"))
      .orderBy(desc("o_totalprice"), asc("o_orderdate"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q7-style volume shipping between two nations: both endpoints
    * restricted to a 2-nation slice, so the nation dimension broadcasts and
    * the pair filter (supp ≠ cust) lands after the equi-joins. Year is cast
    * to long so Spark's INT and DuckDB's BIGINT agree on schema. */
  private val tpchQ7: Q = (s, d) => {
    val nat = tbl(s, d, "nation").where(col("n_name").isin("NATION_3", "NATION_7"))
    val cn = broadcast(nat.select(col("n_nationkey").as("cnk"),
      col("n_name").as("cust_nation")))
    val sn = broadcast(nat.select(col("n_nationkey").as("snk"),
      col("n_name").as("supp_nation")))
    tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(cn, col("c_nationkey") === col("cnk"))
      .join(sn, col("s_nationkey") === col("snk"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(cents(revenue)) / 100.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-style market share: of the revenue a region's customers
    * generate, what fraction is supplied by one nation, per year. Both
    * nation roles broadcast (the dimension is 25 rows); numerator and
    * denominator fold in ONE aggregate pass as conditional exact-cent sums
    * — never two scans or a self-join of the fact table. */
  private val tpchQ8: Q = (s, d) => {
    val custNat = broadcast(tbl(s, d, "nation").where(col("n_regionkey") === 0)
      .select(col("n_nationkey").as("cnk")))
    val suppNat = broadcast(tbl(s, d, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
    tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(tbl(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(custNat, col("c_nationkey") === col("cnk"))
      .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(suppNat, col("s_nationkey") === col("snk"))
      .groupBy(year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_3", cents(revenue))
          .otherwise(lit(0L))).as("num"),
        sum(cents(revenue)).as("den"))
      .select(col("o_year"),
        r4(col("num").cast("double") / col("den").cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q17-style small-quantity revenue: parts of one brand whose
    * order quantity sits below 20% of that part's own average. The
    * correlated scalar subquery becomes a per-part aggregate joined back —
    * and the aggregate's input is pre-filtered by a broadcast semi-join on
    * the brand slice, so the per-part stats are only computed for the 1/25
    * of parts that can match (the 100 TB shape; quantities are
    * integer-valued doubles, so the average is exact on both engines). */
  private val tpchQ17: Q = (s, d) => {
    val brandParts = broadcast(tbl(s, d, "part")
      .where(col("p_brand") === "Brand#12").select(col("p_partkey")))
    val li = tbl(s, d, "lineitem")
      .join(brandParts, col("l_partkey") === col("p_partkey"), "left_semi")
    val avgQ = li.groupBy(col("l_partkey").as("ak"))
      .agg(avg(col("l_quantity")).as("aq"))
    li.join(broadcast(avgQ), col("l_partkey") === col("ak"))
      .where(col("l_quantity") < lit(0.2) * col("aq"))
      .agg((sum(cents(col("l_extendedprice"))) / 100.0 / 7.0).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q13-style customer order-count distribution: the one TPC-H query
    * whose outer join KEEPS the unmatched side (zero-order customers must
    * survive into the c_count=0 bucket), then a second tiny agg over the
    * counts. The priority filter rides the join condition (applied to
    * orders before the left join — same semantics, and it prunes the
    * shuffle's probe side instead of post-filtering matched rows). */
  private val tpchQ13: Q = (s, d) => {
    val perCust = tbl(s, d, "customer")
      .join(tbl(s, d, "orders").where(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q15-style top supplier: the revenue view aggregates once, then the
    * max-revenue scalar subquery becomes a 1-row broadcast equi-join on the
    * exact cent total (ties kept, per spec) — no full-table window, no
    * driver-side collect of the view. */
  private val tpchQ15: Q = (s, d) => {
    val rev = tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(revenue)).as("revc"))
    rev.join(broadcast(rev.agg(max(col("revc")).as("maxc"))),
        col("revc") === col("maxc"))
      .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("revc") / 100.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q19-style disjunctive predicate pushdown: three (brand, size,
    * quantity) bands OR-ed together across both join sides. Catalyst
    * extracts the per-side common disjuncts (l_quantity ∈ [1,30] onto the
    * scan, p_brand ∈ set onto the broadcast build) so the OR does not defeat
    * pushdown — the exhibit this query exists for. */
  private val tpchQ19: Q = (s, d) => {
    def band(brand: String, qlo: Int, qhi: Int, slo: Int, shi: Int) =
      col("p_brand") === brand && col("l_quantity").between(qlo, qhi) &&
        col("p_size").between(slo, shi)
    tbl(s, d, "lineitem")
      .join(broadcast(tbl(s, d, "part")), col("l_partkey") === col("p_partkey"))
      .where(band("Brand#12", 1, 11, 1, 5) || band("Brand#23", 10, 20, 1, 10) ||
        band("Brand#15", 20, 30, 1, 15))
      .agg((sum(cents(revenue)) / 100.0).as("revenue"), count(lit(1)).as("n"))
  }

  // ---- round-6 additions: the remaining TPC-H family, adapted to this
  // schema (no partsupp table, no commit/receipt dates, no c_phone — each
  // stand-in is named in the query's scaladoc, same convention as Q3's
  // o_orderpriority-for-o_shippriority).

  /** TPC-H Q2-style min-cost supplier: per size-15 part, the region-0
    * supplier with the LOWEST account balance among suppliers who shipped it
    * (s_acctbal stands in for ps_supplycost; the supply relation is the
    * distinct (part, supplier) pairs observed in lineitem since partsupp is
    * absent). The correlated-min subquery becomes a per-part MIN window
    * over the already-filtered supply relation — ONE pass (an aggregate
    * joined back would re-plan, and re-scan, the whole distinct subtree
    * twice: measured in the round-6 plan audit); ties kept, per spec.
    * Window groups are suppliers-per-part — bounded, never corpus-sized. */
  private val tpchQ2: Q = (s, d) => {
    val regSupp = tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation").where(col("n_regionkey") === 0)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        cents(col("s_acctbal")).as("bal_c"))
    val supply = tbl(s, d, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(tbl(s, d, "part").where(col("p_size") === 15)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .join(regSupp, col("l_suppkey") === col("s_suppkey"))
    supply
      .withColumn("min_c", min(col("bal_c"))
        .over(Window.partitionBy(col("p_partkey"))))
      .where(col("bal_c") === col("min_c"))
      .select((col("bal_c") / 100.0).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_type"))
      .orderBy(desc("s_acctbal"), asc("s_name"), asc("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q4-style order priority checking: orders in a quarter with at
    * least one returned line (l_returnflag = 'R' stands in for the absent
    * l_commitdate < l_receiptdate late-delivery test), counted per priority.
    * The EXISTS becomes a LEFT SEMI join — the probe side never duplicates
    * however many lines match. */
  private val tpchQ4: Q = (s, d) =>
    tbl(s, d, "orders")
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .join(tbl(s, d, "lineitem").where(col("l_returnflag") === "R")
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** TPC-H Q9-style product-type profit by nation and year: profit =
    * revenue − unit-cost·quantity where unit cost is 10% of p_retailprice
    * (ps_supplycost stand-in), both sides carried as exact cents so the
    * subtraction and sum are integer-exact on both engines. One pass:
    * fact ⋈ broadcast part slice ⋈ supplier ⋈ broadcast nation. */
  private val tpchQ9: Q = (s, d) => {
    val profit = cents(revenue) -
      cents(col("p_retailprice") * col("l_quantity") * 0.1)
    tbl(s, d, "lineitem")
      .join(broadcast(tbl(s, d, "part").where(col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(tbl(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(tbl(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("o_year"))
      .agg((sum(profit) / 100.0).as("sum_profit"))
      .orderBy(asc("nation"), desc("o_year"))
  }

  /** TPC-H Q11-style important stock: per-part shipped value for a 13-nation
    * supplier slice, kept where the part's value exceeds 1.5× the MEAN
    * per-part value (TPC-H scales its 0.01% fraction by 1/SF for exactly
    * this reason — a fixed fraction degenerates to all-or-nothing as the
    * part count grows; the mean-relative form is scale-free). The
    * total+count scalar subquery is a 1-row broadcast and the threshold
    * compare stays INTEGER (vc·np·2 > tot·3; ≤ ~2.4e15 at sf0.1, far inside
    * BIGINT) — bit-identical on both engines. */
  private val tpchQ11: Q = (s, d) => {
    val supp = broadcast(tbl(s, d, "supplier")
      .where(col("s_nationkey") < 13).select(col("s_suppkey")))
    val perPart = tbl(s, d, "lineitem")
      .join(supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("vc"))
    perPart.crossJoin(broadcast(perPart
        .agg(sum(col("vc")).as("tot"), count(lit(1)).as("np"))))
      .where(col("vc") * col("np") * 2 > col("tot") * 3)
      .select(col("l_partkey"), (col("vc") / 100.0).as("value"))
      .orderBy(desc("value"), asc("l_partkey"))
  }

  /** TPC-H Q12-style shipping-priority bands: lines shipped in a year,
    * bucketed by l_linestatus (l_shipmode stand-in), with urgent/non-urgent
    * order counts folded into ONE conditional aggregate pass — never two
    * scans. */
  private val tpchQ12: Q = (s, d) => {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(tbl(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q16-style parts/supplier relationship: distinct supplier count
    * per (brand, type, size) over a size set, excluding one brand + one type
    * and excluding negative-balance suppliers (the customer-complaints
    * NOT IN stand-in) via a broadcast LEFT ANTI join. Supply pairs come from
    * lineitem (partsupp absent) — one distinct + one broadcast-pruned agg. */
  private val tpchQ16: Q = (s, d) => {
    val parts = broadcast(tbl(s, d, "part")
      .where(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
    val badSupp = broadcast(tbl(s, d, "supplier").where(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("bad_k")))
    tbl(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(badSupp, col("l_suppkey") === col("bad_k"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))
  }

  /** TPC-H Q20-style dominant suppliers: region-1 suppliers who shipped
    * MORE THAN HALF of some SMALL-type part's total 1997 volume (the
    * ps_availqty > 0.5·shipped test inverted onto the supply side, partsupp
    * absent). Quantities ride as exact cents and the share test is integer
    * (sq·2 > tq). Per-(part, supplier) and per-part aggregates are both
    * bounded by the part slice — dimension-sized, broadcastable. */
  private val tpchQ20: Q = (s, d) => {
    val smallParts = broadcast(tbl(s, d, "part")
      .where(col("p_type") === "SMALL").select(col("p_partkey")))
    val perSupp = tbl(s, d, "lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(cents(col("l_quantity"))).as("sq"))
    val perPart = perSupp.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("sq")).as("tq"))
    val qualifying = perSupp
      .join(broadcast(perPart), col("l_partkey") === col("pk"))
      .where(col("sq") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
    tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation").where(col("n_regionkey") === 1)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(broadcast(qualifying),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_name", "s_suppkey")
  }

  /** TPC-H Q21-style suppliers who kept orders waiting: region-0..2
    * suppliers (the spec's single nation is too thin at sf0.001 — 10
    * suppliers across 25 nations) whose returned line (l_returnflag = 'R',
    * the late-delivery stand-in)
    * was the ONLY return in a finished multi-supplier order. The correlated
    * EXISTS / NOT EXISTS pair becomes one per-order aggregate — distinct
    * suppliers and distinct RETURNING suppliers counted in a single pass —
    * joined to the candidate lines: exists(other supplier) ⇔ n_supp ≥ 2,
    * not-exists(other returning supplier) ⇔ n_r_supp = 1 (the candidate's
    * own return is the one). The DuckDB oracle states it as literal
    * EXISTS/NOT EXISTS, so the rewrite is verified, not assumed. */
  private val tpchQ21: Q = (s, d) => {
    val li = tbl(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val ordStats = li.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("n_r_supp"))
    val natSupp = broadcast(tbl(s, d, "supplier")
      .join(broadcast(tbl(s, d, "nation").where(col("n_regionkey") < 3)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name")))
    li.where(col("l_returnflag") === "R")
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("s_name")).distinct()
      .join(tbl(s, d, "orders").where(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(ordStats, col("l_orderkey") === col("ok"))
      .where(col("n_supp") >= 2 && col("n_r_supp") === 1)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)
  }

  /** TPC-H Q22-style global sales opportunity: customers of a 7-nation
    * slice (c_nationkey stands in for the absent phone country code) with
    * above-average positive balances and NO urgent orders (the NOT EXISTS
    * → LEFT ANTI join). The average is a 1-row broadcast computed as exact
    * cent sum / count, divided identically on both engines. */
  private val tpchQ22: Q = (s, d) => {
    val cust = tbl(s, d, "customer").where(col("c_nationkey") < 7)
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bal_c"))
    val avgPos = cust.where(col("bal_c") > 0)
      .agg((sum(col("bal_c")).cast("double") / count(lit(1))).as("avg_c"))
    cust.crossJoin(broadcast(avgPos))
      .where(col("bal_c").cast("double") > col("avg_c"))
      .join(tbl(s, d, "orders").where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), (sum(col("bal_c")) / 100.0).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Consecutive-event pairing: self-join semantics expressed as a window lag
    * to stay shuffle-lean (§2.3 join_self). */
  private val joinSelf: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("tsm"), col("event_id"))
    tbl(s, d, "events").withColumn("tsm", tsMs(col("ts")))
      .select(col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        (col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0))).as("delta"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, Q] = Map(
    "join_inner_equi" -> joinInnerEqui,
    "join_broadcast" -> joinBroadcast,
    "join_hint_strategies" -> joinHintStrategies,
    "join_left_outer" -> joinLeftOuter,
    "join_right_outer" -> joinRightOuter,
    "join_full_outer" -> joinFullOuter,
    "join_left_semi" -> joinLeftSemi,
    "join_left_anti" -> joinLeftAnti,
    "join_cross" -> joinCross,
    "join_theta_range" -> joinThetaRange,
    "join_interval" -> joinInterval,
    "join_asof" -> joinAsof,
    "join_asof_forward" -> joinAsofForward,
    "join_asof_nearest" -> joinAsofNearest,
    "join_asof_native" -> joinAsofNative,
    "join_asof_tolerance" -> joinAsofTolerance,
    "join_self" -> joinSelf,
    "tpch_q2" -> tpchQ2,
    "tpch_q3" -> tpchQ3,
    "tpch_q4" -> tpchQ4,
    "tpch_q5" -> tpchQ5,
    "tpch_q6" -> tpchQ6,
    "tpch_q9" -> tpchQ9,
    "tpch_q11" -> tpchQ11,
    "tpch_q12" -> tpchQ12,
    "tpch_q16" -> tpchQ16,
    "tpch_q20" -> tpchQ20,
    "tpch_q21" -> tpchQ21,
    "tpch_q22" -> tpchQ22,
    "tpch_q7" -> tpchQ7,
    "tpch_q8" -> tpchQ8,
    "tpch_q10" -> tpchQ10,
    "tpch_q13" -> tpchQ13,
    "tpch_q14" -> tpchQ14,
    "tpch_q15" -> tpchQ15,
    "tpch_q17" -> tpchQ17,
    "tpch_q18" -> tpchQ18,
    "tpch_q19" -> tpchQ19,
  )

  private val revSql =
    "sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT))/100.0"

  /** Shared by both as-of formulations — they must agree with each other
    * AND with DuckDB's native ASOF JOIN. */
  private val asofOracle =
    """SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
              coalesce(c.click_value, -1.0) AS last_click_value
       FROM (SELECT user_id, event_id, date_trunc('millisecond', ts) AS ts,
                    value AS purchase_value
             FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN
            (SELECT user_id AS cu, date_trunc('millisecond', ts) AS cts,
                    value AS click_value
             FROM events WHERE event_type = 'click') c
         ON p.user_id = c.cu AND p.ts >= c.cts
       ORDER BY p.user_id, p.event_id"""

  val oracle: Map[String, String] = Map(
    "join_inner_equi" ->
      s"""SELECT c_mktsegment, $revSql AS revenue, count(*) AS n
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                        JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "join_hint_strategies" ->
      """SELECT n_name, count(*) AS n_sup,
                sum(CAST(floor(s_acctbal*100 + 0.5) AS BIGINT))/100.0
                  AS acctbal_sum
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "join_broadcast" ->
      """SELECT p_type,
                sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/100.0 AS revenue,
                count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_type ORDER BY p_type""",
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)), 0)/100.0 AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "join_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                coalesce(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)), 0)/100.0 AS total
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "join_full_outer" ->
      """SELECT coalesce(c_nationkey, s_nationkey) AS nk,
                coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
         FULL OUTER JOIN
              (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
         ON c_nationkey = s_nationkey ORDER BY nk""",
    "join_left_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_discount > 0.09)
         ORDER BY o_orderkey""",
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "join_theta_range" ->
      """SELECT p_partkey, count(*) AS n_match,
                sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/100.0 AS matched_total
         FROM part JOIN lineitem
           ON p_retailprice BETWEEN l_extendedprice*0.999 AND l_extendedprice*1.001
         GROUP BY p_partkey ORDER BY p_partkey""",
    "join_interval" ->
      """SELECT i.user_id, i.interval_id, count(*) AS n_in
         FROM (SELECT user_id, event_id AS interval_id,
                      date_trunc('millisecond', ts) AS s
               FROM events WHERE event_type = 'signup') i
         JOIN (SELECT user_id AS eu, date_trunc('millisecond', ts) AS et
               FROM events) e
           ON e.eu = i.user_id AND e.et >= i.s AND e.et < i.s + INTERVAL 1 HOUR
         GROUP BY i.user_id, i.interval_id ORDER BY i.user_id, i.interval_id""",
    "tpch_q2" ->
      """WITH supply AS (
           SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         rs AS (
           SELECT s_suppkey, s_name, n_name,
                  CAST(floor(s_acctbal*100 + 0.5) AS BIGINT) AS bal_c
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           WHERE n_regionkey = 0),
         sp AS (
           SELECT p_partkey, p_type, bal_c, s_name, n_name
           FROM supply
           JOIN part ON l_partkey = p_partkey
           JOIN rs ON l_suppkey = s_suppkey
           WHERE p_size = 15)
         SELECT bal_c/100.0 AS s_acctbal, s_name, n_name, p_partkey, p_type
         FROM sp
         WHERE bal_c = (SELECT min(bal_c) FROM sp s2
                        WHERE s2.p_partkey = sp.p_partkey)
         ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100""",
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1997-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q9" ->
      """SELECT n_name AS nation, year(l_shipdate) AS o_year,
                sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT)
                    - CAST(floor(p_retailprice*l_quantity*0.1*100 + 0.5) AS BIGINT))
                  /100.0 AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_type = 'STANDARD'
         GROUP BY 1, 2 ORDER BY 1 ASC, 2 DESC""",
    "tpch_q11" ->
      """WITH pp AS (
           SELECT l_partkey,
                  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS vc
           FROM lineitem
           WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                               WHERE s_nationkey < 13)
           GROUP BY l_partkey),
         st AS (SELECT CAST(sum(vc) AS BIGINT) AS tot, count(*) AS np FROM pp)
         SELECT l_partkey, vc/100.0 AS value
         FROM pp, st WHERE vc*np*2 > tot*3
         ORDER BY value DESC, l_partkey""",
    "tpch_q12" ->
      """SELECT l_linestatus,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY l_linestatus ORDER BY l_linestatus""",
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sup
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_q20" ->
      """WITH li AS (
           SELECT l_partkey, l_suppkey,
                  CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qc
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
             AND l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_type = 'SMALL')),
         ps AS (SELECT l_partkey, l_suppkey, CAST(sum(qc) AS BIGINT) AS sq
                FROM li GROUP BY 1, 2),
         pt AS (SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
                FROM ps GROUP BY 1)
         SELECT s_suppkey, s_name FROM supplier
         WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                               WHERE n_regionkey = 1)
           AND s_suppkey IN (SELECT l_suppkey FROM ps
                             JOIN pt USING (l_partkey) WHERE sq*2 > tq)
         ORDER BY s_name, s_suppkey""",
    "tpch_q21" ->
      """WITH cand AS (
           SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
           FROM lineitem l1
           WHERE l1.l_returnflag = 'R'
             AND l1.l_suppkey IN (SELECT s_suppkey FROM supplier
                                  JOIN nation ON s_nationkey = n_nationkey
                                  WHERE n_regionkey < 3)
             AND l1.l_orderkey IN (SELECT o_orderkey FROM orders
                                   WHERE o_orderstatus = 'F')
             AND EXISTS (SELECT 1 FROM lineitem l2
                         WHERE l2.l_orderkey = l1.l_orderkey
                           AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (SELECT 1 FROM lineitem l3
                             WHERE l3.l_orderkey = l1.l_orderkey
                               AND l3.l_suppkey <> l1.l_suppkey
                               AND l3.l_returnflag = 'R'))
         SELECT s_name, count(*) AS numwait
         FROM cand JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "tpch_q22" ->
      """WITH cust AS (
           SELECT c_custkey, c_nationkey,
                  CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c
           FROM customer WHERE c_nationkey < 7),
         a AS (SELECT CAST(CAST(sum(bal_c) AS BIGINT) AS DOUBLE)/count(*)
                 AS avg_c
               FROM cust WHERE bal_c > 0)
         SELECT c_nationkey, count(*) AS numcust,
                CAST(sum(bal_c) AS BIGINT)/100.0 AS totacctbal
         FROM cust, a
         WHERE CAST(bal_c AS DOUBLE) > avg_c
           AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $revSql AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q5" ->
      s"""SELECT n_name, $revSql AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, n_name, $revSql AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
          GROUP BY c_custkey, c_name, n_name
          ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q6" ->
      """SELECT sum(CAST(floor(l_extendedprice*l_discount*100 + 0.5) AS BIGINT))/100.0
                AS revenue,
              count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "tpch_q14" ->
      """SELECT floor((100.0 *
                CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) /
                CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT)) AS DOUBLE))
                *10000 + 0.5)/10000.0 AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-02-01'""",
    "tpch_q18" ->
      """WITH big AS (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey
           HAVING sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) > 18000)
         SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
                sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))/100.0 AS sum_qty
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_orderkey IN (SELECT l_orderkey FROM big)
         GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",
    "tpch_q7" ->
      s"""SELECT s_nat.n_name AS supp_nation, c_nat.n_name AS cust_nation,
                year(l_shipdate) AS l_year, $revSql AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation c_nat ON c_nationkey = c_nat.n_nationkey
         JOIN nation s_nat ON s_nationkey = s_nat.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND c_nat.n_name IN ('NATION_3', 'NATION_7')
           AND s_nat.n_name IN ('NATION_3', 'NATION_7')
           AND s_nat.n_name <> c_nat.n_name
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "tpch_q8" ->
      """SELECT year(l_shipdate) AS o_year,
                floor((CAST(sum(CASE WHEN s_nat.n_name = 'NATION_3'
                         THEN CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) /
                       CAST(sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT)) AS DOUBLE))
                      *10000 + 0.5)/10000.0 AS mkt_share
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation c_nat ON c_nationkey = c_nat.n_nationkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation s_nat ON s_nationkey = s_nat.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND c_nat.n_regionkey = 0
         GROUP BY 1 ORDER BY 1""",
    "tpch_q17" ->
      """WITH li AS (
           SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12')),
         aq AS (SELECT l_partkey AS ak, avg(l_quantity) AS aq FROM li GROUP BY 1)
         SELECT sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))/100.0/7.0 AS avg_yearly,
                count(*) AS n
         FROM li JOIN aq ON l_partkey = ak
         WHERE l_quantity < 0.2 * aq""",
    "tpch_q13" ->
      """WITH per_cust AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS custdist
         FROM per_cust GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "tpch_q15" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  sum(CAST(floor(l_extendedprice*(1.0-l_discount)*100 + 0.5) AS BIGINT)) AS revc
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, revc/100.0 AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE revc = (SELECT max(revc) FROM rev)
         ORDER BY s_suppkey""",
    "tpch_q19" ->
      s"""SELECT $revSql AS revenue, count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
                AND p_size BETWEEN 1 AND 5)
            OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
                AND p_size BETWEEN 1 AND 10)
            OR (p_brand = 'Brand#15' AND l_quantity BETWEEN 20 AND 30
                AND p_size BETWEEN 1 AND 15)""",
    "join_asof" -> asofOracle,
    "join_asof_tolerance" ->
      """SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
                CASE WHEN c.cts IS NULL
                       OR epoch_ms(p.ts) - epoch_ms(c.cts) > 3600000 THEN -1.0
                     ELSE c.click_value END AS last_click_value_1h
         FROM (SELECT user_id, event_id, date_trunc('millisecond', ts) AS ts,
                      value AS purchase_value
               FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id AS cu, date_trunc('millisecond', ts) AS cts,
                      value AS click_value
               FROM events WHERE event_type = 'click') c
           ON p.user_id = c.cu AND p.ts >= c.cts
         ORDER BY p.user_id, p.event_id""",
    // Fixture note (forward/nearest oracles): among clicks sharing the same
    // ms-truncated ts for a user, the Spark side breaks the tie by event_id
    // while DuckDB's ASOF JOIN picks an unspecified equal-ts row. The events
    // fixture has no same-user duplicate click timestamps at any generated SF
    // (verified: max count per (user_id, ms-ts, 'click') = 1), so the tie
    // path never fires; data with duplicate ts would need the click side
    // pre-aggregated to one row per (user_id, ts) on BOTH engines.
    "join_asof_forward" ->
      """SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
                coalesce(c.click_value, -1.0) AS next_click_value
         FROM (SELECT user_id, event_id, date_trunc('millisecond', ts) AS ts,
                      value AS purchase_value
               FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id AS cu, date_trunc('millisecond', ts) AS cts,
                      value AS click_value
               FROM events WHERE event_type = 'click') c
           ON p.user_id = c.cu AND p.ts <= c.cts
         ORDER BY p.user_id, p.event_id""",
    "join_asof_nearest" ->
      """SELECT p.user_id, p.event_id, p.ts, p.purchase_value,
                CASE WHEN b.cts IS NULL AND f.cts IS NULL THEN -1.0
                     WHEN f.cts IS NULL THEN b.click_value
                     WHEN b.cts IS NULL THEN f.click_value
                     WHEN epoch_ms(p.ts) - epoch_ms(b.cts)
                          <= epoch_ms(f.cts) - epoch_ms(p.ts) THEN b.click_value
                     ELSE f.click_value END AS nearest_click_value
         FROM (SELECT user_id, event_id, date_trunc('millisecond', ts) AS ts,
                      value AS purchase_value
               FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id AS bu, date_trunc('millisecond', ts) AS cts,
                      value AS click_value
               FROM events WHERE event_type = 'click') b
           ON p.user_id = b.bu AND p.ts >= b.cts
         ASOF LEFT JOIN
              (SELECT user_id AS fu, date_trunc('millisecond', ts) AS cts,
                      value AS click_value
               FROM events WHERE event_type = 'click') f
           ON p.user_id = f.fu AND p.ts <= f.cts
         ORDER BY p.user_id, p.event_id""",
    "join_asof_native" -> asofOracle,
    "join_self" ->
      """SELECT user_id, event_id, value,
                lag(value) OVER (PARTITION BY user_id
                                 ORDER BY date_trunc('millisecond', ts), event_id) AS prev_value,
                value - coalesce(lag(value) OVER (PARTITION BY user_id
                                 ORDER BY date_trunc('millisecond', ts), event_id), 0.0) AS delta
         FROM events ORDER BY user_id, event_id""",
  )
}
