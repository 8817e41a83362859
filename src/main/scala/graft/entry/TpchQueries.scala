package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}

/** Star-schema sanity queries over the TPC-H-ish tables: classic windowed
  * aggregation, a broadcast dimension join, and a filter-pushdown scan.
  * These anchor the oracle harness on a second data surface (lineitem) and
  * double as bench headliners.
  */
object TpchQueries extends QueryProvider {

  /** The fact scan at compute parallelism — applied ONLY where measured
    * to win (optimization guide §1.1: implement the "ideal" plan, then
    * keep it only where the empirical loop confirms it). The local
    * single-row-group lineitem file yields ~3 input splits, so fact-side
    * map stages run 3-way on a 32-core box; [[graft.core.Parallel.widenBy]]
    * inserts ONE hash exchange on `l_orderkey` above the scan when
    * splits < cores (a no-op on any realistic layout with row groups ≥
    * cores, so the 100 TB plan shape is unchanged). Keyed, not
    * round-robin: keyless repartition pays a local determinism sort of
    * the wide fact rows (`spark.sql.execution.sortBeforeRepartition`,
    * guide §2.5) that measured r20 at MORE cpu than the compute being
    * parallelized (tpch_q1 keyless widen: 5–9 s cpu vs the 1.2 s serial
    * aggregation it replaced).
    *
    * Where it stands (focused bench drives, steady column, r20):
    * tpch_q1 1.164 → 0.808 s (the five decimal folds parallelize;
    * exchange cost ≪ agg saved) and tpch_q18 0.997 → 0.708 s (the
    * groupBy(l_orderkey) REUSES the inserted hash partitioning — guide
    * §2.4 — so the widen replaces the agg exchange rather than adding
    * one). Everywhere else the family A/B measured a net LOSS
    * (13.4 → 18.5 s with all 19 lineitem scans widened: broadcast-join
    * pipelines gained an exchange that nothing downstream reuses), so
    * the other 17 consumers keep the bare scan.
    */
  private def lineitemWide(s: SparkSession, dir: String): DataFrame =
    graft.core.Parallel.widenBy(Tables(s, dir, "lineitem"),
      col("l_orderkey"))

  private def q1(s: SparkSession, dir: String): DataFrame =
    lineitemWide(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** revenue by nation: lineitem ⋈ supplier ⋈ nation — the two dimension
    * sides are tiny and broadcast (no shuffle of the fact table beyond the
    * final groupBy).
    */
  private def q5ish(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val sup = Tables(s, dir, "supplier")
    val nat = Tables(s, dir, "nation")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("n_name")
  }

  /** shipping-priority shape (TPC-H Q3): selective filters on all three
    * tables, customer broadcast against the orders⋈lineitem equi-join,
    * revenue per order, top 10 — the join-then-topk plan whose 100 TB
    * posture is "filter early, broadcast the small side, let
    * TakeOrderedAndProject cap the result".
    */
  private def q3ish(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01").cast("timestamp")
    val cust = Tables(s, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables(s, dir, "orders")
      .where(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** large-volume-customer shape (TPC-H Q18): a HAVING filter over the
    * fact aggregation feeds a second join back to the dimensions — the
    * aggregate-then-join plan (the big sum shrinks the fact side to the
    * qualifying keys BEFORE any dimension work).
    */
  private def q18ish(s: SparkSession, dir: String): DataFrame = {
    val big = lineitemWide(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(Exact.dsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 250.0)
    val ord = Tables(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables(s, dir, "customer").select("c_custkey", "c_name")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  /** priority-class shape (TPC-H Q12, restated over this schema's
    * columns): conditional aggregation — both output measures fold a
    * CASE over the joined row inside ONE aggregate pass (never two
    * scans, never a pivot join). Integer counts, no Exact needed.
    */
  private def q12ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val li = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select("l_orderkey", "l_returnflag")
    val ord = Tables(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val isHigh = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** order-priority-checking shape (TPC-H Q4): the EXISTS decorrelates
    * to a LEFT SEMI join — the fact side is probed once and never
    * duplicated by multi-match keys (a plain inner join would both
    * inflate counts and shuffle the duplicates).
    */
  private def q4ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1996-07-01").cast("timestamp")
    val ord = Tables(s, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_orderpriority")
    val ret = Tables(s, dir, "lineitem")
      .where(col("l_returnflag") === "R").select("l_orderkey")
    ord.join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** global-sales-opportunity shape (TPC-H Q22, restated: nation key for
    * the phone prefix, urgent orders for the order book): scalar-average
    * threshold via a broadcast one-row frame, then a LEFT ANTI join
    * against the filtered order keys — "has no urgent order" never
    * materializes a NOT IN list. The average threshold goes through
    * [[Exact.davg]] so both engines cut the same boundary.
    */
  private def q22ish(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val avgBal = cust.agg(Exact.davg(col("c_acctbal")).as("avg_bal"))
    val urgent = Tables(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    cust.crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        Exact.dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** small-quantity-order shape (TPC-H Q17): the correlated scalar
    * subquery (per-part average) decorrelates to ONE aggregation over
    * the brand-restricted join, reused by the outer filter — the
    * aggregate-join-reuse plan: the fact slice is computed once, its
    * per-key aggregate joins back on the same key, and the engine never
    * re-scans lineitem per part the way the correlated form is written.
    */
  private def q17ish(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val parts = Tables(s, dir, "part")
      .where(col("p_brand") === "Brand#13").select("p_partkey")
    val rel = li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val avgq = rel.groupBy("l_partkey")
      .agg(Exact.davg(col("l_quantity")).as("avg_qty"))
    rel.join(avgq, "l_partkey")
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((Exact.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** forecast-revenue-change shape (TPC-H Q6): the pure scan-aggregate —
    * every predicate (date range, discount band, quantity cap) pushes
    * into the parquet reader and the plan is a single WholeStageCodegen
    * scan + partial/final agg, no join, no wide shuffle. The 100 TB
    * posture is "the filter IS the query": bytes read scale with the
    * predicate's selectivity via row-group pruning.
    */
  private def q6ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(Exact.dsum(col("l_extendedprice") * col("l_discount"))
        .as("revenue"))
  }

  /** returned-item-reporting shape (TPC-H Q10): the quarter's returned
    * revenue per customer, top 20 — fact-side filters first (returnflag,
    * order quarter), equi-joins on the shrunken sides, and
    * TakeOrderedAndProject caps the result so only 20 rows ever reach
    * the driver. Tie-broken by c_custkey for determinism.
    */
  private def q10ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    val li = Tables(s, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables(s, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val cust = Tables(s, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** customer-distribution shape (TPC-H Q13): the LEFT OUTER count
    * histogram — customers with zero qualifying orders must appear with
    * c_count 0, so the join is a left outer against the PRE-FILTERED
    * orders side (filtering after the join would turn matched-but-
    * excluded customers into zeros twice). Two aggregations: per-customer
    * count reusing the join's custkey partitioning, then the tiny
    * distribution shuffle (one row per distinct count).
    */
  private def q13ish(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer").select("c_custkey")
    val ord = Tables(s, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** promotion-effect shape (TPC-H Q14): conditional revenue ratio in
    * ONE pass — both the PROMO numerator and the total denominator are
    * measures of the same aggregate (no second scan, no self-join), over
    * the month's lineitem slice joined to the broadcast part dimension.
    * Both sums run the exact-decimal fold; the final ×100 division is
    * one IEEE op on identical doubles in both engines.
    */
  private def q14ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-09-01").cast("timestamp")
    val hi = lit("1997-10-01").cast("timestamp")
    val li = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables(s, dir, "part").select("p_partkey", "p_type")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        Exact.dsum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
        Exact.dsum(rev)).as("promo_revenue"))
  }

  /** discounted-revenue shape (TPC-H Q19): the OR-of-ANDs predicate —
    * three (brand, size-band, quantity-band) disjuncts evaluated inside
    * the join. The part side carries its per-disjunct attributes through
    * a broadcast hash join and the compound filter runs codegen'd post-
    * join; the brand/size half of each disjunct prunes the broadcast
    * build side before any probe.
    */
  private def q19ish(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables(s, dir, "part")
      .select("p_partkey", "p_brand", "p_size")
    val d1 = col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val d2 = col("p_brand") === "Brand#22" && col("p_size").between(10, 30) &&
      col("l_quantity").between(10, 20)
    val d3 = col("p_brand") === "Brand#15" && col("p_size").between(20, 50) &&
      col("l_quantity").between(20, 30)
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .where(d1 || d2 || d3)
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** volume-shipping shape (TPC-H Q7): bidirectional nation-pair trade
    * volume by year. The two nation lookups are SEPARATE broadcast
    * dimension joins (supplier side, customer side) against the same
    * tiny table — never a self-join of the fact path — and the
    * pair-direction disjunction filters AFTER both names are in-row.
    * Year extraction is calendar-based in both engines (UTC, NTZ).
    */
  private def q7ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1999-01-01").cast("timestamp")
    val li = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    val sup = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = Tables(s, dir, "nation")
    val ord = Tables(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
    val n1 = nat.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    val n2 = nat.select(col("n_nationkey").as("cn_key"),
      col("n_name").as("cust_nation"))
    val pair = (col("supp_nation") === "NATION_15" &&
        col("cust_nation") === "NATION_11") ||
      (col("supp_nation") === "NATION_11" &&
        col("cust_nation") === "NATION_15")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .where(pair)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** national-market-share shape (TPC-H Q8): one nation's share of a
    * region's PROMO-part import volume by year — the conditional-ratio
    * aggregation (both numerator and denominator in ONE pass) on top of
    * a five-way star join where every dimension (part slice, supplier
    * nations, customer nations, region) broadcasts and only the two
    * fact tables shuffle.
    */
  private def q8ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1999-01-01").cast("timestamp")
    val part = Tables(s, dir, "part")
      .where(col("p_type") === "PROMO").select("p_partkey")
    val li = Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    val sup = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n1 = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
    val ord = Tables(s, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Tables(s, dir, "customer").select("c_custkey", "c_nationkey")
    val natr = Tables(s, dir, "nation")
      .join(broadcast(Tables(s, dir, "region")
        .where(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(natr), col("c_nationkey") === col("cn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((Exact.dsum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(0.0)) /
        Exact.dsum(vol)).as("mkt_share"))
      .orderBy("o_year")
  }

  /** scalar-fraction HAVING shape (TPC-H Q11, restated over customer
    * balances): per-nation balance concentration above a fraction of
    * the GLOBAL total — the group-aggregate filtered against a
    * broadcast one-row scalar; both sums exact-decimal so both engines
    * cut the same boundary.
    */
  private def q11ish(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val tot = cust.agg(Exact.dsum(col("c_acctbal")).as("total_bal"))
    cust.groupBy(col("c_nationkey"))
      .agg(Exact.dsum(col("c_acctbal")).as("bal"))
      .crossJoin(broadcast(tot))
      .where(col("bal") > lit(0.05) * col("total_bal"))
      .select(col("c_nationkey"), col("bal"))
      .orderBy(col("bal").desc, col("c_nationkey").asc)
  }

  /** top-supplier view shape (TPC-H Q15): quarter revenue per supplier,
    * keep the max — the aggregate-argmax-join: the revenue aggregate is
    * computed ONCE and joined against its own broadcast 1-row max (the
    * exact-decimal sums make the double equality engine-safe), never
    * re-scanned per candidate.
    */
  private def q15ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    val rev = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .where(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables(s, dir, "supplier")
        .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy("s_suppkey")
  }

  /** waiting-orders shape (TPC-H Q21, restated without receipt dates):
    * suppliers whose RETURNED line sits on a multi-supplier order where
    * no OTHER supplier returned — the double-correlated EXISTS/NOT
    * EXISTS, decorrelating to a LEFT SEMI then a LEFT ANTI on the same
    * order key (mixed equi + non-equi conditions; the fact side is
    * probed, never duplicated).
    */
  private def q21ish(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_suppkey",
      "l_returnflag")
    val l1 = li.where(col("l_returnflag") === "R")
    val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = l1.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("o2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("o3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey").asc)
      .limit(20)
  }

  /** The q12 measure pair over CO-LOCATED bucketed layouts: lineitem and
    * orders both bucketed (and sorted) by the order key, so the join
    * reads pre-partitioned buckets and runs with NO exchange on either
    * side — the repeated-fact-join storage posture at 100 TB (the
    * bucketed write is one-off provisioning via
    * [[graft.sources.BucketStore]]). Values are identical to joining the
    * raw parquet, so the plain q12 SQL is the oracle; PlanSpec asserts
    * the shuffle-free join shape.
    */
  private def q12colocated(s: SparkSession, dir: String): DataFrame = {
    val ln = graft.sources.BucketStore.bucketed(s, dir, "lineitem",
      "l_orderkey", 8)
    val on = graft.sources.BucketStore.bucketed(s, dir, "orders",
      "o_orderkey", 8)
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val li = s.table(ln)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select("l_orderkey", "l_returnflag")
    val ord = s.table(on).select("o_orderkey", "o_orderpriority")
    val isHigh = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    // merge hint: at fact-x-fact scale neither side broadcasts, and the
    // whole point of the bucketed layout is the exchange-free sort-merge
    // join — without the hint the tiny test SF would pick a broadcast
    // join and never exercise the layout
    li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** minimum-cost-supplier shape (TPC-H Q2, restated: the part↔supplier
    * supply relation is derived from lineitem since this schema carries no
    * partsupp, with unit cost = MIN(l_extendedprice / l_quantity) per
    * pair): the correlated scalar subquery — "suppliers whose cost equals
    * the part's minimum cost among EUROPE suppliers" — decorrelates to a
    * single per-part MIN window over the already-region-filtered cost set,
    * so the fact slice is aggregated ONCE and never re-scanned per part.
    * Both filters (part slice, EU suppliers) push BELOW the pair
    * aggregation — legal because they constrain group keys only — so at
    * 100 TB the pair agg runs over ~3% of lineitem, not all of it. The
    * cost doubles are identical IEEE divisions in both engines, so the
    * equality against the window MIN cuts the same rows.
    */
  private def q2ish(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = Tables(s, dir, "part")
      .where(col("p_type") === "LARGE" && col("p_size") >= 40)
      .select("p_partkey")
    val euSupp = Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")
          .where(col("r_name") === "EUROPE").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val cost = Tables(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .join(broadcast(euSupp.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    cost
      .withColumn("min_cost",
        min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
      .where(col("cost") === col("min_cost"))
      .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** product-type-profit shape (TPC-H Q9, restated: supply cost proxied by
    * 0.5 × p_retailprice since this schema carries no ps_supplycost): the
    * classic multi-way fact join — lineitem against orders is the only
    * fact×fact shuffle; part (name-sliced), supplier, and nation all
    * broadcast. The profit measure mixes columns of two tables inside ONE
    * exact-decimal fold (price terms terminate at 4 decimal digits, so the
    * decimal cast is engine-identical), grouped by nation and order year.
    */
  private def q9ish(s: SparkSession, dir: String): DataFrame = {
    val part = Tables(s, dir, "part")
      .where(col("p_name").like("%gear%"))
      .select("p_partkey", "p_retailprice")
    val li = Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val sup = Tables(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = Tables(s, dir, "nation").select("n_nationkey", "n_name")
    val ord = Tables(s, dir, "orders").select("o_orderkey", "o_orderdate")
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Exact.dsum(profit).as("profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** parts-supplier-relationship shape (TPC-H Q16, restated: the supply
    * relation is the DISTINCT (part, supplier) pairs observed in lineitem;
    * "complaint" suppliers are those with negative balances): NOT IN over
    * a non-null key list decorrelates to a LEFT ANTI join — the excluded
    * set never materializes driver-side — and the count-distinct runs
    * AFTER the pair-dedup so each supplier counts once per (brand, type,
    * size) cell. Part filter broadcasts; the only wide shuffles are the
    * pair-distinct and the final count-distinct aggregation.
    */
  private def q16ish(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables(s, dir, "part")
      .where(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables(s, dir, "supplier")
      .where(col("s_acctbal") < 0).select("s_suppkey")
    Tables(s, dir, "lineitem")
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  /** potential-part-promotion shape (TPC-H Q20, restated: "surplus stock"
    * becomes "shipped more than a quarter of the part's 1997 volume"):
    * the double-nested correlated IN — part-name slice IN'd into the
    * fact window, the correlated availability threshold against a
    * per-part total, and the qualifying supplier set IN'd into the outer
    * supplier scan — decorrelates to two LEFT SEMI joins with one
    * aggregate join between them. The per-part total REUSES the pair
    * aggregate (second groupBy over its output, then a broadcast join
    * back), so lineitem is scanned once; quantities are integral doubles,
    * so the 0.25× threshold cuts identically in both engines.
    */
  private def q20ish(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1998-01-01").cast("timestamp")
    val pp = Tables(s, dir, "part")
      .where(col("p_name").like("small%")).select("p_partkey")
    val q97 = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val tot = q97.groupBy(col("l_partkey"))
      .agg(sum(col("qty")).as("tqty"))
      .select(col("l_partkey").as("t_partkey"), col("tqty"))
    val qualifying = q97
      .join(broadcast(tot), col("l_partkey") === col("t_partkey"))
      .where(col("qty") > lit(0.25) * col("tqty"))
      .select("l_suppkey")
    Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")
        .where(col("n_name") === "NATION_19").select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  /** filter + projection pushdown scan: predicate and 3-column ReadSchema
    * must reach the parquet reader (verified in TpchSpec via explain).
    */
  private def scan(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .where(col("o_orderdate") < lit("1996-01-01").cast("timestamp") &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1"   -> ((s, d) => q1(s, d)),
    "tpch_q3"   -> ((s, d) => q3ish(s, d)),
    "tpch_q5"   -> ((s, d) => q5ish(s, d)),
    "tpch_q18"  -> ((s, d) => q18ish(s, d)),
    "tpch_q12"  -> ((s, d) => q12ish(s, d)),
    "tpch_q4"   -> ((s, d) => q4ish(s, d)),
    "tpch_q22"  -> ((s, d) => q22ish(s, d)),
    "tpch_q17"  -> ((s, d) => q17ish(s, d)),
    "tpch_q6"   -> ((s, d) => q6ish(s, d)),
    "tpch_q10"  -> ((s, d) => q10ish(s, d)),
    "tpch_q13"  -> ((s, d) => q13ish(s, d)),
    "tpch_q14"  -> ((s, d) => q14ish(s, d)),
    "tpch_q19"  -> ((s, d) => q19ish(s, d)),
    "tpch_q7"   -> ((s, d) => q7ish(s, d)),
    "tpch_q8"   -> ((s, d) => q8ish(s, d)),
    "tpch_q11"  -> ((s, d) => q11ish(s, d)),
    "tpch_q15"  -> ((s, d) => q15ish(s, d)),
    "tpch_q21"  -> ((s, d) => q21ish(s, d)),
    "tpch_q2"   -> ((s, d) => q2ish(s, d)),
    "tpch_q9"   -> ((s, d) => q9ish(s, d)),
    "tpch_q16"  -> ((s, d) => q16ish(s, d)),
    "tpch_q20"  -> ((s, d) => q20ish(s, d)),
    "tpch_q12_colocated" -> ((s, d) => q12colocated(s, d)),
    "tpch_scan" -> ((s, d) => scan(s, d)))

  def oracle: Map[String, String] = Map(
    "tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Exact.dsumSql("l_quantity")} AS sum_qty,
         |  ${Exact.dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${Exact.davgSql("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "tpch_q5" ->
      s"""SELECT n_name,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "tpch_q18" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${Exact.dsumSql("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING ${Exact.dsumSql("l_quantity")} > 250.0)
         |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |       sum_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    // the SUMs are CAST to BIGINT: DuckDB's SUM(int) yields HUGEINT
    // (arrow decimal128(38,0)), which dataframe-based compares stringify
    // differently from Spark's int64 even when the values are equal
    "tpch_q12" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q4" ->
      s"""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |  AND EXISTS (SELECT 1 FROM lineitem l
         |              WHERE l.l_orderkey = o.o_orderkey
         |                AND l.l_returnflag = 'R')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q22" ->
      s"""WITH a AS (SELECT ${Exact.davgSql("c_acctbal")} AS avg_bal
         |           FROM customer)
         |SELECT c_nationkey, COUNT(*) AS numcust,
         |       ${Exact.dsumSql("c_acctbal")} AS totacctbal
         |FROM customer CROSS JOIN a
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = c_custkey
         |                    AND o.o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q17" ->
      s"""WITH rel AS (SELECT l_partkey, l_quantity, l_extendedprice
         |             FROM lineitem JOIN part ON p_partkey = l_partkey
         |             WHERE p_brand = 'Brand#13'),
         |a AS (SELECT l_partkey, ${Exact.davgSql("l_quantity")} AS avg_qty
         |      FROM rel GROUP BY 1)
         |SELECT ${Exact.dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM rel JOIN a USING (l_partkey)
         |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "tpch_q6" ->
      s"""SELECT ${Exact.dsumSql("l_extendedprice * l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, c_nationkey,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "tpch_q13" ->
      s"""WITH cc AS (
         |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
         |  FROM customer LEFT OUTER JOIN (
         |    SELECT o_orderkey, o_custkey FROM orders
         |    WHERE o_orderpriority <> '1-URGENT') o
         |  ON c_custkey = o_custkey
         |  GROUP BY 1)
         |SELECT c_count, COUNT(*) AS custdist
         |FROM cc GROUP BY 1
         |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "tpch_q14" ->
      s"""SELECT 100.0 *
         |  ${Exact.dsumSql("CASE WHEN p_type = 'PROMO' THEN " +
            "l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")}
         |    AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "tpch_q19" ->
      s"""SELECT ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")}
         |    AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  EXTRACT(YEAR FROM l_shipdate) AS l_year,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |  AND ((n1.n_name = 'NATION_15' AND n2.n_name = 'NATION_11')
         |    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_15'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "tpch_q8" ->
      s"""SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         |  ${Exact.dsumSql("CASE WHEN n1.n_name = 'NATION_3' THEN " +
            "l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} /
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")}
         |    AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region ON n2.n_regionkey = r_regionkey
         |WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1999-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q11" ->
      s"""WITH t AS (SELECT ${Exact.dsumSql("c_acctbal")} AS total_bal
         |           FROM customer)
         |SELECT c_nationkey, ${Exact.dsumSql("c_acctbal")} AS bal
         |FROM customer CROSS JOIN t
         |GROUP BY c_nationkey, total_bal
         |HAVING ${Exact.dsumSql("c_acctbal")} > 0.05 * total_bal
         |ORDER BY bal DESC, c_nationkey ASC""".stripMargin,
    "tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount)")}
         |      AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch_q21" ->
      s"""SELECT l_suppkey, COUNT(*) AS numwait
         |FROM lineitem l1
         |WHERE l1.l_returnflag = 'R'
         |  AND EXISTS (SELECT 1 FROM lineitem l2
         |              WHERE l2.l_orderkey = l1.l_orderkey
         |                AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
         |                  WHERE l3.l_orderkey = l1.l_orderkey
         |                    AND l3.l_suppkey <> l1.l_suppkey
         |                    AND l3.l_returnflag = 'R')
         |GROUP BY 1
         |ORDER BY numwait DESC, l_suppkey ASC LIMIT 20""".stripMargin,
    // the supply CTE is the correlated form's shared relation; the Spark
    // side pushes the part/region filters below the pair aggregation
    // (group-key-only predicates) and replaces the correlated MIN with a
    // per-part window
    "tpch_q2" ->
      s"""WITH supply AS (
         |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         |         MIN(l_extendedprice / l_quantity) AS cost
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT s_acctbal, s_name, n_name, p_partkey, cost
         |FROM part, supply, supplier, nation, region
         |WHERE p_partkey = partkey AND s_suppkey = suppkey
         |  AND p_type = 'LARGE' AND p_size >= 40
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND cost = (SELECT MIN(s2.cost)
         |              FROM supply s2, supplier, nation, region
         |              WHERE s2.partkey = p_partkey
         |                AND s2.suppkey = s_suppkey
         |                AND s_nationkey = n_nationkey
         |                AND n_regionkey = r_regionkey
         |                AND r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,
    "tpch_q9" ->
      s"""SELECT n_name AS nation,
         |  EXTRACT(YEAR FROM o_orderdate) AS o_year,
         |  ${Exact.dsumSql("l_extendedprice * (1.0 - l_discount) - " +
            "0.5 * p_retailprice * l_quantity")} AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin,
    "tpch_q16" ->
      s"""WITH supplies AS (SELECT DISTINCT l_partkey, l_suppkey
         |                  FROM lineitem)
         |SELECT p_brand, p_type, p_size,
         |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM supplies JOIN part ON p_partkey = l_partkey
         |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
         |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
         |                        WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // quantities are integral doubles, so the plain SUMs are exact in any
    // fold order and the 0.25x threshold cuts identically in both engines
    "tpch_q20" ->
      s"""WITH q97 AS (
         |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |    AND l_partkey IN (SELECT p_partkey FROM part
         |                      WHERE p_name LIKE 'small%')
         |  GROUP BY 1, 2),
         |tot AS (SELECT l_partkey, SUM(qty) AS tqty FROM q97 GROUP BY 1)
         |SELECT s_name, s_acctbal
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_19' AND s_suppkey IN (
         |  SELECT l_suppkey FROM q97 JOIN tot USING (l_partkey)
         |  WHERE qty > 0.25 * tqty)
         |ORDER BY s_name""".stripMargin,
    // same values as tpch_q12 — the layout changes, the answer must not
    "tpch_q12_colocated" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_scan" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |WHERE o_orderdate < TIMESTAMP '1996-01-01' AND o_orderstatus = 'F'
         |ORDER BY o_orderkey""".stripMargin)
}
