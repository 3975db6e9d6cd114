package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.operators.{Anomaly, Correlate, DailyCounts, Experiment, Hnsw, IndexStore, TextIndex, TimeSeries, Web, Bpe, Cardinality, Clustering, Cooccur, Decontaminate, Dedup, EditDistance, Embeddings, Extract, Frequencies, Funnel, Graph, Ivf, Joins, Multimodal, Pq, Quantiles, Sampling, Scd2, Sessionize, Similarity, Sketch, TextAnalysis, Upsert, Validate}
import graft.streaming.IncrementalStream
import graft.SparkEntry._

/** The TPC-H shapes expressible on the driver testdata (Q1/Q3 live
  * in [[TierCore]] as q1_agg/star_join).
  *
  * One registry tier of [[SparkEntry]]'s driver contract (split from the
  * single 7k-line object in round 14): `queries` and `oracles` compose into
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] unchanged — entry text
  * is byte-identical to the pre-split map literals. Shared helpers (ts6,
  * shared builds, oracle CTE builders) stay on [[SparkEntry]] and arrive via
  * the wildcard import. */
private[graft] object TierTpch extends Registry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q5 shape: six-way snowflake join (region→nation→customer→
    // orders→lineitem→supplier) with the local-supplier condition and
    // exact decimal revenue — the dims broadcast, the two fact joins
    // shuffle on their keys.
    "q5_local_supplier" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      Tables.region(s, dir).where(col("r_name") === "ASIA")
        .join(Tables.nation(s, dir), col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(s, dir), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name").agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q3 shape: shipping priority — segment-filtered customer ⋈
    // date-bounded orders ⋈ shipdate-bounded lineitem, exact-decimal
    // revenue, deterministic top 10 (revenue DESC on the EXACT decimal,
    // then key — ordering decided before the double cast).
    "q3_shipping_priority" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") < to_timestamp(lit("1998-07-01 00:00:00"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir)
          .where(col("l_shipdate") > to_timestamp(lit("1998-07-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(rev).as("rev_exact"))
        .orderBy(col("rev_exact").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"),
          col("rev_exact").cast("double").as("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
    }),

    // TPC-H Q7 shape: volume shipping between two nations — the
    // nation filters are applied to the supplier/customer DIMS first
    // and broadcast onto the facts, so most of lineitem/orders prunes
    // at the join instead of surviving to a post-filter.
    "q7_nation_volume" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      val pair = Seq("NATION_1", "NATION_2")
      val supp = Tables.supplier(s, dir)
        .join(Tables.nation(s, dir).where(col("n_name").isin(pair: _*)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, dir)
        .join(Tables.nation(s, dir).where(col("n_name").isin(pair: _*)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
    }),

    // TPC-H Q8 shape: national market share — one supplier nation's
    // permille of part-type revenue sold into one region's customers,
    // per order year. The last TPC-H query expressible over the
    // driver's table subset (Q2/Q9/Q11/Q16/Q20 need partsupp, Q12
    // needs l_shipmode/commitdate/receiptdate — absent columns).
    // Dims broadcast (part filter, supplier→nation), the region's
    // customer set applies as a shuffled left-semi join, and the share
    // divides exact e4-integer twins (the q14 convention).
    "q8_market_share" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      val revE4 = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(12,2)") * 100).cast("long"))
      val amerCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .join(broadcast(Tables.region(s, dir)
              .where(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val suppNat = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).where(col("p_type") === "STANDARD")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double")
            .as("nation_revenue"),
          sum(rev).cast("double").as("total_revenue"),
          sum(when(col("supp_nation") === "NATION_3", revE4).otherwise(0L))
            .as("__n"),
          sum(revE4).as("__t"))
        .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
          expr("__n * 1000 div __t").as("mkt_share_permille"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer for one
    // quarter, top 20 — date-filtered orders join the R-flagged
    // lineitems, customer + nation dims broadcast on at the end.
    "q10_returned_items" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .join(Tables.lineitem(s, dir).where(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(rev).as("rev_exact"))
        .orderBy(col("rev_exact").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          col("rev_exact").cast("double").as("revenue"),
          col("c_acctbal"), col("n_name"))
    }),

    // TPC-H Q4 shape: order-priority census over orders with at least
    // one late-shipped line (EXISTS = left-semi join; the classic
    // decorrelated-subquery plan) in one quarter.
    "q4_priority_exists" -> ((s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .join(Tables.lineitem(s, dir),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join so zero-order customers land in the 0 bucket, then the
    // count-of-counts double aggregation.
    "q13_order_histogram" -> ((s, dir) => {
      val perCust = Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q18 shape: large-volume customers — the HAVING-filtered
    // order-quantity rollup semi-joins the fact table back; quantities
    // summed as LONGs (integral doubles) so both engines are exact.
    "q18_big_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .where(col("sum_qty") > 300)
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("o_custkey") === col("c_custkey"))
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
    }),

    // TPC-H Q14 shape: promo-revenue share — lineitem ⋈ broadcast part,
    // conditional aggregation, exact decimal arithmetic; permille avoids
    // the float division.
    "q14_promo_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)"))
      // integer twin of rev (price-cents × discount-complement-percent):
      // the permille share divides LONGs, immune to decimal-division
      // rounding-convention differences between engines
      val revE4 = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(12,2)") * 100).cast("long"))
      val isPromo = col("p_type") === "ECONOMY"
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(isPromo, rev).otherwise(lit(0).cast("decimal(18,2)")))
            .cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"),
          sum(when(isPromo, revE4).otherwise(0L)).as("__p"),
          sum(revE4).as("__t"))
        .select(col("promo_revenue"), col("total_revenue"),
          expr("__p * 1000 div __t").as("promo_permille"))
    }),

    // TPC-H Q6 shape: the forecasting-revenue one-scan aggregate — a
    // tight multi-predicate band (date range + decimal discount band +
    // quantity cap) that must reach the parquet scan as pushed filters,
    // then a single partial-aggregable sum. The canonical "is pushdown
    // working" query.
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount").cast("decimal(12,2)").between(0.05, 0.07) &&
          col("l_quantity").cast("long") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(12,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q15 shape: top supplier by quarter revenue — a scalar-max
    // subquery decorrelated into a supplier-keyed aggregate plus a
    // one-row broadcast max joined back on exact decimal equality.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      Tables.supplier(s, dir)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(mx), col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    }),

    // TPC-H Q17 shape: the correlated per-part average ("quantity below
    // 20% of this part's average") decorrelated into ONE part-keyed
    // aggregate joined back — and the float threshold turned into the
    // exact integer twin `5·qty·count < sum(qty)` so both engines
    // decide each line identically. The brand filter semi-restricts the
    // aggregate's input via a broadcast of the qualifying part keys.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val brandParts = Tables.part(s, dir)
        .where(col("p_brand") === "Brand#13").select("p_partkey")
      val li = Tables.lineitem(s, dir)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      val perPart = li.groupBy(col("l_partkey").as("pp"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"),
          count(lit(1)).as("cq"))
      li.join(perPart, col("l_partkey") === col("pp"))
        .where(col("l_quantity").cast("long") * 5 * col("cq") < col("sq"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("small_rev"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q19 shape: the disjunctive join predicate — three
    // brand/size/quantity bands OR'd together over lineitem ⋈ broadcast
    // part (adapted to the columns this corpus carries: no
    // shipmode/shipinstruct). The equi-join key stays clean; the
    // disjunction rides as a post-join filter the optimizer can split.
    "q19_discounted_revenue" -> ((s, dir) => {
      val q = col("l_quantity").cast("long")
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          q.between(1, 11)) ||
        (col("p_brand") === "Brand#10" && col("p_size").between(1, 25) &&
          q.between(10, 20)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 35) &&
          q.between(20, 30))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        .where(cond)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(12,2)") -
              col("l_discount").cast("decimal(12,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q21 shape (adapted: "late" = returnflag R — this corpus has
    // no commit/receipt dates): suppliers who were the ONLY supplier
    // with a returned line in a multi-supplier finished order. The
    // classic EXISTS (another supplier) + NOT EXISTS (another R
    // supplier) pair decorrelates into ONE order-keyed supplier census
    // (nsupp ≥ 2 ∧ nsupp_r = 1) — one exchange instead of two
    // self-joins; the ORACLE deliberately runs the textbook correlated
    // form, so the decorrelation is verified against an independent
    // formulation, not a mirror.
    "q21_waiting_supplier" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // Two-level aggregate instead of a double countDistinct (r18):
      // the multi-distinct rewrite EXPANDED every lineitem row 2× and
      // shuffled the doubled (ok, suppkey, gid) set; distinct-pair
      // collapse then a plain count/sum computes the identical numbers
      // with partial aggregation on both levels and no row blowup.
      // nsupp = distinct suppliers per order; nsupp_r = distinct
      // suppliers with ≥1 'R' line (max of the per-line flag per pair).
      // NOTE (ADVICE r18): the isNotNull pre-filter drops orders whose
      // lines ALL have null suppkey from the census entirely, where the
      // old countDistinct form emitted them with nsupp = 0 — equivalent
      // HERE because the consumer below requires nsupp >= 2 (and TPC-H
      // suppkey is non-null anyway); re-check if the census is reused.
      val perOrder = li.where(col("l_suppkey").isNotNull)
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey"))
        .agg(max(col("l_returnflag") === "R").as("__has_r"))
        .groupBy(col("ok"))
        .agg(count(lit(1)).as("nsupp"),
          sum(col("__has_r").cast("long")).as("nsupp_r"))
      li.where(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(perOrder, col("l_orderkey") === col("ok"))
        .where(col("nsupp") >= 2 && col("nsupp_r") === 1)
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // TPC-H Q22 shape (adapted: country code = nation key, dormancy =
    // no URGENT-priority order): customers above the positive-balance
    // average with no urgent orders, grouped by country. The scalar avg
    // subquery stays EXACT by comparing cross-multiplied cents
    // (`bal·n_pos > sum_pos` ⇔ bal > avg) instead of dividing; the
    // NOT EXISTS runs as a left-anti join against the distinct urgent
    // customer keys. Oracle again runs the correlated textbook form.
    "q22_dormant_customers" -> ((s, dir) => {
      val nations = Seq(1, 3, 5, 7, 9)
      val cust = Tables.customer(s, dir)
        .where(col("c_nationkey").isin(nations: _*))
      val pos = cust.where(col("c_acctbal") > 0)
        .agg(sum((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long"))
            .as("sum_pos_cents"),
          count(lit(1)).as("n_pos"))
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(pos))
        .where((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long") *
          col("n_pos") > col("sum_pos_cents"))
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("totacctbal"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(12,2)))) DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q13_order_histogram" ->
      """WITH pc AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        |  CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM pc GROUP BY c_count""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |  AND n2.n_name IN ('NATION_1', 'NATION_2')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH amer AS (SELECT c_custkey FROM customer
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |    WHERE r_name = 'AMERICA'),
        |l AS (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS rev,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_e4,
        |    n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_type = 'STANDARD'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |    AND o_custkey IN (SELECT c_custkey FROM amer))
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)
        |    AS DOUBLE) AS nation_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)
        |    * 1000 // SUM(rev_e4) AS BIGINT) AS mkt_share_permille
        |FROM l GROUP BY 1""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(12,2)))) DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN big ON o_orderkey = l_orderkey""".stripMargin,

    "q14_promo_revenue" ->
      """WITH l AS (SELECT *,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) *
        |      (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)) AS rev_e4,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT
        |  CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev ELSE 0 END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev_e4 ELSE 0 END) * 1000
        |       // SUM(rev_e4) AS BIGINT) AS promo_permille
        |FROM l""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
        |  AND CAST(l_quantity AS BIGINT) < 24""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |        (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin,

    // The same integer-exact threshold twin (5·qty·count < sum), so the
    // per-line decision mirrors bit for bit.
    "q17_small_qty_revenue" ->
      """WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        |li AS (SELECT l.* FROM lineitem l JOIN bp ON l_partkey = p_partkey),
        |pp AS (SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS sq,
        |         COUNT(*) AS cq FROM li GROUP BY 1)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_rev,
        |  COUNT(*) AS n_lines
        |FROM li JOIN pp ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * 5 * cq < sq""".stripMargin,

    "q19_discounted_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |    AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 25
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
        |       AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,

    // Deliberately the textbook CORRELATED form — the engine's
    // aggregate decorrelation is checked against an independent
    // formulation, not a mirror of itself.
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |  JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin,

    // Correlated NOT EXISTS + the cross-multiplied exact average
    // threshold (bal·n_pos > sum_pos in cents).
    "q22_dormant_customers" ->
      """WITH cust AS (SELECT * FROM customer
        |    WHERE c_nationkey IN (1, 3, 5, 7, 9)),
        |pos AS (SELECT
        |    SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spc,
        |    COUNT(*) AS np
        |  FROM cust WHERE c_acctbal > 0)
        |SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust, pos
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * np > spc
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
        |    AS revenue
        |FROM region
        |  JOIN nation ON n_regionkey = r_regionkey
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin
  )
}
