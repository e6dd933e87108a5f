"""Decision-support subquery shapes (TPC-H Q2/Q8/Q9/Q13/Q14/Q15/Q16/
Q17/Q20/Q21/Q22 analogues, adapted to the engine's star schema).

Why this family exists: the reference's ad-hoc SQL tab
(`/root/reference/dashboard/tabs/tab3.py:35-100`) hands users a free
SQL prompt, and the classic decision-support shapes — correlated scalar
subqueries, `IN`/`NOT IN` over derived aggregates, `EXISTS`/`NOT
EXISTS` self-joins, argmax-over-aggregate — are exactly what such a
prompt receives. Every query here is expressed TWICE: the DuckDB oracle
uses the textbook subquery syntax, while the Spark build uses the
distributed rewrite a 100 TB cluster needs (correlated subquery →
aggregate + equi-join; `EXISTS`/`NOT EXISTS` pair → one per-key
aggregate; `NOT IN` → broadcast anti-join; scalar subquery → 1-row
broadcast cross-join). The pairs passing the value-hash gate is the
evidence that the rewrites are semantically exact.

Float discipline (the vwap_twap_daily contract, applied after the r4
ADVICE review): rounding AFTER a float sum is NOT order-independent —
a 1-ulp summation-order divergence can flip a rounding boundary, and
when the rounded sum feeds an argmax or a ratio it flips ROWS, not
digits. So every money sum here quantizes PER-TERM to 6 dp (identical
doubles in both engines) and sums as DECIMAL(28,6), which is exact in
any order; only then does it round for display or compare for argmax.
Thresholds derived from AVG still round 6 dp before comparison: the
compared columns sit on a coarse value grid — integral quantities or
2-dp money (q_idle_rich_customers compares c_acctbal) — far wider than
the 6-dp threshold rounding, so no row can sit within an ulp of the
boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import registry as R
from .catalog import register

_T = ("subquery",)

_DEC = "decimal(28,6)"


def _dec_term(term: Column) -> Column:
    """Quantize a money term to 6 dp and cast to DECIMAL(28,6) so that
    F.sum() over it is exact in any summation order (vwap pattern)."""
    return F.round(term, 6).cast(_DEC)


# The matching oracle-side spelling, used inside sum():
#   CAST(round(<term>, 6) AS DECIMAL(28,6))


# ---------------------------------------------------------------------------
# Q2 shape — correlated scalar MIN subquery
# ---------------------------------------------------------------------------

@register(
    "q_min_price_supplier",
    oracle="""
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_name,
           round(l.l_extendedprice, 2) AS min_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size = 1
      AND l.l_extendedprice = (
        SELECT min(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    ORDER BY p_partkey, s_name
    """,
    description="TPC-H Q2 shape: cheapest supplier per part via a "
                "correlated scalar MIN subquery. Spark rewrite: one "
                "hash-agg computes every part's min at once, then a "
                "(partkey, price) equi-join replaces the per-row "
                "re-scan — O(n) instead of the oracle's O(n·parts).",
    tags=_T,
)
def q_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = R.load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    li = R.load_table(spark, sf_dir, "lineitem")
    supp = R.load_table(spark, sf_dir, "supplier")
    # De-correlate: the subquery scans lineitem once per outer row; the
    # distributed form computes all per-part minima in one aggregate.
    min_price = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_ep")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(
            min_price,
            (li["l_partkey"] == min_price["l_partkey"])
            & (li["l_extendedprice"] == min_price["min_ep"]),
        )
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .select(
            "p_partkey", "p_name", "s_name",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q13 shape — outer join + two-level aggregation (count distribution)
# ---------------------------------------------------------------------------

@register(
    "q_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13 shape: distribution of per-customer urgent-"
                "order counts. LEFT join keeps zero-order customers "
                "(count(o_orderkey) ignores the NULLs), then a second "
                "aggregation histograms the counts — two shuffles, the "
                "second over a tiny key space.",
    tags=_T,
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = R.load_table(spark, sf_dir, "customer")
    orders = R.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q16 shape — NOT IN over a dimension predicate + COUNT(DISTINCT)
# ---------------------------------------------------------------------------

@register(
    "q_supplier_excl_count",
    oracle="""
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    description="TPC-H Q16 shape: supplier variety per (brand, size) "
                "excluding delinquent suppliers. NOT IN becomes a "
                "broadcast LEFT ANTI join (s_suppkey is non-null, so "
                "the NULL-poisoning NOT IN edge case cannot fire); the "
                "distinct count shuffles once on the group keys.",
    tags=_T,
)
def q_supplier_excl_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem")
    part = R.load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9)
    )
    bad = (
        R.load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"],
                "left_anti")
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape — correlated AVG threshold (small-quantity revenue)
# ---------------------------------------------------------------------------

@register(
    "q_small_qty_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice, 6)
                               AS DECIMAL(28,6))) AS DOUBLE) / 7.0, 2)
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2'
      AND l.l_quantity < (
        SELECT round(0.2 * avg(l2.l_quantity), 6) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    """,
    description="TPC-H Q17 shape: revenue lost to small-quantity "
                "orders. The correlated AVG threshold de-correlates to "
                "one per-part aggregate joined back on partkey; the "
                "threshold is rounded to 6 dp in both engines so "
                "summation order cannot flip a boundary row "
                "(quantities are integral, so no row sits within an "
                "ulp of the rounded threshold).",
    tags=_T,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem")
    part = R.load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#2"
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(thresh, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum(_dec_term(F.col("l_extendedprice")))
                     .cast("double") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q15 shape — argmax over a derived aggregate (top supplier)
# ---------------------------------------------------------------------------

@register(
    "q_top_revenue_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 6)
                                 AS DECIMAL(28,6))) AS DOUBLE), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1997-01-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    description="TPC-H Q15 shape: the supplier(s) with maximum 1996 "
                "revenue. The scalar MAX over the derived view becomes "
                "a 1-row broadcast cross-join filter. Because the "
                "revenue feeds an EQUALITY against its own max, the "
                "sum is per-term-quantized DECIMAL (exact in any "
                "order) — round-after-float-sum would let a 1-ulp "
                "summation-order divergence flip argmax ROWS (r4 "
                "ADVICE). Shipdate predicate pushes to the parquet "
                "scan.",
    tags=_T,
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    supp = R.load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(_dec_term(F.col("l_extendedprice")
                            * (1 - F.col("l_discount")))).cast("double"),
            2,
        ).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(top),
                     F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q8 shape — two-role dimension + conditional-aggregate market share
# ---------------------------------------------------------------------------

@register(
    "q_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           round(
             CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
                           THEN CAST(round(l.l_extendedprice
                                           * (1 - l.l_discount), 6)
                                AS DECIMAL(28,6))
                           ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(sum(CAST(round(l.l_extendedprice
                                   * (1 - l.l_discount), 6)
                        AS DECIMAL(28,6))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
                   AND r.r_name = 'EUROPE'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    GROUP BY year(o.o_orderdate)
    ORDER BY o_year
    """,
    description="TPC-H Q8 shape: NATION_5's share of EUROPE-customer "
                "revenue per year. `nation` joins in TWO roles "
                "(customer side filters through region, supplier side "
                "labels the share) — both broadcast; only the "
                "fact-side orders join shuffles. Numerator and "
                "denominator are per-term-quantized DECIMAL sums "
                "(order-exact) before the 6 dp ratio — a rounded float "
                "sum on either side of a ratio is the same boundary "
                "hazard as the argmax case (r4 ADVICE).",
    tags=_T,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem")
    orders = R.load_table(spark, sf_dir, "orders")
    cust = R.load_table(spark, sf_dir, "customer")
    nation = R.load_table(spark, sf_dir, "nation")
    region = R.load_table(spark, sf_dir, "region")
    supp = R.load_table(spark, sf_dir, "supplier")

    # Customer-side dim chain (nation→region filter) collapses to one
    # broadcast-sized list of EUROPE custkeys before touching facts.
    n1 = nation.alias("n1")
    n2 = nation.alias("n2")
    eu_cust = (
        cust.join(F.broadcast(n1),
                  cust["c_nationkey"] == F.col("n1.n_nationkey"))
        .join(F.broadcast(region),
              (F.col("n1.n_regionkey") == region["r_regionkey"])
              & (region["r_name"] == "EUROPE"))
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(n2), supp["s_nationkey"] == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))

    vol = _dec_term(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(eu_cust), orders["o_custkey"] == eu_cust["c_custkey"])
        .join(F.broadcast(supp_nation),
              li["l_suppkey"] == supp_nation["s_suppkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol)
                      .otherwise(zero)).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q14 shape — global conditional-aggregate ratio (promo revenue)
# ---------------------------------------------------------------------------

@register(
    "q_promo_revenue",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(round(l.l_extendedprice
                                              * (1 - l.l_discount), 6)
                                   AS DECIMAL(28,6))
                              ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(sum(CAST(round(l.l_extendedprice
                                   * (1 - l.l_discount), 6)
                        AS DECIMAL(28,6))) AS DOUBLE),
             6) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate <  DATE '1998-01-01'
    """,
    description="TPC-H Q14 shape: PROMO parts' share of 1997 revenue. "
                "One broadcast dim join, one scalar conditional-"
                "aggregate ratio; shipdate range pushes to the scan. "
                "Same per-term-quantized DECIMAL-sum discipline as "
                "q_market_share.",
    tags=_T,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    part = R.load_table(spark, sf_dir, "part")
    vol = _dec_term(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast(_DEC)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol)
                        .otherwise(zero)).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS self-joins (suppliers who kept waiting)
# ---------------------------------------------------------------------------

@register(
    "q_supplier_wait_fault",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    description="TPC-H Q21 shape: suppliers solely at fault on multi-"
                "supplier finalized orders. The EXISTS/NOT-EXISTS pair "
                "(two correlated self-scans per row in the oracle) "
                "collapses to ONE per-order aggregate — n_suppliers "
                "and n_faulty_suppliers via count(DISTINCT) — joined "
                "back on orderkey: keep rows where n_supp > 1 and the "
                "faulty set is exactly {this supplier}. One lineitem "
                "shuffle instead of three.",
    tags=_T,
)
def q_supplier_wait_fault(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem")
    orders = R.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = R.load_table(spark, sf_dir, "supplier")

    # One aggregate answers both correlated predicates for every order:
    # EXISTS(other supplier)       ⇔ n_supp > 1
    # NOT EXISTS(other R supplier) ⇔ n_fail = 1 (l1 itself has flag R,
    # so its supplier is always counted in the faulty set).
    order_stats = li.groupBy(F.col("l_orderkey").alias("so_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_fail"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(orders, l1["l_orderkey"] == orders["o_orderkey"])
        .join(order_stats, l1["l_orderkey"] == F.col("so_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_fail") == 1))
        .join(F.broadcast(supp), l1["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Q22 shape — global scalar threshold + NOT EXISTS (idle rich customers)
# ---------------------------------------------------------------------------

@register(
    "q_idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS numcust,
           round(CAST(sum(CAST(round(c.c_acctbal, 6) AS DECIMAL(28,6)))
                      AS DOUBLE), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT round(avg(c2.c_acctbal), 6) FROM customer c2
        WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="TPC-H Q22 shape: above-average-balance customers with "
                "no urgent orders, by segment. The uncorrelated scalar "
                "AVG broadcasts as a 1-row cross-join (rounded 6 dp "
                "before the comparison); NOT EXISTS becomes a LEFT "
                "ANTI join on custkey.",
    tags=_T,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = R.load_table(spark, sf_dir, "customer")
    urgent = R.load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum(_dec_term(F.col("c_acctbal"))).cast("double"), 2)
             .alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Q20 shape — IN over a derived HAVING aggregate (qualified suppliers)
# ---------------------------------------------------------------------------

@register(
    "q_qualified_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO' AND year(l.l_shipdate) = 1996
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 400)
    ORDER BY s_suppkey
    """,
    description="TPC-H Q20 shape: suppliers who moved >400 units of "
                "PROMO parts in 1996. The IN-subquery (itself a join + "
                "HAVING aggregate) becomes a derived aggregate LEFT "
                "SEMI-joined to supplier — the qualifying-key set is "
                "aggregate-sized, so the semi join broadcasts.",
    tags=_T,
)
def q_qualified_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1996
    )
    part = R.load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    supp = R.load_table(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(qualified),
                  supp["s_suppkey"] == qualified["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q9 shape — widest fact join in the catalog (profit by nation-year)
# ---------------------------------------------------------------------------

@register(
    "q_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                     - 0.01 * p.p_retailprice * l.l_quantity,
                                     6) AS DECIMAL(28,6))) AS DOUBLE), 2)
             AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9 shape: profit (revenue minus a retail-price-"
                "proportional cost, standing in for ps_supplycost) by "
                "supplier nation and order year — the widest unfiltered "
                "fact join in the catalog. part/supplier/nation all "
                "broadcast; ONLY the lineitem⋈orders edge shuffles, so "
                "the plan is one exchange plus the group-by.",
    tags=_T,
)
def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = R.load_table(spark, sf_dir, "lineitem")
    part = R.load_table(spark, sf_dir, "part")
    supp = R.load_table(spark, sf_dir, "supplier")
    nation = R.load_table(spark, sf_dir, "nation")
    orders = R.load_table(spark, sf_dir, "orders")
    supp_nat = supp.join(
        F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.01 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp_nat), li["l_suppkey"] == supp_nat["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_dec_term(profit)).cast("double"), 2)
             .alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )
