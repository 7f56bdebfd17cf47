"""TPC-H-analog plan-shape benchmarks (beyond-reference OLAP surface).

The reference's heaviest query is a single grouped aggregate
(SURVEY.md §2.4); these two classic shapes exercise the plan
features a 100 TB deployment leans on hardest:

- ``tpch_q6_revenue`` — selective scan-filter-aggregate (TPC-H Q6
  shape): every predicate is scan-level, the aggregate is a single
  partial+final pair with no grouping keys. The canonical test that
  filters reach the parquet reader and nothing shuffles but two
  doubles per partition.
- ``tpch_q3_shipping_priority`` — dim-filtered fact-fact join with
  grouped top-k (TPC-H Q3 shape): broadcast the filtered customer
  dim, shuffle-join orders↔lineitem on the order key, partial-agg
  before the final top-10. The canonical "broadcast what's small,
  shuffle what's big, aggregate early" plan.
- ``tpch_q5_local_supplier_volume`` — six-table snowflake join
  (region→nation→customer/supplier→orders→lineitem) with the
  "local supplier" second join condition. Exercises join ordering:
  the dims broadcast, only orders↔lineitem shuffles.
- ``tpch_q10_returned_items`` — returned-line revenue per customer,
  grouped top-20: fact-fact shuffle join plus two broadcast dims
  feeding TakeOrderedAndProject.
- ``tpch_q14_promo_share`` — conditional-aggregate ratio over a
  fact↔dim join (promo revenue share), the percent-of-total pattern
  (SURVEY.md A11) expressed as a single pass.
- ``tpch_q18_large_volume`` — groupBy-HAVING on the fact, then the
  survivors semi-join back to orders+customer. The aggregate side
  collapses 60k lines to a handful of keys, so AQE turns the join
  back into a broadcast at runtime.

Together with the rest of this module (q2, q4, q7-q9, q11-q13, q15,
q17, q19-q22) and the registry twins elsewhere (Q1 ≡
``a7_pricing_summary``, Q16 ≡ ``agg_distinct_suppliers_by_type``),
every one of the 22 classic TPC-H plan shapes has an oracle-checked
analog — adapted where the testdata lacks a table (no partsupp:
lineitem stands in; no commitdate: lateness is shipdate vs orderdate).

Oracle parity: revenue sums rounded to cents before ranking so both
engines rank identical doubles; sums feeding a rank or threshold run
over DECIMAL-quantized terms (float addition order differs between
engines); LIMIT ties broken by key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.schemas import load

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


@_q(
    "tpch_q6_revenue",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS promo_revenue,
              count(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def tpch_q6_revenue(spark, sf_dir):
    """TPC-H Q6 shape: forecast-revenue-change — a fully selective
    scan + global aggregate. The discount/quantity predicates push to
    the parquet scan; the date predicate applies right above it (the
    testdata stores nanosecond timestamps that load() converts, so
    the time filter sits on the converted column). No grouping keys →
    the shuffle moves one partial row per partition."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "tpch_q3_shipping_priority",
    """WITH s AS (
         SELECT l_orderkey,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
                CAST(o_orderdate AS DATE) AS order_date,
                o_orderpriority
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1998-07-01'
           AND l.l_shipdate > TIMESTAMP '1998-07-01'
         GROUP BY l_orderkey, order_date, o_orderpriority)
       SELECT l_orderkey, revenue, order_date, o_orderpriority
       FROM s
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10""",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 highest-revenue not-yet-shipped orders
    for one market segment. The segment-filtered customer side scales
    with SF, so no hard broadcast hint — AQE runtime-broadcasts it at
    small SF and shuffle-joins at 100 TB; orders ↔
    lineitem shuffle-join on the order key; revenue partial-aggregates
    before the global top-10 (TakeOrderedAndProject — no full sort).
    Ranking uses cent-rounded revenue with a key tie-break so the
    limit boundary is deterministic and engine-portable; the sum runs
    over DECIMAL(18,4)-quantized terms, not doubles, because Spark and
    DuckDB add floats in different orders — an exact decimal sum can't
    land differently on a half-cent boundary and flip the LIMIT set."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        li, o.o_orderkey == li.l_orderkey
    )
    agg = joined.groupBy(
        "l_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderpriority",
    ).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double"),
            2,
        ).alias("revenue")
    )
    return agg.select(
        "l_orderkey", "revenue", "order_date", "o_orderpriority"
    ).orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


@_q(
    "tpch_q5_local_supplier_volume",
    """SELECT n_name,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              count(*) AS n_lines
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      AND c.c_nationkey = s.s_nationkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n_name
       ORDER BY revenue DESC""",
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: revenue by nation where the customer and the
    line's supplier share a nation inside one region. Six tables; the
    plan that matters at 100 TB is: region/nation (fixed-cardinality
    dims) broadcast with hard hints; supplier scales with SF, so its
    join is left to AQE (runtime-broadcast at small SF, shuffle at
    100 TB) — the "local supplier" predicate rides along as a second
    equi-condition on the supplier build side rather than a separate
    join.
    Cited semantics: TPC-H Q5; beyond-reference OLAP surface."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"))
    )


@_q(
    "tpch_q10_returned_items",
    """SELECT c.c_custkey, c.c_name,
              round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
              n.n_name
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-07-01'
         AND l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c_custkey
       LIMIT 20""",
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one half-year. The return-flag and date predicates push into the
    two fact scans; nation broadcasts; orders ↔ lineitem shuffles on
    the order key and partial-aggregates before the bounded top-20
    (TakeOrderedAndProject — no global sort materializes). Revenue is
    an exact DECIMAL(18,4) sum cent-rounded with a key tie-break so
    the limit boundary is deterministic across engines regardless of
    float-addition order."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "tpch_q14_promo_share",
    """WITH sums AS (
         SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN l.l_extendedprice * (1 - l.l_discount)
                               ELSE 0 END), 2) AS promo_revenue,
                round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
           AND l.l_shipdate < TIMESTAMP '1997-04-01')
       SELECT promo_revenue, total_revenue,
              round(100.0 * promo_revenue / total_revenue, 3) AS promo_pct
       FROM sums""",
)
def tpch_q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — a conditional aggregate
    ratio in one pass over the fact↔part join (part broadcasts; the
    ship-date window pushes into the lineitem scan). Both sums are
    cent-rounded BEFORE the division so the ratio is computed from
    bit-identical doubles in either engine; the division itself never
    depends on float summation order."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    sums = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))), 2
        ).alias("promo_revenue"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )
    return sums.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 3
        ).alias("promo_pct"),
    )


@_q(
    "tpch_q18_large_volume",
    """WITH big AS (
         SELECT l_orderkey, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
       SELECT c.c_custkey, c.c_name, o.o_orderkey,
              CAST(o.o_orderdate AS DATE) AS order_date,
              o.o_totalprice, big.sum_qty
       FROM big
       JOIN orders o ON big.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY o.o_totalprice DESC, o.o_orderkey
       LIMIT 100""",
)
def tpch_q18_large_volume(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders — a HAVING aggregate whose
    survivors join back to orders and customer. The groupBy collapses
    the fact to a handful of qualifying keys, so under AQE the join
    back to orders becomes a runtime broadcast; the final top-100 is
    bounded (TakeOrderedAndProject). This is the "aggregate first,
    then enrich" plan that keeps the enrichment join tiny at any
    scale."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@_q(
    "tpch_q4_order_priority",
    """SELECT o_orderpriority, count(*) AS n_orders
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-04-01'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority counts for orders that have at least
    one qualifying line — the correlated-EXISTS pattern. In Spark the
    subquery is a LEFT SEMI join on the order key: the probe side
    keeps each order at most once with no post-join dedup, and the
    returned-flag filter shrinks the build side before the shuffle.
    At 100 TB the semi join is the cheapest of the join family here —
    it carries no payload columns from the build side at all."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# Q2-shape SQL shared between engines (only the table names differ) so
# the oracle cannot drift from the Spark text. {p}/{l}/{s} = part /
# lineitem / supplier relation names.
_Q2_SQL = """
    WITH best AS (
      SELECT p.p_partkey, p.p_type,
             min(l.l_suppkey) AS s_suppkey,
             round(min(l.l_extendedprice), 2) AS min_price
      FROM {p} p
      JOIN {l} l ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 10
        AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                                 FROM {l} l2
                                 WHERE l2.l_partkey = p.p_partkey)
      GROUP BY p.p_partkey, p.p_type
    )
    SELECT b.p_partkey, b.p_type, b.s_suppkey, s.s_name,
           round(s.s_acctbal, 2) AS s_acctbal, b.min_price
    FROM best b
    JOIN {s} s ON s.s_suppkey = b.s_suppkey
    ORDER BY s_acctbal DESC, p_partkey
"""


@_q(
    "tpch_q2_min_cost_supplier",
    _Q2_SQL.format(p="part", l="lineitem", s="supplier"),
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: the supplier offering each small part at its
    minimum observed price — the correlated-scalar-subquery pattern
    (testdata has no partsupp, so lineitem price stands in for
    ps_supplycost; ties resolve to the lowest supplier key).

    Expressed as Spark SQL on purpose: Catalyst's subquery
    decorrelation (RewriteCorrelatedScalarSubquery) turns the per-part
    `SELECT min(...) WHERE l2.l_partkey = p.p_partkey` into ONE
    per-key aggregate joined back on the part key — a single extra
    shuffle over lineitem instead of a scan per part. That rewrite is
    exactly what makes the shape survive 100 TB, and the plan test
    asserts no per-row subquery remains
    (tests/test_plan_quality.py::test_tpch_q2_decorrelates_scalar_subquery)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("q2_part")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q2_lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("q2_supplier")
    return spark.sql(
        _Q2_SQL.format(p="q2_part", l="q2_lineitem", s="q2_supplier")
    )


@_q(
    "tpch_q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
              round(CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 2)
                  AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    year(l.l_shipdate) AS l_year,
                    l.l_extendedprice * (1 - l.l_discount) AS volume
             FROM supplier s
             JOIN lineitem l ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
             WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
       GROUP BY supp_nation, cust_nation, l_year""",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: trade volume between two nations by year, in
    both directions. The disjunctive nation-pair predicate can only be
    applied AFTER both nation joins, but each nation dim is 25 rows —
    broadcast-hinted (fixed cardinality, safe at any SF) — so the only
    shuffles are the two fact-fact joins on order key and the final
    grouped aggregate. Year comes from the shipdate at line grain."""
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(pair)
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )


@_q(
    "tpch_q8_market_share",
    """WITH vol AS (
         SELECT year(o.o_orderdate) AS o_year,
                l.l_extendedprice * (1 - l.l_discount) AS volume,
                n2.n_name AS supp_nation
         FROM lineitem l
         JOIN orders o ON o.o_orderkey = l.l_orderkey
         JOIN customer c ON c.c_custkey = o.o_custkey
         JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
         JOIN region r ON n1.n_regionkey = r.r_regionkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
         WHERE r.r_name = 'ASIA')
       SELECT o_year,
              round(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_12'
                                       THEN volume ELSE 0 END
                                  AS DECIMAL(18,4))) AS DOUBLE)
                    / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE),
                    4) AS mkt_share
       FROM vol GROUP BY o_year""",
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of all revenue sold
    into a region, by order year — conditional aggregate over a
    snowflake join. region/nation are fixed-25-row dims (hard
    broadcast); customer and supplier scale with SF so their joins are
    left to AQE; numerator and denominator come out of ONE pass
    (sum of CASE), not two scans. Both sums are exact decimals before
    the double division, so the share is bit-identical across
    engines."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")
    )
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .alias("volume"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_12", F.col("volume"))
        .otherwise(F.lit(0.0))
        .cast("decimal(18,4)")
    ).cast("double")
    den = F.sum(F.col("volume").cast("decimal(18,4)")).cast("double")
    return vol.groupBy("o_year").agg(
        F.round(num / den, 4).alias("mkt_share")
    )


@_q(
    "tpch_q9_product_profit",
    """SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
              round(CAST(sum(CAST(
                  l.l_extendedprice * (1 - l.l_discount)
                  - 0.6 * p.p_retailprice * l.l_quantity
                  AS DECIMAL(18,4))) AS DOUBLE), 2) AS profit
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE p.p_name LIKE '%red%'
       GROUP BY nation, o_year""",
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit on a product family by supplier nation
    and year (testdata has no partsupp, so cost is modeled as 60% of
    retail price — the plan shape, a fact joined to three dims with a
    derived measure, is what's exercised). The part filter prunes
    ~1/9 of parts BEFORE the join; part and supplier scale with SF so
    AQE picks their join strategy; nation broadcasts."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(amount.cast("decimal(18,4)")).cast("double"), 2
            ).alias("profit")
        )
    )


@_q(
    "tpch_q12_late_shipments",
    """SELECT l.l_linestatus,
              CAST(sum(CASE WHEN o.o_orderpriority IN
                           ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_line_count,
              CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                           ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT)
                  AS low_line_count
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       GROUP BY l.l_linestatus""",
)
def tpch_q12_late_shipments(spark, sf_dir):
    """TPC-H Q12 shape: late-shipment counts split by order priority
    class (testdata has no shipmode/commitdate; lateness = shipped
    more than 60 days after ordering, which preserves the essential
    cross-table residual predicate). The date comparison references
    BOTH sides, so it cannot push below the join — it runs as a
    post-join filter on the single orders↔lineitem shuffle; the CASE
    split is one pass, integer-exact."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_q(
    "tpch_q13_customer_distribution",
    """WITH per_cust AS (
         SELECT c.c_custkey, count(o.o_orderkey) AS c_count
         FROM customer c
         LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '5-LOW'
         GROUP BY c.c_custkey)
       SELECT c_count, count(*) AS custdist
       FROM per_cust GROUP BY c_count""",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of orders-per-customer — a LEFT
    join whose filter lives in the JOIN CONDITION (moving it to WHERE
    would silently drop zero-order customers), then two stacked
    aggregates. The second groupBy keys on a count with very few
    distinct values — the classic skew point — but its input is
    already one row per customer, so the partial aggregate collapses
    each map partition to a handful of rows before the shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "tpch_q15_top_supplier",
    """WITH rev AS (
         SELECT l_suppkey AS supplier_no,
                round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(18,4))) AS DOUBLE), 2)
                    AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '2000-01-01'
           AND l_shipdate < TIMESTAMP '2000-04-01'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, r.total_revenue
       FROM rev r
       JOIN supplier s ON s.s_suppkey = r.supplier_no
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)""",
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly
    revenue — aggregate, then keep the rows equal to the aggregate's
    own max (ties all surface, per the spec). The revenue frame is
    one grouped aggregate over the date-pruned fact; the 1-row max
    joins back as a broadcast, and equality on cent-rounded exact
    decimal sums is engine-portable. The supplier dim joins AFTER the
    max filter, touching only the winning keys."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double"),
            2,
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "tpch_q16_parts_supplier",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       SELECT p.p_brand, p.p_type, p.p_size,
              CAST(count(DISTINCT ps.l_suppkey) AS BIGINT)
                  AS supplier_cnt
       FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
       WHERE p.p_brand <> 'Brand#2'
         AND p.p_type NOT LIKE 'MEDIUM%'
         AND p.p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
         AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
       GROUP BY p.p_brand, p.p_type, p.p_size""",
)
def tpch_q16_parts_supplier(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers can furnish parts matching a multi-predicate
    spec (brand exclusion + NOT LIKE type + size IN-list), excluding
    a complaint blocklist via NOT IN. Testdata has no partsupp, so
    the distinct (l_partkey, l_suppkey) relation stands in (the q11 /
    q20 convention); no s_comment either, so negative account balance
    stands in for the complaints predicate — both substitutions keep
    the Q16 plan shape intact: broadcast anti-join for NOT IN BEFORE
    the distinct (map-side, shrinks the shuffle), one pair-distinct
    shuffle, broadcast dimension filter, then a grouped
    count-distinct. At 100 TB the only wide exchanges are the two
    keyed by the well-distributed (partkey, suppkey) pair."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    excl = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = (
        li.join(
            F.broadcast(excl),
            li.l_suppkey == excl.s_suppkey,
            "left_anti",
        )
        .distinct()
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#2")
            & ~F.col("p_type").like("MEDIUM%")
            & F.col("p_size").isin([3, 9, 14, 19, 23, 36, 45, 49])
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias(
                "supplier_cnt"
            )
        )
    )


@_q(
    "tpch_q17_small_quantity",
    """WITH part_avg AS (
         SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
         FROM lineitem GROUP BY l_partkey)
       SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                    AS DOUBLE) / 7.0, 2) AS avg_yearly,
              count(*) AS n_lines
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN part_avg a ON a.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#3' AND l.l_quantity < a.qty_limit""",
)
def tpch_q17_small_quantity(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost by small-quantity orders of one
    brand — the correlated `avg per part` subquery written directly in
    its decorrelated form: one per-key aggregate over lineitem joined
    back on the part key (what Catalyst rewrites Q2's subquery into;
    here the DataFrame states it explicitly). The quantity threshold
    is exact: quantities are small integers, so their double sum — in
    any order — and the resulting avg are bit-identical across
    engines, making the `<` boundary engine-portable."""
    li = load(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double")
                / F.lit(7.0),
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "tpch_q19_disjunctive",
    """SELECT round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(18,4))) AS DOUBLE), 2)
                  AS revenue,
              count(*) AS n_lines
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity >= 1 AND l.l_quantity <= 11)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
              AND l.l_quantity >= 10 AND l.l_quantity <= 20)
          OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 35
              AND l.l_quantity >= 20 AND l.l_quantity <= 30)""",
)
def tpch_q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR of three AND-blocks that
    mix part attributes with lineitem attributes. The optimizer's job
    (and the test's point) is predicate decomposition: the
    part-only disjunction (brand+size) and the lineitem-only
    disjunction (quantity 1..30) are each implied by the OR, so
    Catalyst's constraint propagation pushes a relaxed filter into
    BOTH scans, and only the residual cross-side OR runs after the
    join."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "tpch_q22_dormant_customers",
    """WITH avg_bal AS (
         SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0),
       recent AS (
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '2001-01-01')
       SELECT substr(c.c_name, 18, 1) AS cntrycode,
              count(*) AS numcust,
              round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4)))
                         AS DOUBLE), 2) AS totacctbal
       FROM customer c, avg_bal
       WHERE c.c_acctbal > avg_bal.ab
         AND NOT EXISTS (SELECT 1 FROM recent r
                         WHERE r.o_custkey = c.c_custkey)
       GROUP BY cntrycode""",
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers with no RECENT orders
    (every testdata customer has some order, so the spec's "never
    ordered" becomes "not since 2001" — same NOT EXISTS plan), grouped
    by a derived code (here a digit of the customer name, standing in
    for the phone country code). Three decorrelation-relevant pieces:
    a scalar subquery (global avg balance) that becomes a 1-row
    broadcast; a NOT EXISTS that becomes a left-anti join against the
    distinct recent-buyer keys; and a derived grouping column. The
    avg threshold is sums-of-doubles over a fixed filter — exact
    enough only because acctbals are cent-quantized; the comparison
    uses the SAME float avg in both engines (sum order over <2^53
    cent-ints is exact)."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_ab")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 18, 1).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"),
                2,
            ).alias("totacctbal"),
        )
    )


@_q(
    "tpch_q11_important_stock",
    """WITH val AS (
         SELECT l.l_partkey,
                sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS v
         FROM lineitem l
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         WHERE n.n_name = 'NATION_3'
         GROUP BY l.l_partkey),
       tot AS (SELECT sum(v) AS t FROM val)
       SELECT l_partkey AS p_partkey,
              round(CAST(v AS DOUBLE), 2) AS part_value
       FROM val, tot
       WHERE CAST(v AS DOUBLE) > 0.001 * CAST(t AS DOUBLE)""",
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's traded value — a grouped aggregate filtered against a
    scalar aggregate OF ITSELF (testdata has no partsupp, so traded
    lineitem value stands in for stock value). The per-part frame is
    computed once; its global total re-aggregates the per-part rows
    (cheap: one row per part, not per line) and comes back as a 1-row
    broadcast crossJoin, so the fact scans once. Sums are exact
    decimals; the threshold compare runs on doubles derived from
    those exact sums, so the cut is engine-portable."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    val = (
        li.join(s, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
                .cast("decimal(18,4)")
            ).alias("v")
        )
    )
    tot = val.agg(F.sum("v").alias("_t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v").cast("double") > F.lit(0.001) * F.col("_t").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("v").cast("double"), 2).alias("part_value"),
        )
    )


@_q(
    "tpch_q20_dominant_supplier",
    """WITH ship AS (
         SELECT l.l_partkey, l.l_suppkey,
                sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_name LIKE 'small%'
           AND l.l_shipdate >= TIMESTAMP '1999-01-01'
           AND l.l_shipdate < TIMESTAMP '2000-01-01'
         GROUP BY l.l_partkey, l.l_suppkey),
       tot AS (SELECT l_partkey, sum(qty) AS total_qty
               FROM ship GROUP BY l_partkey)
       SELECT DISTINCT s.s_suppkey, s.s_name
       FROM ship sh
       JOIN tot t ON t.l_partkey = sh.l_partkey
       JOIN supplier s ON s.s_suppkey = sh.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE n.n_name = 'NATION_5'
         AND CAST(sh.qty AS DOUBLE) > 0.5 * CAST(t.total_qty AS DOUBLE)""",
)
def tpch_q20_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in one nation who shipped MORE THAN
    HALF of a part family's yearly volume (testdata has no partsupp,
    so "holds excess stock" becomes "dominates observed shipments" —
    the same nested-aggregate-then-semijoin plan). Per-(part,supplier)
    quantities aggregate once; the per-part total is a window over
    the part key on that already-collapsed frame (one extra shuffle of
    part×supplier rows, never of raw lines). >0.5× guarantees at most
    one dominant supplier per part, and 0.5 is a power of two, so the
    double compare of exact decimal sums is engine-portable. The
    supplier dim joins only the surviving keys; nation broadcasts."""
    from pyspark.sql import Window

    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    ship = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ship.withColumn("total_qty", F.sum("qty").over(w))
        .filter(
            F.col("qty").cast("double")
            > F.lit(0.5) * F.col("total_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(dominant, s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@_q(
    "tpch_q21_waiting_supplier",
    """WITH base AS (
         SELECT l.l_orderkey, l.l_suppkey,
                (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE o.o_orderstatus = 'F')
       SELECT s.s_name, count(*) AS numwait
       FROM base l1
       JOIN supplier s ON s.s_suppkey = l1.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE l1.late AND n.n_name = 'NATION_7'
         AND EXISTS (SELECT 1 FROM base l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM base l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.late)
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name
       LIMIT 10""",
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers in one nation who were the SOLE
    late supplier on a finished multi-supplier order — the classic
    EXISTS + NOT EXISTS double correlation (lateness = shipped >60
    days after ordering, matching tpch_q12's commitdate stand-in).
    The order-scoped line frame is built ONCE (lineitem⋈orders with a
    derived late flag) and reused three ways: as the probe (late lines
    of the target nation's suppliers), as a LEFT SEMI join on the
    order key with a `suppkey <>` residual (the EXISTS), and as a
    LEFT ANTI join with the extra late residual (the NOT EXISTS).
    Both self-joins are equi-joins on the order key — the correlation
    never becomes a per-row subquery — and integer counts with a name
    tie-break make the top-10 cut deterministic."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey", "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("late"),
        )
    )
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l1 = (
        base.filter("late")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = base.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = base.filter("late").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.o3) & (F.col("l_suppkey") != l3.s3),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
