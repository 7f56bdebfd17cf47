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

Oracle parity: revenue sums rounded to cents before ranking so both
engines rank identical doubles; LIMIT ties broken by key.
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
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
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
    limit boundary is deterministic and engine-portable."""
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
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
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
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
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
    cent-rounded with a key tie-break so the limit boundary is
    deterministic across engines."""
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
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
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
