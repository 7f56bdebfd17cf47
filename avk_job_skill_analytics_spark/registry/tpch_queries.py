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
    for one market segment. The segment-filtered customer dim
    broadcasts (the orders side never shuffles for it); orders ↔
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
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
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
