"""Core operator inventory (SURVEY.md §2.2-2.7) bound to driver testdata.

Each query maps a reference capability (BI visual / pipeline op) onto
the synthetic star schema per FIXTURES.md §B, with the equivalent
DuckDB SQL for the correctness oracle. Conventions for oracle parity:

- every computed column is aliased identically on both sides;
- double aggregates are rounded (sum/avg drift is below 1e-8 relative,
  far from the rounding boundary);
- int-ish derived values are cast to BIGINT on both sides (DuckDB
  returns HUGEINT for integer sums, BIGINT for month());
- every LIMIT has a deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import analytics as A
from ..operators import sampling, setops
from ..plans.schemas import load
from ..plans.session import tiny_df

QUERIES = {}
ORACLES = {}


def _q(name, oracle=None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return reg


# --------------------------------------------------------------- A1: count
@_q("a1_total_count", "SELECT count(o_orderkey) AS total_orders FROM orders")
def a1_total_count(spark, sf_dir):
    """A1 CountNonNull — 'Total Jobs Posted' card ≙ count(orders)."""
    return A.count_nonnull(load(spark, sf_dir, "orders"), "o_orderkey", "total_orders")


# ------------------------------------------------------ A2: distinct counts
@_q(
    "a2_distinct_counts",
    """SELECT count(DISTINCT c_mktsegment) AS n_segments,
              count(DISTINCT c_nationkey) AS n_nations
       FROM customer""",
)
def a2_distinct_counts(spark, sf_dir):
    """A2 — 'Total Companies Hiring' / 'unique Cities' cards."""
    return A.kpi_cards(
        load(spark, sf_dir, "customer"),
        {
            "n_segments": F.countDistinct("c_mktsegment"),
            "n_nations": F.countDistinct("c_nationkey"),
        },
    )


# --------------------------------------------------- A3/A4/A5: KPI scalars
@_q(
    "a3_a5_kpi_cards",
    """SELECT round(avg(o_totalprice), 2) AS avg_price,
              round(min(o_totalprice), 2) AS min_price,
              round(max(o_totalprice), 2) AS max_price,
              round(sum(o_totalprice), 2) AS sum_price,
              max(o_orderdate) AS latest_order
       FROM orders""",
)
def a3_a5_kpi_cards(spark, sf_dir):
    """A3 avg / A4 min-max (incl. max(date) 'Recent job date') / A5 sum
    — all KPI cards in one scan."""
    return A.kpi_cards(
        load(spark, sf_dir, "orders"),
        {
            "avg_price": F.round(F.avg("o_totalprice"), 2),
            "min_price": F.round(F.min("o_totalprice"), 2),
            "max_price": F.round(F.max("o_totalprice"), 2),
            "sum_price": F.round(F.sum("o_totalprice"), 2),
            "latest_order": F.max("o_orderdate"),
        },
    )


# ------------------------------------------------------ A6: count by dim
@_q(
    "a6_count_by_dim",
    "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def a6_count_by_dim(spark, sf_dir):
    """A6 — jobs per site/company/city donut ≙ events per type."""
    return A.count_by_dim(load(spark, sf_dir, "events"), "event_type")


# ------------------------------------------- A7: multi-key agg (flagship)
@_q(
    "a7_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2)                                   AS sum_qty,
              round(sum(l_extendedprice), 2)                              AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              round(avg(l_quantity), 2)                                   AS avg_qty,
              round(avg(l_extendedprice), 2)                              AS avg_price,
              round(avg(l_discount), 4)                                   AS avg_disc,
              count(*)                                                    AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def a7_pricing_summary(spark, sf_dir):
    """A7 multi-key grouped agg — the engine's flagship (TPC-H-Q1-shaped:
    scan → 8-way hash agg with map-side partials → tiny result).
    At 100 TB this is one shuffle of |groups| rows per partition."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return A.grouped_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": F.round(F.sum("l_quantity"), 2),
            "sum_base_price": F.round(F.sum("l_extendedprice"), 2),
            "sum_disc_price": F.round(F.sum(disc), 2),
            "sum_charge": F.round(F.sum(disc * (1 + F.col("l_tax"))), 2),
            "avg_qty": F.round(F.avg("l_quantity"), 2),
            "avg_price": F.round(F.avg("l_extendedprice"), 2),
            "avg_disc": F.round(F.avg("l_discount"), 4),
            "count_order": F.count(F.lit(1)),
        },
    )


# ----------------------------------------------------------- A8: argmax
@_q(
    "a8_argmax_top_type",
    """SELECT event_type, count(*) AS cnt FROM events
       GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 1""",
)
def a8_argmax_top_type(spark, sf_dir):
    """A8 — 'Top Hiring City' argmax (recovered DAX TOPN(1,...) form)."""
    return A.top_n_by_agg(
        load(spark, sf_dir, "events"), "event_type", F.count(F.lit(1)), 1
    )


# ------------------------------------------------- A9: time-scoped count
@_q(
    "a9_events_latest_month",
    """SELECT count(*) AS n FROM events
       WHERE date_trunc('month', ts) =
             (SELECT date_trunc('month', max(ts)) FROM events)""",
)
def a9_events_latest_month(spark, sf_dir):
    """A9 — 'Jobs this month' (month of the latest timestamp)."""
    return A.time_scoped_count(load(spark, sf_dir, "events"), "ts")


# ------------------------------------------------------ A10: ratio of aggs
@_q(
    "a10_events_per_day",
    """SELECT round(count(*) / count(DISTINCT CAST(ts AS DATE)), 4)
              AS per_day FROM events""",
)
def a10_events_per_day(spark, sf_dir):
    """A10 — 'Average Jobs per Day' = count / distinct days."""
    return A.ratio_per_day(load(spark, sf_dir, "events"), "ts")


# -------------------------------------------------- A11: percent of total
@_q(
    "a11_pct_of_total",
    """SELECT event_type, count(*) AS cnt,
              round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
       FROM events GROUP BY event_type""",
)
def a11_pct_of_total(spark, sf_dir):
    """A11 — donut percent labels (83.06% / 16.94%)."""
    return A.pct_of_total(load(spark, sf_dir, "events"), "event_type")


# ------------------------------------- A12/F6: exploded token counts
@_q(
    "a12_top_tokens",
    """SELECT token, count(*) AS cnt
       FROM (SELECT lower(trim(unnest(string_split(text, ' ')))) AS token
             FROM documents) t
       WHERE token <> ''
       GROUP BY token ORDER BY cnt DESC, token LIMIT 20""",
)
def a12_top_tokens(spark, sf_dir):
    """A12 — 'Top 10 Skills' over the exploded bridge ≙ top document
    tokens. explode(split) → hash agg → TakeOrderedAndProject."""
    return A.exploded_counts(
        load(spark, sf_dir, "documents"), ["doc_id"], "text",
        token_alias="token", n=20, sep=" ",
    )


# --------------------------------------------------- J1: manifest anti-join
@_q(
    "j1_anti_join",
    """SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users
       FROM events e
       WHERE NOT EXISTS (SELECT 1 FROM events s
                         WHERE s.event_type = 'signup'
                           AND s.user_id = e.user_id)""",
)
def j1_anti_join(spark, sf_dir):
    """J1 — processed-file set-difference ≙ events from users with no
    signup event (left_anti against a broadcast exclusion set)."""
    ev = load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    kept = setops.anti_join(ev, signups, "user_id")
    return kept.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------- J2: top-N semi-join
@_q(
    "j2_topn_semijoin",
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
       FROM events
       WHERE user_id IN (SELECT user_id FROM events
                         GROUP BY user_id
                         ORDER BY count(*) DESC, user_id LIMIT 3)
       GROUP BY user_id""",
)
def j2_topn_semijoin(spark, sf_dir):
    """J2 — the PBIX 'Top N' filter: fact rows restricted to the top-3
    categories, then re-aggregated. Broadcast left-semi: fact side is
    never shuffled for the filter."""
    ev = load(spark, sf_dir, "events")
    kept = A.topn_semijoin(ev, "user_id", F.count(F.lit(1)), 3)
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# -------------------------------------------------- J2 (window-rank form)
@_q(
    "j2_topn_window",
    """SELECT c_mktsegment, cnt FROM (
         SELECT c_mktsegment, count(*) AS cnt,
                row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) AS rk
         FROM customer GROUP BY c_mktsegment) t
       WHERE rk <= 2""",
)
def j2_topn_window(spark, sf_dir):
    """J2 (rank form) — 'Top 2 Job Posting Sites' via dense ranking of
    the aggregated (tiny) result."""
    return A.topn_by_rank(
        load(spark, sf_dir, "customer"), "c_mktsegment", F.count(F.lit(1)), 2
    )


# ------------------------------------------------------ J3: bridge join
@_q(
    "j3_bridge_join",
    """SELECT d.lang, count(*) AS n_tokens, count(DISTINCT b.token) AS n_distinct
       FROM (SELECT doc_id, lower(trim(unnest(string_split(text, ' ')))) AS token
             FROM documents) b
       JOIN documents d ON b.doc_id = d.doc_id
       WHERE b.token <> ''
       GROUP BY d.lang""",
)
def j3_bridge_join(spark, sf_dir):
    """J3 — job_data ⋈ jobskills relationship join: the exploded token
    bridge joined back to its dimension row, aggregated by a dimension
    attribute."""
    docs = load(spark, sf_dir, "documents")
    bridge = A.explode_delimited(docs, ["doc_id"], "text", "token", sep=" ")
    joined = A.bridge_join(docs.select("doc_id", "lang"), bridge, "doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct"),
    )


# ----------------------------------------------------------- O3: top-k rows
@_q(
    "o3_topk_customers",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
       ORDER BY c_acctbal DESC, c_custkey LIMIT 10""",
)
def o3_topk_customers(spark, sf_dir):
    """O3 — 'Top 10 ...' raw-row top-k (TakeOrderedAndProject)."""
    return A.top_n_rows(
        load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal"),
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        10,
    )


# ------------------------------------------------------- O4: sampling
@_q(
    "o4_sample_hash",
    """SELECT c_custkey, c_name FROM customer
       WHERE (((((((c_custkey % 4294967296) // 65536) * 2654435761) % 65536) * 65536 + ((c_custkey % 4294967296) % 65536) * 2654435761) % 4294967296) * 100) // 4294967296 < 10""",
)
def o4_sample_hash(spark, sf_dir):
    """O4 — deterministic engine-portable sample (multiplicative hash
    bucket). The seeded-RNG variants live in operators/sampling.py;
    this form is the oracle-verifiable one."""
    return sampling.sample_hash_bucket(
        load(spark, sf_dir, "customer"), "c_custkey", 10
    ).select("c_custkey", "c_name")


@_q(
    "o4_sample_stratified",
    """SELECT o_orderkey, o_orderpriority FROM orders
       WHERE (((((((o_orderkey % 4294967296) // 65536) * 2654435761) % 65536) * 65536 + ((o_orderkey % 4294967296) % 65536) * 2654435761) % 4294967296) * 100) // 4294967296 <
             CASE o_orderpriority
               WHEN '1-URGENT' THEN 30
               WHEN '2-HIGH' THEN 10
               ELSE 5 END""",
)
def o4_sample_stratified(spark, sf_dir):
    """O4 — deterministic stratified sample: per-stratum keep-rates
    (urgent 30%, high 10%, rest 5%) through the multiplicative
    hash-bucket rule, so both engines select the exact same rows.
    The RNG twin is operators/sampling.sample_by (df.sampleBy)."""
    return sampling.sample_stratified(
        load(spark, sf_dir, "orders"),
        "o_orderpriority",
        "o_orderkey",
        {"1-URGENT": 30, "2-HIGH": 10},
        default_pct=5,
    ).select("o_orderkey", "o_orderpriority")


@_q(
    "o4_split_assign",
    """SELECT split, source, count(*) AS n_docs,
              CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                       x -> x <> ''))) AS BIGINT) AS n_tokens
       FROM (SELECT *,
                    CASE WHEN (((((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536 + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296) * 100) // 4294967296 < 90
                           THEN 'train'
                         WHEN (((((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536 + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296) * 100) // 4294967296 < 95
                           THEN 'val'
                         ELSE 'test' END AS split
             FROM documents) s
       GROUP BY split, source""",
)
def o4_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (90/5/5) of the corpus by
    the engine-portable hash rule (operators/sampling.assign_split),
    rolled up per (split, source) with token counts — the
    mix-balance report a training pipeline checks before writing
    shards. Adding documents never moves an existing one between
    splits, which keeps eval sets uncontaminated as the corpus
    grows."""
    docs = sampling.assign_split(
        load(spark, sf_dir, "documents"), "doc_id"
    )
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    )
    return docs.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("long")).alias("n_tokens"),
    )


# ---------------------------------------------------------- U1: union
@_q(
    "u1_union_by_name",
    """SELECT kind, count(*) AS cnt, round(sum(acctbal), 2) AS total_bal FROM (
         SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
         UNION ALL
         SELECT s_name, s_acctbal, 'supplier' FROM supplier) u
       GROUP BY kind""",
)
def u1_union_by_name(spark, sf_dir):
    """U1 — pd.concat of normalized sources (kaggle + HF ≙ customer +
    supplier projected to a shared schema)."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return setops.union_by_name([cust, supp]).groupBy("kind").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("acctbal"), 2).alias("total_bal"),
    )


# ------------------------------------------------- U2: keep-first dedup
@_q(
    "u2_dedup_keep_first",
    """SELECT event_id, user_id, event_type FROM (
         SELECT event_id, user_id, event_type,
                row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY event_id) AS rn
         FROM events) t
       WHERE rn = 1""",
)
def u2_dedup_keep_first(spark, sf_dir):
    """U2 — drop_duplicates(keep='first') with a deterministic winner
    (lowest event_id ≙ pandas input order)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return setops.dedup_keep_first(ev, ["user_id", "event_type"], [F.asc("event_id")])


# ------------------------------------------------------ P3: isin filter
@_q(
    "p3_isin_filter",
    """SELECT o_orderpriority, count(*) AS cnt FROM orders
       WHERE lower(o_orderpriority) IN ('1-urgent', '2-high')
       GROUP BY o_orderpriority""",
)
def p3_isin_filter(spark, sf_dir):
    """P3 — equality-set filter (country isin, case-normalized)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.lower(F.col("o_orderpriority")).isin("1-urgent", "2-high"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ----------------------------------------------------- P4: regex filter
@_q(
    "p4_regex_filter",
    """SELECT lang, count(*) AS cnt FROM documents
       WHERE regexp_matches(text, '\\b(spark|query)\\b')
       GROUP BY lang""",
)
def p4_regex_filter(spark, sf_dir):
    """P4 — word-boundary regex predicate (US-location filter shape),
    with NULL→false semantics (na=False)."""
    d = load(spark, sf_dir, "documents")
    pred = F.coalesce(F.col("text").rlike(r"\b(spark|query)\b"), F.lit(False))
    return d.filter(pred).groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))


# ----------------------------------------------------- P5: range filter
@_q(
    "p5_range_filter",
    """SELECT count(*) AS n, round(avg(l_extendedprice), 2) AS avg_price
       FROM lineitem WHERE l_extendedprice BETWEEN 10000 AND 50000""",
)
def p5_range_filter(spark, sf_dir):
    """P5 — salary-outlier band filter (NULLs drop automatically)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_extendedprice").between(10000, 50000)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
    )


# ------------------------------------------- P7: slicer filter context
@_q(
    "p7_filtered_agg",
    """SELECT event_type, count(*) AS cnt,
              round(sum(value), 2) AS total_value
       FROM events
       WHERE month(ts) = 1 AND user_id % 2 = 0
       GROUP BY event_type""",
)
def p7_filtered_agg(spark, sf_dir):
    """P7 — the BI slicer filter context: every dashboard query takes
    parameterizing WHERE clauses (site + Month/Day slicers in the
    reference). Here the standard grouped aggregate runs under a
    month slicer + a user-segment slicer via the ``filters``
    parameter every analytics builder accepts."""
    e = load(spark, sf_dir, "events")
    return A.grouped_agg(
        e,
        ["event_type"],
        {
            "cnt": F.count(F.lit(1)),
            "total_value": F.round(F.sum("value"), 2),
        },
        filters=[F.month("ts") == 1, F.col("user_id") % 2 == 0],
    )


# ---------------------------------------- J5: fact-to-fact join (beyond)
@_q(
    "j5_fact_fact_revenue",
    """SELECT month(o_orderdate) AS order_month,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              count(*) AS n_items
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderstatus = 'O'
       GROUP BY order_month
       ORDER BY revenue DESC, order_month LIMIT 10""",
)
def j5_fact_fact_revenue(spark, sf_dir):
    """Beyond-reference large-to-large equi join (lineitem ⋈ orders on
    the order key): the shape AQE resolves to a shuffled sort-merge /
    hash join at scale, with the status filter pushed below the join.
    Every reference join is small-side broadcast (J1-J3); this query
    covers the other physical path."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        joined.groupBy(F.month("o_orderdate").alias("order_month"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("order_month"))
        .limit(10)
    )


@_q(
    "j6_asof_attribution",
    """WITH c AS (SELECT user_id, ts AS click_ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
       p AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'purchase')
       SELECT p.event_id, p.user_id, p.ts, c.click_id,
              epoch_us(p.ts - c.click_ts) AS us_since_click
       FROM p ASOF LEFT JOIN c
         ON p.user_id = c.user_id AND p.ts >= c.click_ts""",
)
def j6_asof_attribution(spark, sf_dir):
    """Beyond-reference as-of join: each purchase attributed to the
    user's most recent prior (or simultaneous) click. Spark has no
    native as-of operator — operators/temporal.py expresses it as the
    union trick (tag, union, one last-ignorenulls window per key):
    one shuffle, no pair explosion on hot users. The oracle is
    DuckDB's native ASOF LEFT JOIN. Clicks pre-aggregate to one row
    per (user, instant) so tie-breaks agree across engines."""
    from ..operators import temporal

    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    j = temporal.asof_join(p, c, on="user_id", left_time="ts",
                           right_time="click_ts")
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "click_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("us_since_click"),
    )


_PRICE_BANDS = [
    ("low", 0.0, 30000.0),
    ("mid", 30000.0, 60000.0),
    ("high", 60000.0, 90000.0),
    ("premium", 90000.0, 200000.0),
]


@_q(
    "j7_range_band_join",
    f"""SELECT band, count(*) AS n_items,
              round(sum(l_extendedprice), 2) AS revenue
       FROM lineitem
       JOIN (VALUES {", ".join(f"('{b}', CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))" for b, lo, hi in _PRICE_BANDS)})
            AS bands(band, lo, hi)
         ON l_extendedprice >= lo AND l_extendedprice < hi
       GROUP BY band""",
)
def j7_range_band_join(spark, sf_dir):
    """Beyond-reference range join: price-band classification via the
    binned equi-join spelling (operators/rangejoin.py) — bands
    replicate to the bins they overlap, facts hash to one bin, and the
    theta condition survives only as a residual filter. With 4 bands a
    nested-loop would also do; the spelling is the one that still
    works with 10^5 intervals. The oracle uses the plain BETWEEN
    join."""
    from ..operators.rangejoin import binned_range_join

    li = load(spark, sf_dir, "lineitem")
    bands = tiny_df(
        spark, _PRICE_BANDS, "band string, lo double, hi double"
    )
    joined = binned_range_join(li, "l_extendedprice", bands,
                               "lo", "hi", bin_width=30000.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


# ----------------------------------------- U3: intersect / except cohorts
@_q(
    "u3_cohort_set_ops",
    """SELECT 'retained' AS cohort, o_custkey FROM (
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         INTERSECT
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01') r
       UNION ALL
       SELECT 'churned' AS cohort, o_custkey FROM (
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         EXCEPT
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01') x""",
)
def u3_cohort_set_ops(spark, sf_dir):
    """U3 (beyond reference) — INTERSECT / EXCEPT set semantics as a
    retention cohort: customers ordering in both 1996 and 1997
    (retained) vs 1996-only (churned). SURVEY.md §2.7 records the
    reference has no intersect/except; Spark's set operators compile
    to aggregate-style hash semi/anti joins on the distinct key sets,
    so both cohorts come from two scans of the same pushed-down date
    slices — no full-table shuffle."""
    o = load(spark, sf_dir, "orders")

    def year_keys(lo, hi):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = year_keys("1996-01-01", "1997-01-01")
    y97 = year_keys("1997-01-01", "1998-01-01")
    retained = y96.intersect(y97).select(
        F.lit("retained").alias("cohort"), "o_custkey"
    )
    # EXCEPT DISTINCT (not exceptAll) so the set semantics match the
    # oracle's EXCEPT independently of year_keys' upstream distinct
    churned = y96.subtract(y97).select(
        F.lit("churned").alias("cohort"), "o_custkey"
    )
    return retained.unionByName(churned)


@_q(
    "o4_sample_weighted",
    """SELECT doc_id, n_chars
       FROM documents
       WHERE CAST((((((((doc_id % 4294967296) // 65536) * 2654435761) % 65536) * 65536 + ((doc_id % 4294967296) % 65536) * 2654435761) % 4294967296) * 1000000)
                  // 4294967296 AS DOUBLE)
             < least(1.0, greatest(0.0, n_chars / 400.0)) * 1000000.0""",
)
def o4_sample_weighted(spark, sf_dir):
    """Deterministic importance sampling (O4 scale path): each
    document kept with probability proportional to its length
    (n_chars/400, clamped to 1) via the engine-portable
    multiplicative hash — the quality-weighted downsampling move of a
    training-data mix (operators/sampling.sample_weighted)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.sample_weighted(
        d, "doc_id", F.col("n_chars") / F.lit(400.0)
    )


def _priority_sample_sql(k: int) -> str:
    from ..operators.hashing import md5_long_sql

    pr = md5_long_sql("concat('psample-v1|', CAST(doc_id AS VARCHAR))")
    return f"""SELECT doc_id, priority FROM (
         SELECT doc_id, {pr} AS priority FROM documents) t
       ORDER BY priority LIMIT {k}"""


@_q("o4_priority_sample", _priority_sample_sql(200))
def o4_priority_sample(spark, sf_dir):
    """Exact-k MERGEABLE uniform sample
    (operators/sampling.priority_sample): deterministic bottom-k by
    hashed priority — the order-statistics sample that composes
    across partitions, days, and engines (min-k of a union = min-k of
    min-k's), unlike rand()-based reservoirs whose RNG state can't be
    merged. Plan is TakeOrderedAndProject: per-partition bounded heap,
    one k-row merge, no global sort — the only sample_exact_n
    replacement that stays exact AND mergeable at 100 TB."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    return sampling.priority_sample(d, "doc_id", k=200)


@_q(
    "u4_upsert_keep_latest",
    """WITH target AS (
         SELECT o_orderkey, o_totalprice, 1 AS version FROM orders),
       updates AS (
         SELECT o_orderkey,
                CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST(1.1 AS DECIMAL(2,1)), 2)
                     AS DOUBLE) AS o_totalprice,
                2 AS version
         FROM orders WHERE o_orderkey % 10 = 0),
       merged AS (
         SELECT *, row_number() OVER (
                    PARTITION BY o_orderkey
                    ORDER BY version DESC) AS rn
         FROM (SELECT * FROM target UNION ALL SELECT * FROM updates))
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, version
       FROM merged WHERE rn = 1""",
)
def u4_upsert_keep_latest(spark, sf_dir):
    """MERGE-style upsert (operators/setops.upsert_keep_latest): a
    changeset re-pricing every 10th order (version 2) merged into the
    full order book (version 1); per key the highest version wins.
    The union never shuffles; the keep-latest window is ONE shuffle
    on the order key."""
    o = load(spark, sf_dir, "orders")
    target = o.select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("version")
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        # exact decimal re-pricing, rounded BEFORE the double cast:
        # x*1.1 frequently lands on a half-cent, where double rounding
        # is engine-dependent but decimal rounding is not
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(2,1)"),
            2,
        )
        .cast("double")
        .alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    merged = setops.upsert_keep_latest(
        target, updates, ["o_orderkey"], "version"
    )
    return merged.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "version",
    )


@_q(
    "u6_cdc_apply",
    """WITH log AS (
         SELECT o_orderkey, o_totalprice, 'U' AS op, 0 AS seq, 0 AS src
         FROM orders
         UNION ALL
         SELECT o_orderkey,
                CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST('0.9' AS DECIMAL(2,1)), 2) AS DOUBLE),
                'U', 1, 1
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey + 10000000, CAST(42.42 AS DOUBLE), 'U', 1, 1
         FROM orders WHERE o_orderkey % 100 = 0
         UNION ALL
         SELECT o_orderkey, CAST(NULL AS DOUBLE), 'D', 2, 1
         FROM orders WHERE o_orderkey % 10 = 0),
       merged AS (
         SELECT *, row_number() OVER (PARTITION BY o_orderkey
                     ORDER BY seq DESC, src DESC) AS rn
         FROM log)
       SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
       FROM merged WHERE rn = 1 AND op <> 'D'""",
)
def u6_cdc_apply(spark, sf_dir):
    """CDC changelog apply (operators/setops.cdc_apply) — the U-family
    step beyond upsert: a change log carrying re-pricing updates
    (seq 1, every 7th key), brand-new keys (inserts are just updates
    to unseen keys), and DELETE tombstones (seq 2, every 10th key) is
    applied in one pass. Per key the highest-sequence entry wins and
    a winning tombstone removes the key — keys hit by both an update
    and a later delete (70, 140, ...) must vanish. Union + one keyed
    window shuffle; the delete needs no anti-join pass."""
    o = load(spark, sf_dir, "orders")
    target = o.select(
        "o_orderkey", "o_totalprice",
        F.lit("U").alias("op"), F.lit(0).alias("seq"),
    )
    upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.round(
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("0.9").cast("decimal(2,1)"),
            2,
        ).cast("double").alias("o_totalprice"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    ins = o.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit(42.42).alias("o_totalprice"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    dels = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit("D").alias("op"), F.lit(2).alias("seq"),
    )
    final = setops.cdc_apply(
        target, upd.unionByName(ins).unionByName(dels),
        ["o_orderkey"], "seq",
    )
    return final.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )


@_q(
    "f15_winsorize",
    """WITH pct AS (SELECT quantile_cont(o_totalprice, 0.05) AS lo,
                           quantile_cont(o_totalprice, 0.95) AS hi
                    FROM orders)
       SELECT o_orderstatus,
              count(*) AS n,
              count(*) FILTER (WHERE o_totalprice < lo) AS n_clip_lo,
              count(*) FILTER (WHERE o_totalprice > hi) AS n_clip_hi,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18, 4)))
                             FILTER (WHERE o_totalprice >= lo
                                       AND o_totalprice <= hi) AS DOUBLE)
                    + count(*) FILTER (WHERE o_totalprice < lo) * lo
                    + count(*) FILTER (WHERE o_totalprice > hi) * hi,
                    2) AS winsorized_sum
       FROM orders, pct GROUP BY o_orderstatus, lo, hi""",
)
def f15_winsorize(spark, sf_dir):
    """Winsorization — outlier clamping at the exact interpolated
    p05/p95, the robust-statistics cleaning step sitting next to the
    reference's sentinel fills (F13). The two percentiles are one
    1-row aggregate broadcast over the fact (the same scalar pattern
    as tpch_q11); the clamp itself is a scan-level CASE. Parity note:
    the winsorized sum is assembled as exact-DECIMAL middle mass plus
    count×bound products in a FIXED addition order, because summing
    the clamped doubles directly would accumulate in partition order
    and can flip the cent rounding between engines."""
    o = load(spark, sf_dir, "orders")
    # one array-percentile agg: two scalar percentile aggs each buffer
    # and sort their own copy of the column (group_percentiles fix)
    pct = o.agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.05), F.lit(0.95))
        ).alias("_ps")
    ).select(
        F.col("_ps")[0].alias("lo"), F.col("_ps")[1].alias("hi")
    )
    j = o.crossJoin(F.broadcast(pct))
    price, lo, hi = F.col("o_totalprice"), F.col("lo"), F.col("hi")
    mid_sum = F.sum(
        F.when((price >= lo) & (price <= hi), price.cast("decimal(18,4)"))
    )
    n_lo = F.count(F.when(price < lo, 1))
    n_hi = F.count(F.when(price > hi, 1))
    return j.groupBy("o_orderstatus", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        n_lo.alias("n_clip_lo"),
        n_hi.alias("n_clip_hi"),
        F.round(
            mid_sum.cast("double") + n_lo * lo + n_hi * hi, 2
        ).alias("winsorized_sum"),
    ).drop("lo", "hi")


@_q(
    "u5_table_diff",
    """WITH v1 AS (SELECT o_orderkey AS k,
                       md5(concat_ws('|', o_orderstatus,
                           CAST(round(o_totalprice, 2) AS VARCHAR),
                           o_orderpriority)) AS h
              FROM orders WHERE o_orderkey % 97 <> 0),
       v2 AS (SELECT o_orderkey AS k,
                     md5(concat_ws('|', o_orderstatus,
                         CAST(round(CASE WHEN o_orderkey % 13 = 0
                                         THEN o_totalprice + 1
                                         ELSE o_totalprice END, 2)
                              AS VARCHAR),
                         o_orderpriority)) AS h
              FROM orders WHERE o_orderkey % 89 <> 0)
       SELECT CASE WHEN v1.k IS NULL THEN 'added'
                   WHEN v2.k IS NULL THEN 'removed'
                   ELSE 'changed' END AS change_type,
              count(*) AS n_rows,
              CAST(min(coalesce(v1.k, v2.k)) AS BIGINT) AS min_key,
              CAST(max(coalesce(v1.k, v2.k)) AS BIGINT) AS max_key
       FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
       WHERE v1.k IS NULL OR v2.k IS NULL OR v1.h <> v2.h
       GROUP BY change_type""",
)
def u5_table_diff(spark, sf_dir):
    """Row-level diff of two table versions — the migration/audit
    companion to io_table_checksum when the checksums DISAGREE and
    you need to know where: full outer join on the key comparing a
    canonical content hash, classifying every divergent row as
    added / removed / changed. One key-partitioned join; the content
    hash collapses arbitrary row width to 32 bytes before the
    shuffle. Versions are synthesized deterministically (v1 drops
    key%97, v2 drops key%89 and perturbs key%13 prices) so the
    expected ledger is knowable."""
    o = load(spark, sf_dir, "orders")

    def canon(price_col):
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderstatus"),
                F.round(price_col, 2).cast("string"),
                F.col("o_orderpriority"),
            )
        )

    v1 = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k1"), canon(F.col("o_totalprice")).alias("h1")
    )
    v2 = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k2"),
        canon(
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice"))
        ).alias("h2"),
    )
    j = v1.join(v2, v1.k1 == v2.k2, "full_outer").filter(
        F.col("k1").isNull()
        | F.col("k2").isNull()
        | (F.col("h1") != F.col("h2"))
    )
    return (
        j.select(
            F.when(F.col("k1").isNull(), F.lit("added"))
            .when(F.col("k2").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed"))
            .alias("change_type"),
            F.coalesce("k1", "k2").alias("k"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").cast("long").alias("min_key"),
            F.max("k").cast("long").alias("max_key"),
        )
    )
