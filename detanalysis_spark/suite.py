"""Declared query suite: every entry pairs a Spark plan (built on the
engine API) with an ANSI-SQL oracle DuckDB can run on the same parquet.

Hash-stability rules (the driver compares order-insensitive value
hashes):
- Money sums use exact integer cents: ``sum(cast(round(x*100) as
  bigint))`` — integer addition is associative, so Spark's partial
  aggregation order cannot change the result, and DuckDB produces the
  identical integer. Derived stats (averages) are computed from those
  exact integers with textually identical formulas on both sides.
- Percentile/interpolation outputs are rounded to 6 decimals.
- No raw timestamps in outputs — formatted strings or epoch integers.
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analyzer import Analyzer, EVENT_INDEX
from .operators import hist1d_df, bucket_expr, assign_bin
from .operators.stats import SIGMA_LO_PCT, SIGMA_HI_PCT
from .semiautocut import Semiautocut, MasterSemiautocuts, _SIG_LO, _SIG_HI
from .sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def cents(col: F.Column) -> F.Column:
    """Exact integer cents of a 2-decimal double (hash-stable sums)."""
    return F.round(col * 100).cast("long")


# ----------------------------------------------------------------------
# flagship: Analyzer lifecycle — load → feature → cut → global filter →
# grouped stats (SURVEY §3.1 / M0). Exercises S1, S6, P1, P5, E2, A1, A2.
# ----------------------------------------------------------------------
@query("flagship_event_cut_stats", oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       round(sum(CAST(round(value*100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_value
FROM events
WHERE value > 1.0 AND event_type IN ('click','view','purchase')
GROUP BY event_type
""")
def flagship_event_cut_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.register_cut("event_type IN ('click','view','purchase')", "c_web")
    ana.apply_global_filter("value > 1.0")
    view = ana._subset_df(ana.df, "c_web")
    return (view.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents(F.col("value"))).alias("sum_value_cents"))
            .withColumn("avg_value",
                        F.round(F.col("sum_value_cents") / 100.0 / F.col("n"), 6)))


# ----------------------------------------------------------------------
# TPC-H Q1-style pricing summary (A1/A2 at bench scale; headline query)
# ----------------------------------------------------------------------
@query("tpch_q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0, 2)
         AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # disc_price summed as exact 4-decimal fixed point: integer addition is
    # associative, so Spark partial-agg order can't flip the last bit.
    disc_units = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents"),
                 F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
                 F.round(F.sum(disc_units) / 10000.0, 2).alias("sum_disc_price"),
                 F.count(F.lit(1)).alias("count_order")))


# ----------------------------------------------------------------------
# P4 box cut (register_cut_box): AND of betweens, pushed to the scan
# ----------------------------------------------------------------------
@query("box_cut_counts", oracle="""
SELECT l_returnflag, count(*) AS n
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 40 AND l_discount BETWEEN 0.02 AND 0.08
GROUP BY l_returnflag
""")
def box_cut_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "lineitem"))
    ana.register_cut_box(["l_quantity", "l_discount"],
                         [[10, 40], [0.02, 0.08]], "c_box")
    return (ana._subset_df(ana.df, "c_box")
            .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# P5 global filter boolean algebra: replace → and → or → subtract chain
# ----------------------------------------------------------------------
@query("global_filter_algebra", oracle="""
SELECT event_type, count(*) AS n
FROM events
WHERE ((value > 2.0 AND user_id % 2 = 0) OR event_type = 'error')
  AND NOT value > 400.0
GROUP BY event_type
""")
def global_filter_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.apply_global_filter("value > 2.0")
    ana.apply_global_filter("user_id % 2 = 0", mode="and")
    ana.apply_global_filter("event_type = 'error'", mode="or")
    ana.apply_global_filter("value > 400.0", mode="subtract")
    return ana.df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ----------------------------------------------------------------------
# E2 xor combination of two cuts
# ----------------------------------------------------------------------
@query("cut_algebra_xor", oracle="""
SELECT count(*) AS n_xor
FROM lineitem
WHERE (l_quantity > 25) <> (l_discount > 0.05)
""")
def cut_algebra_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "lineitem"))
    ana.register_cut("l_quantity > 25", "c_qty")
    ana.register_cut("l_discount > 0.05", "c_disc")
    ana.combine_cuts(["c_qty", "c_disc"], "c_x", mode="xor")
    return ana.df.agg(F.sum(ana.resolve_cut("c_x").cast("long")).alias("n_xor"))


# ----------------------------------------------------------------------
# J1 semi-join on row identity: lineitems of high-value orders
# ----------------------------------------------------------------------
@query("semi_join_high_value", oracle="""
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
GROUP BY l_returnflag
""")
def semi_join_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.filter("o_totalprice > 300000").select(
        F.col("o_orderkey").alias("l_orderkey"))
    return (li.join(keys, "l_orderkey", "left_semi")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents(F.col("l_extendedprice"))).alias("sum_price_cents")))


# ----------------------------------------------------------------------
# J1 anti-join: customers with no orders (the fail-side of a semi-join)
# ----------------------------------------------------------------------
@query("anti_join_customers_no_orders", oracle="""
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
""")
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (cust.join(orders.select(F.col("o_custkey").alias("c_custkey")),
                      "c_custkey", "left_anti")
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_inactive")))


# ----------------------------------------------------------------------
# J2 broadcast lookup join: fact ⋈ small dim (part) — explicitly
# broadcast so no shuffle of the fact side
# ----------------------------------------------------------------------
@query("broadcast_part_revenue", oracle="""
SELECT p.p_brand,
       count(*) AS n_items,
       round(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))/100.0, 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 20
GROUP BY p.p_brand
""")
def broadcast_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter("p_size <= 20")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum(cents(F.col("l_extendedprice"))) / 100.0, 2)
                  .alias("revenue")))


# ----------------------------------------------------------------------
# multi-way join with broadcast dims: revenue by nation (TPC-H Q5 shape)
# ----------------------------------------------------------------------
@query("join_revenue_by_nation", oracle="""
SELECT n.n_name,
       round(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))/100.0, 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
""")
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter("o_orderstatus = 'F'")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    # customer scales with sf (1.5M rows/sf) — let AQE pick its join
    # strategy; only nation (25 rows, constant) is force-broadcast
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(cents(F.col("l_extendedprice"))) / 100.0, 2)
                  .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


# ----------------------------------------------------------------------
# A3 exact percentiles per group (threshold estimation core)
# ----------------------------------------------------------------------
@query("percentile_quantity_by_flag", oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS p25,
       round(quantile_cont(l_quantity, 0.50), 6) AS p50,
       round(quantile_cont(l_quantity, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag
""")
def percentile_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = F.percentile(F.col("l_quantity"), F.lit([0.25, 0.5, 0.75]))
    return (li.groupBy("l_returnflag")
            .agg(F.round(p.getItem(0), 6).alias("p25"),
                 F.round(p.getItem(1), 6).alias("p50"),
                 F.round(p.getItem(2), 6).alias("p75")))


# ----------------------------------------------------------------------
# A5 robust sigma per group (reference math, semiautocuts.py:589-627)
# ----------------------------------------------------------------------
@query("robust_sigma_by_event_type", oracle=f"""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS med,
       round((abs(quantile_cont(value, {SIGMA_LO_PCT/100!r}) - quantile_cont(value, 0.5))
            + abs(quantile_cont(value, 0.5) - quantile_cont(value, {SIGMA_HI_PCT/100!r}))) / 2, 6) AS sigma
FROM events GROUP BY event_type
""")
def robust_sigma_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = F.percentile(F.col("value"),
                     F.lit([SIGMA_LO_PCT / 100, 0.5, SIGMA_HI_PCT / 100]))
    med = p.getItem(1)
    sig = (F.abs(p.getItem(0) - med) + F.abs(med - p.getItem(2))) / 2
    return (ev.groupBy("event_type")
            .agg(F.round(med, 6).alias("med"), F.round(sig, 6).alias("sigma")))


# ----------------------------------------------------------------------
# A6 1-D histogram with fixed limits (driver-comparable lazy form)
# ----------------------------------------------------------------------
@query("hist1d_event_value", oracle="""
SELECT CAST(CASE WHEN value = 500.0 THEN 49
            ELSE floor((value - 0.0) / 10.0) END AS INT) AS bucket,
       count(*) AS n
FROM events
WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
GROUP BY 1 ORDER BY 1
""")
def hist1d_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hist1d_df(ev, "value", shape=50, lo=0.0, hi=500.0)


# ----------------------------------------------------------------------
# A7 2-D histogram on a fixed grid
# ----------------------------------------------------------------------
@query("hist2d_quantity_discount", oracle="""
SELECT CAST(CASE WHEN l_quantity = 50.0 THEN 9 ELSE floor((l_quantity - 0.0)/5.0) END AS INT) AS bx,
       CAST(CASE WHEN l_discount = 0.1 THEN 4 ELSE floor((l_discount - 0.0)/0.02) END AS INT) AS by,
       count(*) AS n
FROM lineitem
WHERE l_quantity BETWEEN 0.0 AND 50.0 AND l_discount BETWEEN 0.0 AND 0.1
GROUP BY 1, 2
""")
def hist2d_quantity_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bx = bucket_expr(F.col("l_quantity"), 0.0, 50.0, 10).alias("bx")
    by = bucket_expr(F.col("l_discount"), 0.0, 0.1, 5).alias("by")
    return (li.filter("l_quantity BETWEEN 0.0 AND 50.0 AND l_discount BETWEEN 0.0 AND 0.1")
            .groupBy(bx, by).agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# A8/A9 passage fractions: exact integer numerators/denominators
# ----------------------------------------------------------------------
@query("passage_fraction_counts", oracle="""
SELECT event_type,
       count(*) AS n_total,
       CAST(sum(CASE WHEN value > 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       round(sum(CASE WHEN value > 5.0 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS frac
FROM events GROUP BY event_type
""")
def passage_fraction_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    flag = (F.col("value") > 5.0).cast("long")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.sum(flag).alias("n_pass"))
            .withColumn("frac", F.round(F.col("n_pass") * 1.0 / F.col("n_total"), 6)))


@query("passfrac_sequential_matrix", oracle="""
SELECT count(*) AS total,
       CAST(sum(CASE WHEN c0 THEN 1 ELSE 0 END) AS BIGINT) AS den_0,
       CAST(sum(CASE WHEN c0 AND c1 THEN 1 ELSE 0 END) AS BIGINT) AS den_1,
       CAST(sum(CASE WHEN c0 AND c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS den_2,
       CAST(sum(CASE WHEN c0 AND c1 THEN 1 ELSE 0 END) AS BIGINT) AS num_1_0,
       CAST(sum(CASE WHEN c0 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS num_2_0,
       CAST(sum(CASE WHEN c0 AND c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS num_2_1
FROM (SELECT l_quantity > 25 AS c0, l_discount > 0.05 AS c1, l_tax > 0.04 AS c2
      FROM lineitem)
""")
def passfrac_sequential_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    c0 = F.col("l_quantity") > 25
    c1 = F.col("l_discount") > 0.05
    c2 = F.col("l_tax") > 0.04
    s = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return li.agg(
        F.count(F.lit(1)).alias("total"),
        s(c0).alias("den_0"), s(c0 & c1).alias("den_1"),
        s(c0 & c1 & c2).alias("den_2"),
        s(c0 & c1).alias("num_1_0"), s(c0 & c2).alias("num_2_0"),
        s(c0 & c1 & c2).alias("num_2_1"))


# ----------------------------------------------------------------------
# W2 equal-frequency bins via ntile over event_time ordering
# ----------------------------------------------------------------------
@query("ntile_time_bins", oracle="""
SELECT bin, count(*) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM (SELECT value, ntile(8) OVER (ORDER BY ts, event_id) - 1 AS bin FROM events)
GROUP BY bin
""")
def ntile_time_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    return (ev.withColumn("bin", F.ntile(8).over(w) - 1)
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents(F.col("value"))).alias("sum_value_cents")))


# ----------------------------------------------------------------------
# W4-style explicit uneven bins (assign_bin CASE-chain, no UDF)
# ----------------------------------------------------------------------
@query("uneven_bins_extendedprice", oracle="""
SELECT CASE
         WHEN l_extendedprice >= 50000.0 THEN 3
         WHEN l_extendedprice >= 20000.0 AND l_extendedprice < 50000.0 THEN 2
         WHEN l_extendedprice >= 5000.0  AND l_extendedprice < 20000.0 THEN 1
         WHEN l_extendedprice >= 0.0     AND l_extendedprice < 5000.0  THEN 0
       END AS bin,
       count(*) AS n,
       CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
FROM lineitem
WHERE l_extendedprice >= 0.0
GROUP BY 1
""")
def uneven_bins_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = [0.0, 5000.0, 20000.0, 50000.0, 1e12]
    b = assign_bin(F.col("l_extendedprice"), edges, last_unbounded=True)
    return (li.filter("l_extendedprice >= 0.0")
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents(F.col("l_quantity"))).alias("sum_qty_cents")))


# ----------------------------------------------------------------------
# O4 + window: top-k per group with deterministic tie-break
# ----------------------------------------------------------------------
@query("topk_orders_per_priority", oracle="""
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS total
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders)
WHERE rk <= 3
""")
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (orders.withColumn("rk", F.row_number().over(w))
            .filter("rk <= 3")
            .select("o_orderpriority", "o_orderkey",
                    F.round("o_totalprice", 2).alias("total")))


# ----------------------------------------------------------------------
# E1 union-all of two scans (per-file frame union, S2)
# ----------------------------------------------------------------------
@query("union_all_scan", oracle="""
SELECT event_type, count(*) AS n FROM (
  SELECT event_type FROM events WHERE user_id % 2 = 0
  UNION ALL
  SELECT event_type FROM events WHERE user_id % 2 = 1
) GROUP BY event_type
""")
def union_all_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter("user_id % 2 = 0").select("event_type")
    b = ev.filter("user_id % 2 = 1").select("event_type")
    return a.unionByName(b).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ----------------------------------------------------------------------
# A11 distinct values (sorted small result)
# ----------------------------------------------------------------------
@query("distinct_event_types", oracle="""
SELECT DISTINCT event_type FROM events
""")
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("event_type").distinct()


# ----------------------------------------------------------------------
# A10/W5: time-binned count with bin-level exclusion — bins (by day)
# whose event count exceeds a threshold are dropped entirely, then
# per-type stats over the surviving rows (de-noising windows)
# ----------------------------------------------------------------------
@query("time_binned_count_exclusion", oracle="""
WITH binned AS (
  SELECT *, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day_bin FROM events
), keep AS (
  SELECT day_bin FROM binned GROUP BY day_bin HAVING count(*) <= 120
)
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM binned WHERE day_bin IN (SELECT day_bin FROM keep)
GROUP BY event_type
""")
def time_binned_count_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = ev.withColumn(
        "day_bin", F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(86400.0)).cast("long"))
    keep = (binned.groupBy("day_bin").agg(F.count(F.lit(1)).alias("cnt"))
            .filter("cnt <= 120").select("day_bin"))
    return (binned.join(F.broadcast(keep), "day_bin", "left_semi")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents(F.col("value"))).alias("sum_value_cents")))


# ----------------------------------------------------------------------
# text analysis: token counts + quality ratios over documents
# ----------------------------------------------------------------------
@query("doc_token_stats", oracle=r"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
""")
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(tokens.cast("long")).alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars")))


# ----------------------------------------------------------------------
# exact dedup over documents: md5 grouping, keep lowest doc_id
# ----------------------------------------------------------------------
@query("dedup_exact_documents", oracle="""
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
""")
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))


# ======================================================================
# Semiautocut engine (SURVEY §2.5 W1-W5, A3-A5, A10; M3)
# ======================================================================

# ----------------------------------------------------------------------
# simple sigma cut, thresholds conditioned on a previous cut but applied
# to ALL rows (semiautocuts.py:497-498 semantics)
# ----------------------------------------------------------------------
@query("semiauto_sigma_cut", oracle=f"""
WITH cond AS (SELECT value FROM events WHERE event_type <> 'error'),
s AS (SELECT quantile_cont(value, 0.5) AS med,
             abs(((quantile_cont(value, {_SIG_LO!r}) - quantile_cont(value, 0.5))
                + (quantile_cont(value, 0.5) - quantile_cont(value, {_SIG_HI!r}))) / 2) AS sig
      FROM cond)
SELECT e.event_type, count(*) AS n
FROM events e, s
WHERE e.value > s.med - 2.0 * s.sig AND e.value < s.med + 2.0 * s.sig
GROUP BY e.event_type
""")
def semiauto_sigma_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.register_cut("event_type <> 'error'", "cut_pre")
    sac = Semiautocut(ana, "value", "", {"sigma": 2.0}, cut_rq_name_override=True)
    sac.do_cut(include_previous_cuts=["cut_pre"])
    return (ana._subset_df(ana.df, sac.cut_name)
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# time-binned percent cut with a per-bin exception override (W4)
# ----------------------------------------------------------------------
@query("semiauto_time_binned_cut", oracle="""
WITH e AS (SELECT CAST(epoch(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS t, value, event_type
           FROM events),
mm AS (SELECT min(t) AS lo, max(t) AS hi FROM e),
st AS (SELECT lo, hi, (hi - lo) / 4 AS step FROM mm),
bins AS (SELECT i AS bin, lo + step * i AS blo, lo + step * (i + 1) AS bhi
         FROM st, range(4) r(i)),
thr AS (SELECT b.bin, b.blo, b.bhi,
               CASE WHEN b.bin = 1 THEN 300.0
                    ELSE quantile_cont(e.value, 0.85) END AS up
        FROM bins b JOIN e ON e.t > b.blo AND e.t < b.bhi
        GROUP BY b.bin, b.blo, b.bhi)
SELECT e.event_type, count(*) AS n
FROM e JOIN thr ON e.t > thr.blo AND e.t < thr.bhi AND e.value < thr.up
GROUP BY e.event_type
""")
def semiauto_time_binned_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.register_feature(F.col("ts").cast("double"), "event_time")
    sac = Semiautocut(ana, "value", "", {"percent_upper": 0.85}, time_bins=4,
                      exceptions_dict={1: {"val_upper": 300.0}},
                      cut_rq_name_override=True)
    sac.do_cut()
    return (ana._subset_df(ana.df, sac.cut_name)
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# ofamp-binned percent cut: min/0.0/even-spaced edges, last bin to data
# max (W3/W4, semiautocuts.py:272-292, 855-871)
# ----------------------------------------------------------------------
@query("semiauto_ofamp_binned_cut", oracle="""
WITH base AS (SELECT value, value - 250.0 AS amp, event_type FROM events),
mm AS (SELECT min(amp) AS mn, max(amp) AS mx FROM base),
ed AS (SELECT mn, mx, mx / 3 AS s FROM mm),
bins AS (
  SELECT 0 AS bin, mn AS lo, 0.0 AS hi FROM ed
  UNION ALL SELECT 1, 0.0, s * 1 FROM ed
  UNION ALL SELECT 2, s * 1, s * 2 FROM ed
  UNION ALL SELECT 3, s * 2, s * 3 FROM ed
  UNION ALL SELECT 4, s * 3, mx FROM ed),
thr AS (SELECT b.bin, b.lo, b.hi, quantile_cont(base.value, 0.7) AS up
        FROM bins b JOIN base ON base.amp > b.lo AND base.amp < b.hi
        GROUP BY b.bin, b.lo, b.hi)
SELECT base.event_type, count(*) AS n
FROM base JOIN thr
  ON base.amp > thr.lo AND base.amp < thr.hi AND base.value < thr.up
GROUP BY base.event_type
""")
def semiauto_ofamp_binned_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.register_feature(F.col("value") - 250.0, "amp_centered")
    sac = Semiautocut(ana, "value", "", {"percent_upper": 0.7}, ofamp_bins=5,
                      ofamp_rq="amp_centered", cut_rq_name_override=True)
    sac.do_cut()
    return (ana._subset_df(ana.df, sac.cut_name)
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# time-binned COUNT cut: bins with too many in-range events are dropped
# wholesale; rows outside every bin survive (A10/W5, semiautocuts.py:738-811)
# ----------------------------------------------------------------------
_COUNT_CUT_EDGES = [1704067200.0, 1704499200.0, 1704931200.0,
                    1705363200.0, 1705795200.0, 1706227200.0]
_COUNT_CUT_SQL_BINS = ", ".join(
    f"({i}, {_COUNT_CUT_EDGES[i]!r}, {_COUNT_CUT_EDGES[i+1]!r})"
    for i in range(len(_COUNT_CUT_EDGES) - 1))

@query("semiauto_count_cut", oracle=f"""
WITH e AS (SELECT CAST(epoch(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS t, value, event_type
           FROM events),
bins(bin, lo, hi) AS (VALUES {_COUNT_CUT_SQL_BINS},
   ({len(_COUNT_CUT_EDGES) - 1}, {_COUNT_CUT_EDGES[-1]!r}, (SELECT max(t) FROM e))),
cnt AS (SELECT b.bin, b.lo, b.hi,
        (SELECT count(*) FROM e
         WHERE e.t > b.lo AND e.t < b.hi
           AND e.value > 100.0 AND e.value < 400.0) AS n
        FROM bins b),
bad AS (SELECT lo, hi FROM cnt WHERE n > 1000)
SELECT event_type, count(*) AS n
FROM e
WHERE NOT EXISTS (SELECT 1 FROM bad WHERE e.t > bad.lo AND e.t < bad.hi)
GROUP BY event_type
""")
def semiauto_count_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.register_feature(F.col("ts").cast("double"), "event_time")
    sac = Semiautocut(ana, "value", "", {"time_arr_num": [1000, 100.0, 400.0]},
                      time_bins=_COUNT_CUT_EDGES, cut_rq_name_override=True)
    sac.do_cut()
    return (ana._subset_df(ana.df, sac.cut_name)
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# time-interval cut: OR of strict betweens (T-type, semiautocuts.py:461-489
# documented intent)
# ----------------------------------------------------------------------
@query("semiauto_interval_cut", oracle="""
WITH e AS (SELECT CAST(epoch(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS t, event_type
           FROM events)
SELECT event_type, count(*) AS n
FROM e
WHERE (t > 1704240000.0 AND t < 1704844800.0)
   OR (t > 1705449600.0 AND t < 1706054400.0)
GROUP BY event_type
""")
def semiauto_interval_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "events"))
    ana.register_feature(F.col("ts").cast("double"), "event_time")
    sac = Semiautocut(ana, "event_time", "",
                      {"time_arr": [[1704240000.0, 1704844800.0],
                                    [1705449600.0, 1706054400.0]]})
    sac.do_cut()
    return (ana._subset_df(ana.df, sac.cut_name)
            .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))


# ----------------------------------------------------------------------
# MasterSemiautocuts recipe: load value-cut dicts, AND-fold, saturation
# OR (E3, semiautocuts.py:2066-2159)
# ----------------------------------------------------------------------
@query("semiauto_master_combine", oracle="""
SELECT l_returnflag, count(*) AS n
FROM lineitem
WHERE ((l_quantity > 5.0 AND l_quantity < 45.0) AND l_discount < 0.08)
   OR l_extendedprice > 90000.0
GROUP BY l_returnflag
""")
def semiauto_master_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ana = Analyzer(load_table(spark, sf_dir, "lineitem"))
    master = {
        "creation": [],
        "cuts": [
            {"cut_name": "cut_qty", "cut_rq": "l_quantity",
             "time_bins": None, "time_bins_arr": None,
             "ofamp_bins": None, "ofamp_bins_arr": None,
             "ofamp_rq": "l_extendedprice", "chi2_rq": "l_tax",
             "values_lower": [5.0], "values_upper": [45.0]},
            {"cut_name": "cut_disc", "cut_rq": "l_discount",
             "time_bins": None, "time_bins_arr": None,
             "ofamp_bins": None, "ofamp_bins_arr": None,
             "ofamp_rq": "l_extendedprice", "chi2_rq": "l_tax",
             "values_lower": [-1e8], "values_upper": [0.08]},
        ],
        "combo": {"cut_name": "cut_all_li", "sat_pass_threshold": 90000.0},
    }
    msc = MasterSemiautocuts(ana, [], "", ofamp_rq="l_extendedprice")
    msc.create_load_combine_cuts(master, time_col="l_shipdate")
    return (ana._subset_df(ana.df, "cut_all_li")
            .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")))


# ======================================================================
# Trace-layer array kernels (F-arr/U4/A17; detanalysis_spark/traces.py)
# The embeddings table's array<float> column stands in for waveforms at
# oracle scale — the kernels are written against array<double> traces.
# ======================================================================
from . import traces as _T  # noqa: E402


def _emb_double(emb_df: DataFrame) -> DataFrame:
    return emb_df.withColumn(
        "vec", F.transform(F.col("embedding"), lambda x: x.cast("double")))


# ----------------------------------------------------------------------
# baseline subtraction (photon_calibration.py:990): per-array mean after
# subtracting the "pretrigger" (first-8-element) mean — pure built-in
# transform/aggregate, whole-stage codegen
# ----------------------------------------------------------------------
@query("array_baseline_centered_mean", oracle="""
SELECT label, count(*) AS n,
       round(avg(
         list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')
           / len(embedding)
         - list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum')
           / 8.0
       ), 6) AS avg_centered_mean
FROM embeddings GROUP BY label
""")
def array_baseline_centered_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_double(load_table(spark, sf_dir, "embeddings"))
    centered = _T.baseline_subtract(F.col("vec"), 8)
    cmean = (F.aggregate(centered, F.lit(0.0), lambda a, x: a + x)
             / F.size(F.col("vec")))
    return (emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(cmean), 6).alias("avg_centered_mean")))


# ----------------------------------------------------------------------
# energy integral sum(trace)/fs (A17, photon_calibration.py:2063-2073)
# ----------------------------------------------------------------------
@query("array_energy_by_label", oracle="""
SELECT label, count(*) AS n,
       round(avg(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum') / 1000.0), 6) AS avg_energy,
       round(max(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum') / 1000.0), 6) AS max_energy
FROM embeddings GROUP BY label
""")
def array_energy_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_double(load_table(spark, sf_dir, "embeddings"))
    energy = _T.trace_energy(F.col("vec"), 1000.0)
    return (emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(energy), 6).alias("avg_energy"),
                 F.round(F.max(energy), 6).alias("max_energy")))


# ----------------------------------------------------------------------
# pandas_udf low-pass kernel (F-arr) — numerics covered by pytest vs a
# numpy oracle (tests/test_traces.py); rows-only check here exercises
# the Arrow batch path end-to-end on real parquet input
# ----------------------------------------------------------------------
@query("lowpass_kernel_embeddings")
def lowpass_kernel_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb_double(load_table(spark, sf_dir, "embeddings"))
    lp = _T.lowpass_filter_udf(1000.0, 100.0)(F.col("vec"))
    return emb.select(
        "vec_id",
        F.round(F.element_at(lp, 1), 6).alias("y0"),
        F.round(_T.trace_energy(lp, 1000.0), 6).alias("lp_energy"))
