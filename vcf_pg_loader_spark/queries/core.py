"""Core relational operator surface, oracle-checked (SURVEY.md §2.2-2.8).

Each query exercises one family from the reference's operator inventory,
re-expressed as idiomatic Spark DataFrame plans:

  scan+filter+agg        q01 q06          (§2.2 filters, §2.4 aggs)
  multi-way joins        q03 q05          (§2.3 annotation-join shape)
  semi/anti joins        q04 q_anti       (§2.3 de-novo NOT EXISTS shape)
  outer join + re-agg    q13              (§2.3)
  window functions       q_window_topk, q_window_running (§2.5 + worst-
                         consequence row_number pattern §1.4.6)
  sorts / top-k          q_top_customers  (§2.6 export ordering)
  set operations         q_setops         (§2.7)
  distinct aggregation   q_distinct_agg   (§2.4 cohort frequency)
  percentiles            q_percentile     (§2.4 batch QC summary median)
  conditional counts     q_conditional    (§2.4 QC summary FILTER pattern)
  JSON extraction        q_events_json    (§2.8 info->>'DP' pattern)
  time bucketing         q_events_monthly (§2.8 date_trunc)
  sessionization (lag)   q_events_sessions
  broadcast range join   q_range_join     (§2.3 LD-block interval join)
  fact-fact + dim top-k  q10 q18          (§2.3/§2.6)
  scalar-agg thresholds  q17 q22 q11      (§2.4 correlated-subquery rewrite)
  conditional agg ratio  q14 q08 q12      (§2.4)
  disjunctive predicate  q19              (§2.2 OR-block pushdown)
  per-group argmin       q02              (§2.4 min-over-struct tie-break)
  nested agg semi-join   q20 q21          (§2.3 EXISTS/NOT EXISTS collapse)
  multi-dim profit agg   q09              (§2.4)

Scale notes: joins against region/nation/supplier/bins are broadcast
(dimension tables); fact-fact joins shuffle on their keys and rely on AQE
for skew; all aggregations are partial+final hash aggs (map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vcf_pg_loader_spark.queries._util import MONEY, davg, dsum, sql_davg, sql_dsum
from vcf_pg_loader_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01: pricing summary (TPC-H Q1 shape) — scan + filter + hash agg
# --------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, "decimal(22,6)").alias("sum_disc_price"),
            dsum(charge, "decimal(22,6)").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(22,6)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'DECIMAL(22,6)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q06: forecast revenue (TPC-H Q6 shape) — pushdown-friendly selective filter
# --------------------------------------------------------------------------
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "decimal(22,6)").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q06_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'DECIMAL(22,6)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q03: shipping priority (TPC-H Q3 shape) — 3-way join + top-k
# --------------------------------------------------------------------------
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "decimal(22,6)"
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q03_SQL = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(22,6)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q04: order priority w/ EXISTS — left-semi join
# --------------------------------------------------------------------------
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.08)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q05: local supplier volume (TPC-H Q5 shape) — 6-way join w/ broadcast dims
# --------------------------------------------------------------------------
def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "decimal(22,6)"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q05_SQL = f"""
SELECT r_name, n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(22,6)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# q13: customer order-count distribution (TPC-H Q13 shape) — left outer join
# --------------------------------------------------------------------------
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# anti join: customers with no orders (de-novo NOT EXISTS shape, §2.3)
# --------------------------------------------------------------------------
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            davg("c_acctbal").alias("avg_acctbal"),
        )
    )


Q_ANTI_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_custs, {sql_davg('c_acctbal')} AS avg_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# top-k with deterministic tie-break (§2.6 export ordering / latest-load)
# --------------------------------------------------------------------------
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


Q_TOPCUST_SQL = f"""
SELECT c_custkey, c_name, {sql_dsum('o_totalprice')} AS total_spend,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# window: top order per customer (worst-consequence row_number shape §1.4.6)
# --------------------------------------------------------------------------
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


Q_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# window: running per-customer spend (frame spec; decimal running sum)
# --------------------------------------------------------------------------
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(MONEY)).over(w).cast("double").alias("running_spend"),
    )


Q_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_spend
FROM orders
"""


# --------------------------------------------------------------------------
# set operations: UNION / EXCEPT distinct semantics (§2.7)
# --------------------------------------------------------------------------
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big_spenders = (
        orders.filter(F.col("o_totalprice") > 400).select(F.col("o_custkey").alias("custkey"))
    )
    rich = cust.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    autos = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    return big_spenders.union(rich).distinct().exceptAll(autos.distinct()).distinct()


Q_SETOPS_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
EXCEPT
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
"""


# --------------------------------------------------------------------------
# distinct aggregation (§2.4 cohort frequency COUNT(DISTINCT ...))
# --------------------------------------------------------------------------
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


Q_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# percentiles (§2.4 batch QC PERCENTILE_CONT(0.5))
# --------------------------------------------------------------------------
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q_PERCENTILE_SQL = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# sampled quantiles: exact percentiles over a DETERMINISTIC 10% hash
# sample of the fact table.  Exact global quantiles at 100 TB cost a
# per-group sort of everything; a hash-predicate sample is a narrow
# codegen filter (no shuffle, no RNG-vs-partitioning hazard), the same
# rows on every engine/run, and sub-samples merge by construction
# (h < t1 ∧ h < t2 ⇒ nested).  Both engines quantile the identical
# sampled multiset, so even the ESTIMATE is oracle-exact.
# --------------------------------------------------------------------------
QS_RATE = 0.10
_QS_THRESHOLD = int(QS_RATE * (1 << 60))


def q_quantile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.functions.hashing import h60

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return (
        li.filter(h60(key) < _QS_THRESHOLD)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
                "median_price"
            ),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias(
                "p99_price"
            ),
            F.count(F.lit(1)).alias("n_sampled"),
        )
    )


def _quantile_sampled_sql() -> str:
    from vcf_pg_loader_spark.functions.hashing import sql_h60

    h = sql_h60(
        "concat_ws('|', CAST(l_orderkey AS VARCHAR),"
        " CAST(l_linenumber AS VARCHAR))"
    )
    return f"""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price,
       COUNT(*) AS n_sampled
FROM lineitem
WHERE {h} < {_QS_THRESHOLD}
GROUP BY 1
"""


Q_QUANTILE_SAMPLED_SQL = _quantile_sampled_sql()


# --------------------------------------------------------------------------
# conditional counts (§2.4 QC summary COUNT(*) FILTER (WHERE ...))
# --------------------------------------------------------------------------
def q_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("l_discount") == 0.0, 1)).alias("n_no_discount"),
        F.count(F.when(F.col("l_quantity") >= 40, 1)).alias("n_bulk"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        F.count(F.when((F.col("l_tax") > 0.05) & (F.col("l_discount") > 0.05), 1)).alias(
            "n_high_tax_disc"
        ),
    )


Q_CONDITIONAL_SQL = """
SELECT COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_no_discount,
       COUNT(*) FILTER (WHERE l_quantity >= 40) AS n_bulk,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       COUNT(*) FILTER (WHERE l_tax > 0.05 AND l_discount > 0.05) AS n_high_tax_disc
FROM lineitem
"""


# --------------------------------------------------------------------------
# JSON extraction (§2.8 info->>'DP' pattern over events.props)
# --------------------------------------------------------------------------
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q_EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) FILTER (WHERE CAST(props->>'$.k' AS BIGINT) > 50) AS n_high_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# time bucketing (§2.8 date_trunc; monthly rollup over events)
# --------------------------------------------------------------------------
def q_events_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.trunc(F.col("ts"), "month").alias("month"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


Q_EVENTS_MONTHLY_SQL = f"""
SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS month, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# sessionization: lag-gap detection (window lag + conditional count)
# --------------------------------------------------------------------------
def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # Direct timestamp subtraction works for both TIMESTAMP and
    # TIMESTAMP_NTZ (unix_micros rejects NTZ, which parquet scans infer).
    ts = F.col("ts")
    prev = F.lag(ts).over(w)
    gap = F.expr("INTERVAL '1800' SECOND")
    new_session = F.when(prev.isNull() | ((ts - prev) > gap), 1).otherwise(0)
    return (
        ev.select("user_id", new_session.alias("is_new"))
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


Q_EVENTS_SESSIONS_SQL = """
SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
             (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS prev_us
    FROM events
  )
)
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# built-in session windows: the same per-user sessionization served by
# Spark's native session_window aggregation (JVM-side merging state,
# the streaming-capable path) instead of the lag-gap window above.
# Boundary semantics differ from lag-gap by design: session_window
# merges an event only while it lands STRICTLY before prev + gap, so
# the DuckDB twin uses `>= gap` where the lag-gap twin uses `> gap` —
# both engines then agree exactly.
# --------------------------------------------------------------------------
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_session = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
    )


Q_SESSION_WINDOW_SQL = """
SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER
             (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC) AS prev_us
    FROM events
  )
)
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# ordered funnel conversion: users who did view, THEN click, THEN
# purchase — each step's timestamp strictly after the previous step's
# earliest occurrence.  Expressed as chained per-user min-after
# aggregations (user-keyed groupBys + joins — never a per-user sort of
# the whole history), the scalable form of sequence matching.
# --------------------------------------------------------------------------
FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    reached = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_prev"))
    )
    stages = [reached]
    for step in FUNNEL_STEPS[1:]:
        reached = (
            ev.filter(F.col("event_type") == step)
            .join(reached, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_prev"))
        )
        stages.append(reached)
    counts = None
    for i, (step, df) in enumerate(zip(FUNNEL_STEPS, stages), start=1):
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"),
            F.lit(step).alias("event_type"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)
    base = stages[0].agg(F.count(F.lit(1)).alias("_n0"))
    return counts.crossJoin(F.broadcast(base)).select(
        "step",
        "event_type",
        "n_users",
        F.round(F.col("n_users") / F.col("_n0"), 6).alias("conversion"),
    )


def _funnel_sql() -> str:
    steps = FUNNEL_STEPS
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t_prev FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t_prev FROM events e "
            f"JOIN s{i - 1} p USING (user_id) "
            f"WHERE e.event_type = '{step}' AND e.ts > p.t_prev GROUP BY 1)"
        )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS step, '{s}' AS event_type, COUNT(*) AS n_users FROM s{i}"
        for i, s in enumerate(steps, start=1)
    )
    return f"""
WITH {', '.join(ctes)},
counts AS ({unions}),
base AS (SELECT COUNT(*) AS n0 FROM s1)
SELECT step, event_type, n_users,
       ROUND(CAST(n_users AS DOUBLE) / n0, 6) AS conversion
FROM counts, base
"""


Q_FUNNEL_STEPS_SQL = _funnel_sql()


# --------------------------------------------------------------------------
# retention cohorts: users grouped by first-activity day, counted on each
# of their first 7 day-offsets — the standard cohort-retention matrix.
# Per-user first-day is one keyed aggregation; the matrix is a keyed
# countDistinct over (cohort_day, offset) — nothing user-quadratic.
# --------------------------------------------------------------------------
RETENTION_MAX_OFFSET = 7


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    off = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        d.join(first, "user_id")
        .filter(off <= RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", off.alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


Q_RETENTION_SQL = f"""
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1)
SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM d JOIN first USING (user_id)
WHERE date_diff('day', cohort_day, day) <= {RETENTION_MAX_OFFSET}
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# broadcast range join (§2.3 LD-block interval-assignment shape):
# tiny bins table broadcast, theta-join on containment
# --------------------------------------------------------------------------
_QTY_BINS = [
    ("B1_SMALL", 0.0, 10.0),
    ("B2_MEDIUM", 10.0, 25.0),
    ("B3_LARGE", 25.0, 40.0),
    ("B4_BULK", 40.0, 1e9),
]


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bins = spark.createDataFrame(_QTY_BINS, ["bucket", "lo", "hi"])
    return (
        li.join(
            F.broadcast(bins),
            (F.col("l_quantity") > F.col("lo")) & (F.col("l_quantity") <= F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )


_BINS_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _QTY_BINS)
Q_RANGE_JOIN_SQL = f"""
SELECT bucket, COUNT(*) AS n_items, {sql_dsum('l_extendedprice')} AS total_price
FROM lineitem
JOIN (VALUES {_BINS_VALUES}) AS bins(bucket, lo, hi)
  ON l_quantity > lo AND l_quantity <= hi
GROUP BY bucket
"""


# --------------------------------------------------------------------------
# duplicate detection (§2.4 GROUP BY ... HAVING count>1; cli.py:552-561)
# --------------------------------------------------------------------------
def q_having_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("n_lines") > 1)
    )


Q_HAVING_SQL = """
SELECT l_orderkey, l_partkey, COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_orderkey, l_partkey
HAVING COUNT(*) > 1
"""


# --------------------------------------------------------------------------
# tumbling event-time windows via window() — the batch twin of the
# streaming aggregation (streaming/events.py); oracle via time_bucket
# --------------------------------------------------------------------------
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


Q_EVENTS_HOURLY_SQL = f"""
SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
       event_type, COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# raw-SQL passthrough surface (reference cli.py:1454-1502): the full
# query language is Spark SQL over registered views, as it was Postgres
# SQL for the reference — exercised with a CTE + join + agg
# --------------------------------------------------------------------------
_PASSTHROUGH_SQL = f"""
WITH big_orders AS (
  SELECT o_custkey, COUNT(*) AS n_big
  FROM orders WHERE o_totalprice > 300
  GROUP BY o_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_dsum('n_big', 'DECIMAL(18,0)')} AS total_big_orders
FROM customer JOIN big_orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PASSTHROUGH_SQL)


# --------------------------------------------------------------------------
# grouping sets / rollup (not in the reference — Spark gives them free,
# SURVEY §2.4 note; exposed for oracle coverage)
# --------------------------------------------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


Q_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q10 shape: returned-item revenue by customer — fact-fact join restricted
# by a selective fact-side predicate (l_returnflag = 'R'), dimension
# broadcast, top-k on an exact-decimal revenue sum
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q22 shape: above-average-balance customers with no LARGE orders —
# scalar aggregate as a broadcast (never a single-partition window),
# then an anti join against the filtered fact table
# --------------------------------------------------------------------------
Q22_BIG_ORDER = 300_000.0


def q22_idle_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > Q22_BIG_ORDER
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


Q22_SQL = f"""
WITH a AS (SELECT {sql_davg('c_acctbal')} AS avg_bal
           FROM customer WHERE c_acctbal > 0)
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer c, a
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {Q22_BIG_ORDER})
"""
# NOT EXISTS (not NOT IN): the Spark plan is a left_anti join, and NOT IN
# returns zero rows if any o_custkey is NULL — fine on current fixtures,
# divergent on a regen with nullable keys.


# --------------------------------------------------------------------------
# q14 shape: promo revenue share — broadcast dim join + conditional
# aggregation ratio in one pass
# --------------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo_rev = F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double")
    total_rev = F.sum(rev).cast("double")
    return j.agg(
        promo_rev.alias("promo_revenue"),
        total_rev.alias("total_revenue"),
        (F.lit(100.0) * promo_rev / total_rev).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q14_SQL = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(22,6)) END) AS DOUBLE)
         AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
            AS DOUBLE) AS total_revenue,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(22,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(22,6))) AS DOUBLE) AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --------------------------------------------------------------------------
# q17 shape: small-quantity revenue — the correlated "below 0.2 * per-part
# average" subquery rewritten as a per-part aggregate joined back
# (broadcast), never a correlated per-row scan
# --------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(davg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q17_SQL = f"""
WITH a AS (
  SELECT l_partkey, {sql_davg('l_quantity')} AS avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'
  GROUP BY l_partkey
)
SELECT {sql_dsum('l_extendedprice')} AS total_price,
       COUNT(*) AS n_items
FROM lineitem JOIN a USING (l_partkey)
WHERE l_quantity < 0.2 * avg_qty
"""


# --------------------------------------------------------------------------
# q18 shape: large-volume orders — HAVING over a fact aggregate, then
# joined back to orders/customer for the top-k listing
# --------------------------------------------------------------------------
Q18_MIN_QTY = 150.0


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum('l_quantity')} > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q15 shape: top supplier by revenue — argmax over an aggregate via a
# broadcast scalar max, never a global window
# --------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    by_sup = li.groupBy("l_suppkey").agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    mx = by_sup.agg(F.max("total_revenue").alias("max_rev"))
    return (
        by_sup.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), by_sup.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM r)
"""


# --------------------------------------------------------------------------
# q07 shape: volume shipping between nation pairs — two dimension lookups
# on different fact foreign keys (customer nation vs supplier nation),
# grouped by the (n1, n2, year) pair
# --------------------------------------------------------------------------
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2_key"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q07_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q19 shape: disjunctive multi-attribute predicate (brand/size/quantity
# OR-blocks) over a broadcast part join — the pattern that exercises
# predicate pushdown through a disjunction
# --------------------------------------------------------------------------
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_type") == "ECONOMY")
            & F.col("p_size").between(20, 50)
            & (F.col("l_quantity") >= 25)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'ECONOMY' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25)
"""


# --------------------------------------------------------------------------
# q12 shape: fact-fact join + conditional priority counts per line status
# (the fixture has no l_shipmode; l_linestatus plays its role)
# --------------------------------------------------------------------------
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


# --------------------------------------------------------------------------
# q11 shape: group revenue HAVING > multiple of the MEAN group revenue —
# the global scalar rides a 1-row broadcast, never a global window.
# Thresholding on the mean (not a fixed fraction of the total) keeps the
# selectivity stable as the corpus grows: TPC-H's own fraction/total form
# returns nothing once the part count scales up
# --------------------------------------------------------------------------
Q11_MULTIPLE = 1.5


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    by_part = li.groupBy("l_partkey").agg(
        F.sum(rev).cast("double").alias("part_revenue")
    )
    stats = by_part.agg(
        F.sum(F.col("part_revenue").cast("decimal(22,6)")).cast("double").alias("_tot"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        by_part.crossJoin(F.broadcast(stats))
        .filter(
            F.col("part_revenue")
            > F.lit(Q11_MULTIPLE) * (F.col("_tot") / F.col("_n"))
        )
        .select("l_partkey", "part_revenue")
    )


Q11_SQL = f"""
WITH r AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
              AS DOUBLE) AS part_revenue
  FROM lineitem GROUP BY l_partkey
),
t AS (SELECT CAST(SUM(CAST(part_revenue AS DECIMAL(22,6))) AS DOUBLE) AS tot,
             COUNT(*) AS n
      FROM r)
SELECT l_partkey, part_revenue
FROM r, t
WHERE part_revenue > {Q11_MULTIPLE} * (tot / n)
"""


# --------------------------------------------------------------------------
# q16 shape: distinct-supplier counts per part attribute, excluding a
# blacklist via anti join (the NOT IN subquery)
# --------------------------------------------------------------------------
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part ON l_partkey = p_partkey
WHERE NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
GROUP BY p_brand, p_type
"""


# --------------------------------------------------------------------------
# q21 shape: the sole failing supplier in a multi-supplier order.  TPC-H
# phrases this as correlated EXISTS (another supplier in the order) +
# NOT EXISTS (no OTHER failing supplier); both collapse into ONE
# per-order aggregate over the distinct (order, supplier) pairs — same
# semantics, one shuffle instead of two correlated self-joins
# --------------------------------------------------------------------------
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("hr")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("hr").alias("n_ret"),
    )
    return (
        pairs.join(per_order, "l_orderkey")
        .filter((F.col("hr") == 1) & (F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS hr
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(hr) AS n_ret
  FROM pairs GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pairs JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE hr = 1 AND n_supp > 1 AND n_ret = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q20 shape: suppliers shipping an outsized share of a part family —
# nested aggregate feeding a threshold semi-join
# --------------------------------------------------------------------------
# Threshold = a multiple of each part's FAIR share (total / its supplier
# count): scale-stable where a fixed share fraction empties out as the
# supplier pool grows with the corpus
Q20_MULTIPLE = 3.0


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    small = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    per_ps = small.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty")
    )
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum(F.col("qty").cast("decimal(18,2)")).cast("double").alias("tot"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    excess = (
        per_ps.join(per_part, "l_partkey")
        .filter(
            F.col("qty") > F.lit(Q20_MULTIPLE) * (F.col("tot") / F.col("n_supp"))
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        excess.join(F.broadcast(sup), excess.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH small AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL'
),
per_ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
  FROM small GROUP BY l_partkey, l_suppkey
),
per_part AS (
  SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS tot,
         COUNT(*) AS n_supp
  FROM per_ps GROUP BY l_partkey
)
SELECT DISTINCT s_name, n_name AS nation
FROM per_ps JOIN per_part USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE qty > {Q20_MULTIPLE} * (tot / n_supp)
ORDER BY s_name
"""


# --------------------------------------------------------------------------
# q02 shape: per-group argmin with a deterministic tie-break — for every
# small part, the supplier selling it cheapest on average.  min over a
# (price, key) struct == ROW_NUMBER ... ORDER BY price, key = 1, but the
# aggregate gets map-side combine where the window must sort
# --------------------------------------------------------------------------
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") < 25)
    )
    sup = _t(spark, sf_dir, "supplier")
    avgp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(davg("l_extendedprice", "decimal(18,2)").alias("avg_price"))
    )
    best = avgp.groupBy("p_partkey", "p_name").agg(
        F.min(F.struct("avg_price", "l_suppkey")).alias("_m")
    )
    return (
        best.select(
            "p_partkey",
            "p_name",
            F.col("_m.l_suppkey").alias("l_suppkey"),
            F.col("_m.avg_price").alias("avg_price"),
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "avg_price")
        .orderBy("p_partkey")
    )


Q02_SQL = f"""
WITH avgp AS (
  SELECT p_partkey, p_name, l_suppkey,
         {sql_davg('l_extendedprice', 'DECIMAL(18,2)')} AS avg_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'SMALL' AND p_size < 25
  GROUP BY p_partkey, p_name, l_suppkey
),
best AS (
  SELECT p_partkey, p_name, l_suppkey, avg_price,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY avg_price ASC, l_suppkey ASC) AS rn
  FROM avgp
)
SELECT p_partkey, p_name, s_name, avg_price
FROM best JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# q08 shape: one nation's market share inside a region per order year —
# conditional revenue ratio over a 5-way join, every dimension broadcast
# --------------------------------------------------------------------------
Q08_REGION = "ASIA"
Q08_NATION = "NATION_2"


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n_cust = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q08_REGION)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n_sup = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(22,6)"
    )
    target = F.when(F.col("supp_nation") == Q08_NATION, rev).otherwise(
        F.lit(0).cast("decimal(22,6)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n_sup), sup.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share"),
            F.sum(rev).cast("double").alias("region_revenue"),
        )
    )


Q08_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n2.n_name = '{Q08_NATION}'
                       THEN CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(22,6))
                       ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(22,6))) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
            AS DOUBLE) AS region_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = '{Q08_REGION}'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q09 shape: profit by supplier nation and order year over a name-matched
# part family (no ps_supplycost in the fixtures; a retail-price-derived
# cost stands in, computed per row in the same order on both engines)
# --------------------------------------------------------------------------
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.1)
    ).cast("decimal(22,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q09_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - l_quantity * p_retailprice * 0.1
                     AS DECIMAL(22,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# as-of join (operators/asof.py): each click event joined to the user's
# most recent prior-or-simultaneous purchase.  The Spark side is the
# union-sort operator (one shuffle on user_id, no candidate-pair blowup);
# the DuckDB twin is the engine-native ASOF LEFT JOIN — two entirely
# different physical algorithms that must agree row-for-row.  The right
# side is deduped to one row per (user, ts) first: simultaneous-purchase
# ties are otherwise ambiguous in both engines.
# --------------------------------------------------------------------------
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value", "event_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "event_id")
    )
    return asof_join(
        clicks, purchases, "ts", ["user_id"], prefix="last_purchase_"
    ).withColumnRenamed("last_purchase_ts", "last_purchase_at")


Q_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS last_purchase_at, p.value AS last_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


# --------------------------------------------------------------------------
# pivot: monthly revenue per event type as columns.  The pivot VALUES are
# passed explicitly — without them Spark runs an extra distinct-scan job
# to discover the column set, and the output schema becomes data-dependent
# (both wrong at scale; the value list is a catalog-level contract).
# Oracle twin is the standard conditional-aggregation unrolling.
# --------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.trunc(F.col("ts"), "month").alias("month"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(dsum("value"))
    )


Q_PIVOT_SQL = f"""
SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS month,
       {", ".join(sql_dsum(f"CASE WHEN event_type = '{t}' THEN value END")
                  + f" AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
"""


# --------------------------------------------------------------------------
# CUBE grouping sets: order counts/revenue by (priority, status) with all
# subtotal combinations — one pass producing 2^2 grouping sets, Spark's
# native `cube` vs DuckDB's GROUP BY CUBE.
# --------------------------------------------------------------------------
def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


Q_CUBE_SQL = f"""
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# --------------------------------------------------------------------------
# forward as-of: each click joined to the user's NEXT purchase (at or
# after the click) — the other direction of operators/asof.py, against
# DuckDB's ASOF with the inequality flipped.
# --------------------------------------------------------------------------
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value", "event_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "event_id")
    )
    return asof_join(
        clicks, purchases, "ts", ["user_id"],
        direction="forward", prefix="next_purchase_",
    ).withColumnRenamed("next_purchase_ts", "next_purchase_at")


Q_ASOF_FORWARD_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts,
       p.ts AS next_purchase_at, p.value AS next_purchase_value
FROM clicks c
ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


# --------------------------------------------------------------------------
# attribution rollup through the interval-join operator
# (streaming/joins.py — the same code is the streaming stream-stream
# join): purchases within 1 hour AFTER a click, per user.
# --------------------------------------------------------------------------
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.streaming.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = interval_join(clicks, purchases, "user_id", within="1 hour")
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed"),
        dsum("r_value").alias("attributed_value"),
    )


Q_ATTRIBUTION_SQL = f"""
SELECT c.user_id, COUNT(*) AS n_attributed,
       {sql_dsum('p.value')} AS attributed_value
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
GROUP BY 1
"""


# --------------------------------------------------------------------------
# explicit GROUPING SETS (beyond cube/rollup): the two one-dimensional
# marginals in a single pass — Spark 4's native groupingSets API vs
# DuckDB's GROUP BY GROUPING SETS.
# --------------------------------------------------------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"]],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


Q_GROUPING_SETS_SQL = f"""
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


# --------------------------------------------------------------------------
# as-of with a tolerance window: like q_asof_join but matches farther
# than 2 hours back are nulled — the operator's tolerance path, mirrored
# in SQL as ASOF + a gap guard.
# --------------------------------------------------------------------------
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value", "event_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "event_id")
    )
    return asof_join(
        clicks,
        purchases,
        "ts",
        ["user_id"],
        tolerance=F.expr("INTERVAL '2' HOUR"),
        prefix="recent_purchase_",
    ).withColumnRenamed("recent_purchase_ts", "recent_purchase_at")


Q_ASOF_TOLERANCE_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT event_id, user_id, ts,
       CASE WHEN ok THEN m_ts END AS recent_purchase_at,
       CASE WHEN ok THEN m_value END AS recent_purchase_value
FROM (
  SELECT c.event_id, c.user_id, c.ts, p.ts AS m_ts, p.value AS m_value,
         c.ts - p.ts <= INTERVAL 2 HOUR AS ok
  FROM clicks c
  ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND c.ts >= p.ts
)
"""


# --------------------------------------------------------------------------
# RANGE window frame: per customer, trailing-30-day order count and
# revenue at each order — a VALUE-based frame (peers by day distance),
# not the row-based frames used elsewhere.  Both engines frame over
# days-since-epoch integers so the peer sets match exactly.
# --------------------------------------------------------------------------
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n_recent"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("recent_revenue"),
    )


Q_WINDOW_RANGE_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       COUNT(*) OVER w AS n_recent,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS recent_revenue
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Bloom-pruned join (operators/bloom.py): lineitem is Bloom-filtered on
# the urgent orders' keys before its shuffle — the explicit runtime-
# filter / semi-join reduction.  False positives die in the real join,
# so the oracle is the PLAIN join: any bitmap bug (wrong word index,
# bad mask, dropped true key) shows up as a row-count or value diff.
# --------------------------------------------------------------------------
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.bloom import bloom_prefilter_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = bloom_prefilter_join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        urgent.select("o_orderkey", "o_orderpriority"),
        "o_orderkey",
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "decimal(22,6)",
        ).alias("revenue"),
    )


Q_BLOOM_JOIN_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'DECIMAL(22,6)')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Incremental join-view maintenance (operators/ivm.py): lineitem and
# orders arrive in 3 interleaved insert batches; the join view folds
# each batch via the delta rule (dL⋈R ∪ L⋈dR ∪ dL⋈dR) and the final
# maintained view must equal the one-shot join — the oracle IS the
# plain join aggregate, so any lost/duplicated delta shows up.
# --------------------------------------------------------------------------
def q_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.ivm import maintain_join_view

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    view = None
    l_old, r_old = li.limit(0), orders.limit(0)
    for i in range(3):
        dl = li.filter(F.col("o_orderkey") % 3 == i)
        dr = orders.filter(F.col("o_orderkey") % 3 == i)
        view = maintain_join_view(view, l_old, dl, r_old, dr, "o_orderkey")
        l_old = l_old.unionByName(dl)
        r_old = r_old.unionByName(dr)
    return view.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity", "decimal(20,2)").alias("total_qty"),
    )


Q_IVM_JOIN_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {sql_dsum('l_quantity', 'DECIMAL(20,2)')} AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Counted (Z-set) IVM with DELETIONS (operators/ivm.py): two insert
# batches, then a delete batch retracting every small-quantity lineitem
# (multiplicity -1).  The maintained view must equal the one-shot join
# over the RETAINED rows — the oracle is that recompute, so a wrong
# retraction (lost, doubled, or cross-term-missed) shows up as a value
# mismatch.
# --------------------------------------------------------------------------
IVM_DELETE_QTY = 10


def q_ivm_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.ivm import (
        as_zset,
        maintain_join_view_counted,
        zset_normalize,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    no_orders = as_zset(orders.limit(0))

    batches = [
        (as_zset(li.filter(F.col("o_orderkey") % 2 == 0)), as_zset(orders)),
        (as_zset(li.filter(F.col("o_orderkey") % 2 == 1)), no_orders),
        # the delete: retract every small-quantity lineitem tuple
        (
            as_zset(li.filter(F.col("l_quantity") < IVM_DELETE_QTY), mult=-1),
            no_orders,
        ),
    ]
    view = None
    l_old, r_old = as_zset(li.limit(0)), no_orders
    for dl, dr in batches:
        view = maintain_join_view_counted(view, l_old, dl, r_old, dr, "o_orderkey")
        l_old = zset_normalize(l_old.unionByName(dl))
        r_old = zset_normalize(r_old.unionByName(dr))
    return view.groupBy("o_orderpriority").agg(
        F.sum("_mult").cast("bigint").alias("n_items"),
        dsum(
            F.col("l_quantity") * F.col("_mult"), "decimal(20,2)"
        ).alias("total_qty"),
    )


Q_IVM_DELETE_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {sql_dsum('l_quantity', 'DECIMAL(20,2)')} AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= {IVM_DELETE_QTY}
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Counted IVM THROUGH an aggregate (operators/ivm.py
# maintain_agg_join_view_counted): the same interleaved insert+delete
# batches as q_ivm_delete, but the maintained state is the GROUPED
# SUM/COUNT itself — the join view never materializes; each batch's
# delta aggregates into multiplicity-weighted partials that fold
# additively (decimal all the way, so fold order is irrelevant), and
# groups whose count hits zero vanish.  Oracle: the same recompute over
# retained rows — a wrong retraction through the aggregate (count kept
# a zero group, sum missed a cross term) mismatches.
# --------------------------------------------------------------------------
def q_ivm_agg_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vcf_pg_loader_spark.operators.ivm import (
        as_zset,
        maintain_agg_join_view_counted,
        zset_normalize,
    )

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    no_orders = as_zset(orders.limit(0))

    batches = [
        (as_zset(li.filter(F.col("o_orderkey") % 2 == 0)), as_zset(orders)),
        (as_zset(li.filter(F.col("o_orderkey") % 2 == 1)), no_orders),
        (
            as_zset(li.filter(F.col("l_quantity") < IVM_DELETE_QTY), mult=-1),
            no_orders,
        ),
    ]
    agg = None
    l_old, r_old = as_zset(li.limit(0)), no_orders
    for dl, dr in batches:
        agg = maintain_agg_join_view_counted(
            agg, l_old, dl, r_old, dr, "o_orderkey",
            ["o_orderpriority"], "l_quantity",
        )
        l_old = zset_normalize(l_old.unionByName(dl))
        r_old = zset_normalize(r_old.unionByName(dr))
    return agg.select(
        "o_orderpriority",
        F.col("_cnt").alias("n_items"),
        F.col("_sum").cast("double").alias("total_qty"),
    )


Q_IVM_AGG_DELETE_SQL = Q_IVM_DELETE_SQL


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_order_priority": q04_order_priority,
    "q05_local_supplier": q05_local_supplier,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q13_order_distribution": q13_order_distribution,
    "q10_returned_items": q10_returned_items,
    "q22_idle_accounts": q22_idle_accounts,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q15_top_supplier": q15_top_supplier,
    "q07_volume_shipping": q07_volume_shipping,
    "q02_min_cost_supplier": q02_min_cost_supplier,
    "q08_market_share": q08_market_share,
    "q09_product_profit": q09_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_shipping": q12_priority_shipping,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q_anti_join": q_anti_join,
    "q_top_customers": q_top_customers,
    "q_window_topk": q_window_topk,
    "q_window_running": q_window_running,
    "q_setops": q_setops,
    "q_distinct_agg": q_distinct_agg,
    "q_percentile": q_percentile,
    "q_conditional_counts": q_conditional_counts,
    "q_events_json": q_events_json,
    "q_events_monthly": q_events_monthly,
    "q_events_sessions": q_events_sessions,
    "q_funnel_steps": q_funnel_steps,
    "q_retention_cohorts": q_retention_cohorts,
    "q_range_join": q_range_join,
    "q_having_dups": q_having_dups,
    "q_rollup": q_rollup,
    "q_events_hourly_window": q_events_hourly_window,
    "q_sql_passthrough": q_sql_passthrough,
    "q_asof_join": q_asof_join,
    "q_bloom_join": q_bloom_join,
    "q_ivm_join": q_ivm_join,
    "q_ivm_delete": q_ivm_delete,
    "q_ivm_agg_delete": q_ivm_agg_delete,
    "q_pivot_monthly": q_pivot_monthly,
    "q_cube_orders": q_cube_orders,
    "q_quantile_sampled": q_quantile_sampled,
    "q_asof_forward": q_asof_forward,
    "q_attribution": q_attribution,
    "q_session_window": q_session_window,
    "q_grouping_sets": q_grouping_sets,
    "q_asof_tolerance": q_asof_tolerance,
    "q_window_range_frame": q_window_range_frame,
}

ORACLE = {
    "q01_pricing_summary": Q01_SQL,
    "q03_shipping_priority": Q03_SQL,
    "q04_order_priority": Q04_SQL,
    "q05_local_supplier": Q05_SQL,
    "q06_forecast_revenue": Q06_SQL,
    "q13_order_distribution": Q13_SQL,
    "q10_returned_items": Q10_SQL,
    "q22_idle_accounts": Q22_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q17_small_quantity": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q15_top_supplier": Q15_SQL,
    "q07_volume_shipping": Q07_SQL,
    "q02_min_cost_supplier": Q02_SQL,
    "q08_market_share": Q08_SQL,
    "q09_product_profit": Q09_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_priority_shipping": Q12_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_supplier": Q21_SQL,
    "q_anti_join": Q_ANTI_SQL,
    "q_top_customers": Q_TOPCUST_SQL,
    "q_window_topk": Q_WINDOW_TOPK_SQL,
    "q_window_running": Q_WINDOW_RUNNING_SQL,
    "q_setops": Q_SETOPS_SQL,
    "q_distinct_agg": Q_DISTINCT_SQL,
    "q_percentile": Q_PERCENTILE_SQL,
    "q_conditional_counts": Q_CONDITIONAL_SQL,
    "q_events_json": Q_EVENTS_JSON_SQL,
    "q_events_monthly": Q_EVENTS_MONTHLY_SQL,
    "q_events_sessions": Q_EVENTS_SESSIONS_SQL,
    "q_funnel_steps": Q_FUNNEL_STEPS_SQL,
    "q_retention_cohorts": Q_RETENTION_SQL,
    "q_range_join": Q_RANGE_JOIN_SQL,
    "q_having_dups": Q_HAVING_SQL,
    "q_rollup": Q_ROLLUP_SQL,
    "q_events_hourly_window": Q_EVENTS_HOURLY_SQL,
    "q_sql_passthrough": _PASSTHROUGH_SQL,
    "q_asof_join": Q_ASOF_SQL,
    "q_bloom_join": Q_BLOOM_JOIN_SQL,
    "q_ivm_join": Q_IVM_JOIN_SQL,
    "q_ivm_delete": Q_IVM_DELETE_SQL,
    "q_ivm_agg_delete": Q_IVM_AGG_DELETE_SQL,
    "q_pivot_monthly": Q_PIVOT_SQL,
    "q_cube_orders": Q_CUBE_SQL,
    "q_quantile_sampled": Q_QUANTILE_SAMPLED_SQL,
    "q_asof_forward": Q_ASOF_FORWARD_SQL,
    "q_attribution": Q_ATTRIBUTION_SQL,
    "q_session_window": Q_SESSION_WINDOW_SQL,
    "q_grouping_sets": Q_GROUPING_SETS_SQL,
    "q_asof_tolerance": Q_ASOF_TOLERANCE_SQL,
    "q_window_range_frame": Q_WINDOW_RANGE_SQL,
}
