"""Relational/OLAP headline queries over the driver's TPC-H-ish tables.

Each query exists twice: as an idiomatic DataFrame program (Catalyst
plans it: filter/column pushdown into the parquet scan, broadcast joins
for the small dims, partial aggregation) and as ANSI SQL the driver runs
on DuckDB. Column names are aliased identically on both sides — the
driver's compare hashes values after sorting columns by name.

Exactness policy: double aggregation order differs between engines, so
every SUM/AVG casts per-row values to DECIMAL(18,6) first (deterministic
double→decimal rounding, exact decimal addition), then casts the final
aggregate back to double. Queries with LIMIT always ORDER BY with a
unique tiebreaker so the selected set is well-defined.

These replace nothing in the reference — SDM-TIB/Ontario has NO
aggregation/sorting execution at all (SURVEY.md §2.5; ORDER BY is parsed
then silently dropped, ``ontario/mediator/Planner.py:70-100``). This
module is the beyond-reference OLAP surface BASELINE.json asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontario_spark.data import table

DEC = "decimal(18,6)"


def dsum(col, alias: str):
    """Exact sum: per-row cast to decimal, exact add, result as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col, alias: str):
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def _sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def _sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS {alias}"


# --- q1: pricing summary (scan-heavy groupBy agg; map-side combine) -----


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread(): the fixture's lineitem is ONE parquet row group, so the
    # scan — and with it q1's whole decimal partial aggregation — is a
    # single task however split settings are tuned. Round-robin the
    # pruned scan output across cores first (measured 1.9 s → 1.0 s at
    # sf0.1); no-op at any real scale where the scan has many splits.
    # Worth it only for single-table aggregate plans: join plans
    # shuffle by key immediately, so a prior round-robin exchange would
    # just double the shuffle count.
    from ontario_spark.operators.textops import spread

    l = spread(table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  {_sql_dsum('l_quantity', 'sum_qty')},
  {_sql_dsum('l_extendedprice', 'sum_base_price')},
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'sum_disc_price')},
  {_sql_dsum('((l_extendedprice * (1 - l_discount)) * (1 + l_tax))', 'sum_charge')},
  {_sql_davg('l_quantity', 'avg_qty')},
  {_sql_davg('l_extendedprice', 'avg_price')},
  {_sql_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-06-30'
GROUP BY l_returnflag, l_linestatus
"""


# --- q3: shipping priority (3-way join, agg, top-k) ---------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- q5: local supplier volume (6-way star join) ------------------------


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # supplier scales with SF — no forced broadcast (AQE decides);
        # nation/region are 25/5 rows at EVERY SF, so their hints stay
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


Q5_SQL = f"""
SELECT n_name,
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


# --- q6: forecasting revenue change (pure scan + filter pushdown) -------


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


Q6_SQL = f"""
SELECT {_sql_dsum('(l_extendedprice * l_discount)', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- top customers (join + agg + top-k) ---------------------------------


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dsum("o_totalprice", "total_spent"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


Q_TOP_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_name, COUNT(*) AS order_count,
  {_sql_dsum('o_totalprice', 'total_spent')}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey ASC
LIMIT 10
"""


# --- left outer join: order counts including customers with none --------


def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


Q_CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, COUNT(o_orderkey) AS order_count
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# --- semi / anti joins --------------------------------------------------


def q_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


Q_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join. The predicate on the right side keeps the result
    non-empty at every scale factor (every customer has SOME order in
    the fixture, but not every customer has a big urgent one)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000.0)
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


Q_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0)
"""


# --- distinct / union ---------------------------------------------------


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


Q_DISTINCT_SQL = "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer"


def q_union_priority_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("urgent").alias("slice")
    )
    big = o.filter(F.col("o_totalprice") > 200000.0).select(
        "o_orderkey", "o_totalprice", F.lit("big").alias("slice")
    )
    return hi.unionByName(big)


Q_UNION_SQL = """
SELECT o_orderkey, o_totalprice, 'urgent' AS slice FROM orders
WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_totalprice, 'big' AS slice FROM orders
WHERE o_totalprice > 200000.0
"""


# --- window function: top-2 orders per customer -------------------------


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q_WINDOW_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 2
"""


# --- order by + offset/limit pagination ---------------------------------


def q_orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(20)
        .limit(10)
    )


Q_PAGE_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10 OFFSET 20
"""


# --- time-bucketed event aggregation (batch twin of the streaming op) ---


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
    )


Q_EVENTS_HOURLY_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
  COUNT(*) AS n_events, {_sql_dsum('value', 'total_value')}
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


# --- per-brand part stats ----------------------------------------------


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        davg("p_retailprice", "avg_price"),
        F.max("p_size").alias("max_size"),
    )


Q_PART_BRAND_SQL = f"""
SELECT p_brand, COUNT(*) AS n_parts,
  {_sql_davg('p_retailprice', 'avg_price')},
  MAX(p_size) AS max_size
FROM part GROUP BY p_brand
"""


def q_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (beyond the reference — it has no
    GROUP BY at all): revenue at (flag, status), per-flag subtotal, and
    grand total in ONE partial-aggregating pass — Spark expands the
    grouping sets map-side, so the lineitem scan still happens once.
    spread(): see q1 — single-table aggregate over a one-row-group
    fixture scan."""
    from ontario_spark.operators.textops import spread

    l = spread(table(spark, sf_dir, "lineitem"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dsum(rev, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .select(
            # subtotal rows carry NULL keys; label them so the result is
            # a plain comparable table (source columns are non-null)
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "revenue",
            "n_items",
        )
    )


Q_ROLLUP_FLAG_STATUS_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
  COALESCE(l_linestatus, 'ALL') AS status,
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'revenue')},
  COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-set aggregation (round 10): all four grouping
    combinations of (flag, status) — cells, both one-dimension
    margins, and the grand total — in ONE partial-aggregating pass
    (ROLLUP's sibling; Spark expands the sets map-side so lineitem
    still scans once)."""
    from ontario_spark.operators.textops import spread

    l = spread(table(spark, sf_dir, "lineitem"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(dsum(rev, "revenue"), F.count(F.lit(1)).alias("n_items"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "revenue",
            "n_items",
        )
    )


Q_CUBE_FLAG_STATUS_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
  COALESCE(l_linestatus, 'ALL') AS status,
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'revenue')},
  COUNT(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (round 11) — the general form CUBE and
    ROLLUP are shorthands for, with an ASYMMETRIC set list neither
    shorthand can express: (flag, status) cells, status-only margins,
    and the grand total — no flag-only margin. GROUPING() flags
    disambiguate real NULL keys from subtotal rows, the part of the
    spec COALESCE labeling can't cover. One partial-aggregating pass:
    Spark expands grouping sets map-side, lineitem scans once."""
    from ontario_spark.operators.textops import spread

    spread(table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "__gs_lineitem"
    )
    return spark.sql(
        f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
  COALESCE(l_linestatus, 'ALL') AS status,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'revenue')},
  COUNT(*) AS n_items
FROM __gs_lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""
    )


Q_GROUPING_SETS_MIXED_SQL = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
  COALESCE(l_linestatus, 'ALL') AS status,
  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
  {_sql_dsum('(l_extendedprice * (1 - l_discount))', 'revenue')},
  COUNT(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint audit (round 11) — the dbt-test /
    Great-Expectations shape run before anything downstream trusts a
    lake drop: primary-key uniqueness, foreign-key orphans (anti-join
    counts), null violations, and range violations across
    orders/customer/lineitem, ONE summary row. The synthetic fixture
    is clean (every check would be a constant 0 and the oracle match
    vacuous), so violations are PLANTED deterministically by key
    residue — duplicated pk rows, custkeys pointed at a guaranteed-
    absent id, negated prices/quantities, out-of-range discounts,
    lineitems remapped to absent orders — identically in both engines
    (the text_license_scan/pii discipline): every output count is
    data-dependent and each detector is proven against known-injected
    rows. Each check is an aggregate/anti-join the optimizer plans
    independently; the single-row combine is free."""
    base_o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    base_li = table(spark, sf_dir, "lineitem")
    ok = F.col("o_orderkey")
    o = base_o.select(
        "o_orderkey",
        F.when(ok % 89 == 0, F.lit(None).cast("long"))
        .when(ok % 97 == 0, F.lit(-1))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(ok % 101 == 0, -F.col("o_totalprice")).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    o = o.unionByName(o.filter(ok % 103 == 0))  # re-inserted pk dups
    lk = F.col("l_orderkey")
    li = base_li.select(
        F.when(lk % 109 == 0, -lk).otherwise(lk).alias("l_orderkey"),
        F.when(lk % 113 == 0, -F.col("l_quantity")).otherwise(F.col("l_quantity")).alias("l_quantity"),
        F.when(lk % 127 == 0, F.lit(1.5)).otherwise(F.col("l_discount")).alias("l_discount"),
    )
    pk = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("dup_orderkeys"),
        F.sum(F.col("o_custkey").isNull().cast("int"))
        .cast("long")
        .alias("null_custkeys"),
        F.sum((F.col("o_totalprice") <= 0).cast("int"))
        .cast("long")
        .alias("nonpositive_totalprice"),
    )
    fk_o = (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_orders"))
    )
    fk_l = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("orphan_lineitems"))
    )
    rng = li.agg(
        F.sum((F.col("l_quantity") <= 0).cast("int"))
        .cast("long")
        .alias("nonpositive_qty"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("int")
        )
        .cast("long")
        .alias("bad_discounts"),
    )
    return (
        pk.crossJoin(F.broadcast(fk_o))
        .crossJoin(F.broadcast(fk_l))
        .crossJoin(F.broadcast(rng))
    )


Q_DQ_CONSTRAINTS_SQL = """
WITH o0 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 89 = 0 THEN NULL
              WHEN o_orderkey % 97 = 0 THEN -1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 101 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice
  FROM orders
), o AS (
  SELECT * FROM o0
  UNION ALL SELECT * FROM o0 WHERE o_orderkey % 103 = 0
), l AS (
  SELECT CASE WHEN l_orderkey % 109 = 0 THEN -l_orderkey
              ELSE l_orderkey END AS l_orderkey,
         CASE WHEN l_orderkey % 113 = 0 THEN -l_quantity
              ELSE l_quantity END AS l_quantity,
         CASE WHEN l_orderkey % 127 = 0 THEN 1.5
              ELSE l_discount END AS l_discount
  FROM lineitem
)
SELECT
  CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM o) AS BIGINT)
    AS dup_orderkeys,
  CAST((SELECT COUNT(*) FROM o WHERE o_custkey IS NULL) AS BIGINT)
    AS null_custkeys,
  CAST((SELECT COUNT(*) FROM o WHERE o_totalprice <= 0) AS BIGINT)
    AS nonpositive_totalprice,
  CAST((SELECT COUNT(*) FROM o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    AS orphan_orders,
  CAST((SELECT COUNT(*) FROM l
        WHERE NOT EXISTS (SELECT 1 FROM o
                          WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    AS orphan_lineitems,
  CAST((SELECT COUNT(*) FROM l WHERE l_quantity <= 0) AS BIGINT)
    AS nonpositive_qty,
  CAST((SELECT COUNT(*) FROM l
        WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    AS bad_discounts
"""


def q_pivot_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (round 10): order counts per market segment, one column
    per order priority — the wide report layout every BI export wants.
    Spark's relational pivot with an EXPLICIT value list (so the plan
    is a single conditional aggregate, no extra distinct-values job);
    the oracle writes the same thing as portable conditional
    aggregation."""
    pr = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "o_orderpriority"
    )
    wide = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderpriority", pr)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("c_mktsegment").alias("segment")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0))
        .cast("long")
        .alias(f"p{i + 1}")
        for i, p in enumerate(pr)
    ]
    return wide.select(*cols)


Q_PIVOT_SEGMENT_SQL = """
SELECT c_mktsegment AS segment,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q_cube_flag_status": q_cube_flag_status,
    "q_grouping_sets_mixed": q_grouping_sets_mixed,
    "q_dq_constraints": q_dq_constraints,
    "q_pivot_segment_priority": q_pivot_segment_priority,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_revenue_change": q6_revenue_change,
    "q_top_customers": q_top_customers,
    "q_customer_order_counts": q_customer_order_counts,
    "q_customers_with_urgent_orders": q_customers_with_urgent_orders,
    "q_customers_without_orders": q_customers_without_orders,
    "q_distinct_segments": q_distinct_segments,
    "q_union_priority_slices": q_union_priority_slices,
    "q_top_orders_per_customer": q_top_orders_per_customer,
    "q_orders_page": q_orders_page,
    "q_events_hourly": q_events_hourly,
    "q_rollup_flag_status": q_rollup_flag_status,
    "q_part_brand_stats": q_part_brand_stats,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q_cube_flag_status": Q_CUBE_FLAG_STATUS_SQL,
    "q_grouping_sets_mixed": Q_GROUPING_SETS_MIXED_SQL,
    "q_dq_constraints": Q_DQ_CONSTRAINTS_SQL,
    "q_pivot_segment_priority": Q_PIVOT_SEGMENT_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_revenue_change": Q6_SQL,
    "q_top_customers": Q_TOP_CUSTOMERS_SQL,
    "q_customer_order_counts": Q_CUSTOMER_ORDER_COUNTS_SQL,
    "q_customers_with_urgent_orders": Q_SEMI_SQL,
    "q_customers_without_orders": Q_ANTI_SQL,
    "q_distinct_segments": Q_DISTINCT_SQL,
    "q_union_priority_slices": Q_UNION_SQL,
    "q_top_orders_per_customer": Q_WINDOW_SQL,
    "q_orders_page": Q_PAGE_SQL,
    "q_events_hourly": Q_EVENTS_HOURLY_SQL,
    "q_rollup_flag_status": Q_ROLLUP_FLAG_STATUS_SQL,
    "q_part_brand_stats": Q_PART_BRAND_SQL,
}
