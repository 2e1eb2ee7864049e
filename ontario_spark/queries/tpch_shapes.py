"""TPC-H queries whose original predicates need columns the synthetic
schema lacks (``partsupp``, ``l_commitdate``/``l_receiptdate``,
``l_shipmode``, comment fields), re-expressed on columns that DO exist
while keeping each query's defining SHAPE — the part the optimizer has
to get right:

- q2  — correlated regional-minimum scalar subquery (min window)
- q4  — correlated EXISTS semi-join into the fact table, then agg
- q9  — 5-way star join with an arithmetic profit measure
- q11 — group-by vs a global-total threshold (scalar subquery)
- q12 — fact⋈fact join with conditional (CASE) aggregation
- q16 — NOT IN exclusion subquery + COUNT(DISTINCT)
- q20 — nested IN subqueries with a correlated quantity threshold
- q21 — double correlation: EXISTS + NOT EXISTS against the same table

q2/q20 run over a partsupp DERIVED from lineitem (round 9 — see
``_derived_partsupp``), completing all 22 TPC-H query shapes.

Same policies as tpch.py: DECIMAL(18,6) per-row casts inside SUM so
distributed double addition is order-independent; LIMIT always under a
unique ORDER BY; identical column aliases on both engines.

Scale notes (100 TB): q4/q21's correlated subqueries are expressed as
semi/anti joins on the orderkey — one shuffle each, no per-row probes.
q11's global total is a window over the POST-aggregation frame (a few
million groups at most), never a second scan of lineitem, and the
threshold compares decimals scaled by 1000 so no engine-specific
decimal×fraction rounding is involved. Dimension sides are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ontario_spark.data import table
from ontario_spark.queries.tpch import _sql_dsum, dsum

DEC = "decimal(18,6)"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --- q4: order priority checking (EXISTS semi-join) ----------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape. Original: orders in a quarter having a lineitem
    with l_commitdate < l_receiptdate. Those columns don't exist, so
    "late" is re-expressed as a lineitem shipped ≥30 days after the
    order date. The correlated EXISTS becomes a left-semi join on the
    orderkey (one shuffle, no per-order probe)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    l = table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q9: product type profit (5-way join + arithmetic measure) -----------


def q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape. ps_supplycost doesn't exist (no partsupp), so
    unit cost is re-expressed as 60% of p_retailprice. lineitem⋈orders
    is the only guaranteed shuffle; nation (25 rows at EVERY SF) is
    force-broadcast, while part/supplier SCALE with SF so their hints
    are left to AQE — at gate scale the stats pick broadcast anyway,
    at 100 TB a forced hint is a hard job failure (round-8: same rule
    as the dedup sizes fix)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.6
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
  {_sql_dsum('(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity)', 'sum_profit')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- q11: important parts (group total vs global threshold) --------------


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape. partsupp value becomes NATION_3-supplied revenue
    per part; "important" = value above 2× the mean part value (TPC-H's
    0.0001/SF fraction made scale-invariant — a fixed fraction selects
    nothing once part count grows). The global total/count are windows
    over the POST-aggregation frame — lineitem is scanned once (a
    self-referencing agg join would defeat ReuseExchange and scan it
    twice). The threshold cross-multiplies exact decimals by the
    integer group count, so no engine-specific decimal÷int rounding is
    involved."""
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem")
    value_dec = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    )
    per_part = (
        # supplier scales with SF → no forced broadcast (AQE decides);
        # the filtered nation (≤25 rows) keeps its hint
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(value_dec.alias("value_dec"))
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("total_dec", F.sum("value_dec").over(w))
        .withColumn("nparts", F.count(F.lit(1)).over(w))
        .filter(F.col("value_dec") * F.col("nparts") > F.col("total_dec") * 2)
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_SQL = """
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
FROM (
  SELECT l_partkey, value_dec,
    SUM(value_dec) OVER () AS total_dec,
    COUNT(*) OVER () AS nparts
  FROM (
    SELECT l_partkey,
      SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value_dec
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey) per_part) windowed
WHERE value_dec * nparts > total_dec * 2
ORDER BY value DESC, l_partkey
"""


# --- q12: shipping modes / priority classes (conditional agg) ------------


def q12_returnflag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape. l_shipmode doesn't exist; l_returnflag ('A'/'N')
    stands in as the two-valued mode column. The CASE sums count
    critical vs non-critical order priorities per flag."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & F.col("l_returnflag").isin("A", "N")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_returnflag IN ('A', 'N')
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q16: supplier counts with NOT IN exclusion ---------------------------


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape. The "customer complaints" NOT IN subquery is
    re-expressed as low-balance suppliers (s_acctbal < 1000); partsupp
    becomes the observed part↔supplier pairs in lineitem."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9)
    )
    excluded = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    l = table(spark, sf_dir, "lineitem")
    return (
        # p and excluded both scale with SF → hints left to AQE
        l.join(p, l.l_partkey == p.p_partkey)
        .join(excluded, l.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ---------


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape. Without receipt/commit dates, "kept the order
    waiting" = this supplier's lineitem shipped strictly LAST among ≥2
    suppliers of a finished ('F') order. The correlated EXISTS becomes
    a left-semi join (another supplier exists on the order) and the
    NOT EXISTS a left-anti join (nobody else shipped on-or-after this
    line) — both equi on orderkey with residual predicates, so each is
    one shuffle against lineitem, never a per-row subquery."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = table(spark, sf_dir, "lineitem").alias("l1")
    l2 = table(spark, sf_dir, "lineitem").alias("l2")
    l3 = table(spark, sf_dir, "lineitem").alias("l3")
    base = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey)
        .join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    other_exists = (F.col("l2.l_orderkey") == F.col("l1.l_orderkey")) & (
        F.col("l2.l_suppkey") != F.col("l1.l_suppkey")
    )
    other_not_after = (
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
        & (F.col("l3.l_shipdate") >= F.col("l1.l_shipdate"))
    )
    return (
        base.join(l2, other_exists, "left_semi")
        .join(l3, other_not_after, "left_anti")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_skew_suppkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic over the fact table (round 6):
    lineitem's 10 heaviest supplier keys with row count and share —
    the ``storage.key_skew_profile`` operator a 100 TB operator runs
    before sizing a salted join or bucket layout."""
    from ontario_spark.storage import key_skew_profile

    return key_skew_profile(
        table(spark, sf_dir, "lineitem"), "l_suppkey", top=10
    )


Q_SKEW_SQL = """
WITH counts AS (
  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
), tot AS (SELECT SUM(cnt) AS total FROM counts)
SELECT l_suppkey, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
FROM counts CROSS JOIN tot
ORDER BY cnt DESC, l_suppkey
LIMIT 10
"""


# --- derived partsupp: the stand-in that completes the suite -------------
#
# The synthetic schema ships no partsupp table, which kept q2/q20 out
# through round 8. Both queries' DEFINING shapes (q2: correlated
# regional-minimum scalar subquery; q20: nested IN subqueries with a
# correlated half-of-shipped-quantity threshold) survive intact over a
# partsupp DERIVED from lineitem: every observed (partkey, suppkey)
# pair becomes a partsupp row with supplycost = MIN unit price and
# availqty = total shipped quantity. MIN over doubles is
# order-independent (no addition), availqty uses the DECIMAL(18,6)
# exact-sum pattern — both cross-engine deterministic, so the DuckDB
# oracle reproduces the derivation bit-for-bit.


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        dsum("l_quantity", "ps_availqty"),
    )


_PS_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         {_sql_dsum('l_quantity', 'ps_availqty')}
  FROM lineitem GROUP BY 1, 2
"""


# --- q2: minimum-cost supplier (correlated regional-min subquery) --------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over the derived partsupp: for each EUROPE-sourced
    part (p_size=15, name LIKE %bolt — stand-ins for size/type BRASS),
    the supplier(s) achieving the REGIONAL MINIMUM supply cost. The
    spec's correlated scalar subquery decorrelates into a min window
    over the region-restricted join — one pass, no second partsupp
    scan. nation/region are force-broadcast (25/5 rows at every SF);
    part/supplier joins stay AQE-decided. LIMIT rides a unique sort
    (acctbal desc, nation, supplier name, partkey)."""
    ps = _derived_partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & F.col("p_name").like("%bolt")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    j = (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        .join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        j.withColumn("__mc", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("__mc"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            "ps_supplycost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH ps AS ({_PS_SQL}),
j AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost,
         MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
  FROM ps
  JOIN part ON ps_partkey = p_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND p_name LIKE '%bolt' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
FROM j WHERE ps_supplycost = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- q20: potential part promotion (nested IN + correlated threshold) ----


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape over the derived partsupp: EUROPE suppliers for
    whom 1997 accounts for over 90% of all-time shipments of some
    cold* part (p_name LIKE 'cold%' stands in for 'forest%'). Because
    the derived availqty is the all-time shipped quantity (a superset
    of any year), the spec's direction — availqty > half the year's
    quantity — would hold vacuously; the flipped, tightened form (the
    year over 90% of all-time) keeps the correlated threshold
    genuinely selective at every probe scale while preserving the
    shape. The spec's nested IN subqueries become
    left-semi joins — partsupp semi-joins the part subset, the
    correlated threshold joins on the (partkey, suppkey) pair, and
    supplier semi-joins the surviving suppkeys: three key-hashed
    joins, no per-row probes. The threshold compares exact decimal
    sums scaled by integers (shipped_1997*10 > availqty*9), so no
    fractional float rounding differs across engines."""
    ps = _derived_partsupp(spark, sf_dir)
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("cold%"))
    l97 = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty_1997"))
    )
    cand = (
        ps.join(p, ps.ps_partkey == p.p_partkey, "left_semi")
        .join(
            l97,
            (ps.ps_partkey == l97.l_partkey)
            & (ps.ps_suppkey == l97.l_suppkey),
        )
        .filter(F.col("qty_1997") * 10 > F.col("ps_availqty") * 9)
        .select("ps_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(cand, s.s_suppkey == cand.ps_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = f"""
WITH ps AS ({_PS_SQL}),
l97 AS (
  SELECT l_partkey, l_suppkey,
         {_sql_dsum('l_quantity', 'qty_1997')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
cand AS (
  SELECT ps_suppkey FROM ps
  JOIN l97 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'cold%')
    AND qty_1997 * 10 > ps_availqty * 9
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT ps_suppkey FROM cand)
ORDER BY s_name
"""


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout diagnostic: lineitem tiled into the 64 quadtree
    cells given by the TOP 6 bits of the Morton interleave of
    (l_orderkey, l_partkey) low-16-bit keys; per-cell min/max spans of
    BOTH dimensions are bounded by construction (a 6-bit z prefix
    fixes 3 high bits of each dim → spans ≤ 2¹³) — the property that
    lets scans filtering on EITHER key prune files, where a
    single-column sort clusters only itself (storage.py::zorder_key;
    bit-shift codegen, engine-portable). Map-only + ONE aggregate —
    a first draft used ntile over a global ORDER BY, which plans as a
    single-partition window (the exact anti-pattern a layout job must
    avoid; fixed z-RANGE tiles need no global rank at all)."""
    from ontario_spark.storage import zorder_key

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey").bitwiseAND(F.lit(0xFFFF))).alias("ok"),
        (F.col("l_partkey").bitwiseAND(F.lit(0xFFFF))).alias("pk"),
    )
    z = zorder_key(["ok", "pk"], 16)
    return (
        li.withColumn("cell", F.shiftright(z, 26))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("ok") - F.min("ok")).alias("ok_span"),
            (F.max("pk") - F.min("pk")).alias("pk_span"),
        )
    )


def _q_zorder_sql() -> str:
    from ontario_spark.storage import zorder_key_sql

    z = zorder_key_sql(["ok", "pk"], 16)
    return f"""
WITH m AS (
  SELECT (l_orderkey & 65535) AS ok, (l_partkey & 65535) AS pk
  FROM lineitem
)
SELECT ({z} >> 26) AS cell, COUNT(*) AS n_rows,
       CAST(MAX(ok) - MIN(ok) AS BIGINT) AS ok_span,
       CAST(MAX(pk) - MIN(pk) AS BIGINT) AS pk_span
FROM m GROUP BY cell
"""


Q_ZORDER_SQL = _q_zorder_sql()


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q20_potential_promotion": q20_potential_promotion,
    "q4_order_priority": q4_order_priority,
    "q9_nation_year_profit": q9_nation_year_profit,
    "q11_important_parts": q11_important_parts,
    "q12_returnflag_priority": q12_returnflag_priority,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q_skew_suppkey": q_skew_suppkey,
    "q_zorder_layout": q_zorder_layout,
}

ORACLE = {
    "q2_min_cost_supplier": Q2_SQL,
    "q20_potential_promotion": Q20_SQL,
    "q4_order_priority": Q4_SQL,
    "q9_nation_year_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_returnflag_priority": Q12_SQL,
    "q16_part_supplier_counts": Q16_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q_skew_suppkey": Q_SKEW_SQL,
    "q_zorder_layout": Q_ZORDER_SQL,
}
