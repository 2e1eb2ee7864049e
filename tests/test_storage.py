"""Physical-layout utilities: bucketed co-located joins, skew salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontario_spark.data import table
from ontario_spark.storage import read_bucketed, salted_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_small):
    """Same-bucketed tables sort-merge-join with zero shuffle."""
    orders = table(spark, sf_small, "orders")
    cust = table(spark, sf_small, "customer")
    write_bucketed(orders.withColumnRenamed("o_custkey", "k"), "t_orders_b", ["k"], 4)
    write_bucketed(cust.withColumnRenamed("c_custkey", "k"), "t_cust_b", ["k"], 4)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_bucketed(spark, "t_orders_b").join(
                read_bucketed(spark, "t_cust_b"), "k"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == orders.join(
                cust, orders.o_custkey == cust.c_custkey
            ).count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_salted_join_matches_plain_join(spark, sf_small):
    orders = table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_small, "customer").select("c_custkey", "c_name")
    l = orders.withColumnRenamed("o_custkey", "k")
    r = cust.withColumnRenamed("c_custkey", "k")
    got = salted_join(l, r, "k", salt=8)
    exp = l.join(r, "k")
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_salted_left_join(spark, sf_small):
    """Left join keeps unmatched left rows exactly once."""
    nat = table(spark, sf_small, "nation").select(
        F.col("n_nationkey").alias("k"), "n_name"
    )
    reg = table(spark, sf_small, "region").select(
        F.col("r_regionkey").alias("k"), "r_name"
    )
    got = salted_join(nat, reg, "k", salt=4, how="left")
    exp = nat.join(reg, "k", "left")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_ntriples_formatting(spark):
    from ontario_spark.sinks import ntriples

    df = spark.createDataFrame(
        [
            ("http://x/s1", "http://x/p", "http://x/o"),
            ("http://x/s2", "http://x/p", 'say "hi" \\ done'),
            ("_:b0", "http://x/p", "plain"),
        ],
        "s string, p string, o string",
    )
    got = sorted(r["ntriple"] for r in ntriples(df).collect())
    assert got == sorted([
        "<http://x/s1> <http://x/p> <http://x/o> .",
        '<http://x/s2> <http://x/p> "say \\"hi\\" \\\\ done" .',
        '_:b0 <http://x/p> "plain" .',
    ])


def test_write_results_roundtrip(spark, tmp_path):
    from ontario_spark.sinks import write_results

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "k long, part string"
    )
    out = str(tmp_path / "res")
    write_results(df, out, fmt="parquet", partition_by=["part"])
    back = spark.read.parquet(out)
    assert back.count() == 3
    import os
    assert any(d.startswith("part=") for d in os.listdir(out))


def test_generate_catalog_cli(tmp_path, spark):
    # CLI writes a loadable catalog + molecule summary from the lake dir
    import json
    from ontario_spark.catalog.generate import main
    from ontario_spark.catalog.serde import load

    out = str(tmp_path / "cat.json")
    summ = str(tmp_path / "mt.json")
    main(["--lake", "/root/testdata/sf0.001", "--out", out, "--summary", summ])
    cat = load(out)
    assert len(cat.triple_maps) >= 8
    mts = json.load(open(summ))
    assert any(m.get("linked_to") for m in mts.values())


def test_profile_table_hostile_column_names(spark):
    """Case-colliding and quote-bearing column names are legal in lake
    parquet; the profiler must not corrupt its generated SQL."""
    from ontario_spark.storage import profile_table

    df = spark.createDataFrame([(1, 2, "x"), (3, None, "y's")], ["k", "K", "it's"])
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "K", "it's"}
    assert out["K"]["n_nulls"] == 1 and out["k"]["n_nulls"] == 0
    assert out["it's"]["n_distinct"] == 2


def test_compact_files_reduces_file_count(spark, tmp_path):
    """64 tiny files compact into few target-sized files with content
    unchanged; the staged swap leaves no temp directory behind."""
    import os

    from ontario_spark.storage import compact_files

    path = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(path)
    before = len(spark.read.parquet(path).inputFiles())
    assert before >= 32
    n_out = compact_files(spark, path, target_mb=512)
    assert n_out == 1  # tiny dataset → one target-sized file
    got = spark.read.parquet(path)
    assert len(got.inputFiles()) == 1
    assert got.count() == 10_000
    assert got.agg({"id": "sum"}).collect()[0][0] == 49_995_000
    assert not os.path.exists(path + ".__compact__")


def test_compact_files_refuses_partitioned_layout(spark, tmp_path):
    import pytest

    from ontario_spark.storage import compact_files

    path = str(tmp_path / "part")
    spark.range(0, 100).withColumn("p", (F.col("id") % 2)).write.partitionBy(
        "p"
    ).parquet(path)
    with pytest.raises(ValueError, match="Hive-partitioned"):
        compact_files(spark, path)


class TestZOrderKey:
    def test_hand_interleave(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from ontario_spark.storage import zorder_key

        df = spark.createDataFrame(
            [(3, 1), (0, 0), (5, 2), (65535, 65535)], ["x", "y"]
        )
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y", zorder_key(["x", "y"], 16).alias("z")
            ).collect()
        }
        # x bits land at even positions, y bits at odd
        assert got[(3, 1)] == 0b111
        assert got[(0, 0)] == 0
        assert got[(5, 2)] == 0b011001  # x=101 -> bits 0,4; y=010 -> bit 3
        assert got[(65535, 65535)] == (1 << 32) - 1
        with pytest.raises(ValueError):
            zorder_key(["a", "b", "c", "d"], 16)  # 64 bits > 63

    def test_matches_duckdb_expression(self, spark):
        import duckdb

        from ontario_spark.storage import zorder_key, zorder_key_sql

        rows = [(a * 97 % 256, a * 53 % 256) for a in range(64)]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = sorted(
            tuple(r)
            for r in df.select(
                "x", "y", zorder_key(["x", "y"], 8).alias("z")
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t (x BIGINT, y BIGINT)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        want = sorted(
            con.execute(
                f"SELECT x, y, {zorder_key_sql(['x', 'y'], 8)} FROM t"
            ).fetchall()
        )
        assert got == want
