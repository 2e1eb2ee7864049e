"""Golden-output gate: every registered query hash-matches its DuckDB
oracle at sf0.001 (fast) — mirrors the driver's t2 check at sf0.01."""

from __future__ import annotations

import pytest

from ontario_spark.queries import all_oracle_sql, all_queries
from tests.oracle import assert_match, run_oracle

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    if name not in ORACLE:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops
        return
    assert_match(df, run_oracle(ORACLE[name], sf_small), name)


def test_all_queries_have_oracle_or_are_declared():
    missing = [n for n in QUERIES if n not in ORACLE]
    # Non-SQL-expressible ops are allowed to omit oracles, but keep the
    # list explicit so drift is caught.
    allowed_missing = {
        n
        for n in missing
        if n.startswith(("stream_", "lsh_", "minhash_", "simhash_", "mm_", "sketch_"))
        or n == "ann_topk_ivf"  # k-means quantizer — no DuckDB equivalent
    }
    assert set(missing) == allowed_missing, f"queries without oracle: {missing}"
