"""Oracle-side type audit (round-4 verdict item 5).

The driver's correctness hash is type/format-sensitive: an uncast
SUM(BIGINT) in DuckDB widens to HUGEINT (int128) while Spark stays
bigint, and the two engines then format the same values differently
(the round-3 bm25 / kernel_density reds). This test runs EVERY oracle
SQL through DuckDB on the sf0.001 tables and asserts no result column
relies on implicit DuckDB widening — every type must be in the closed
set that both engines format identically.
"""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TYPES_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Types whose python-value rendering is identical across DuckDB and
# Spark's collect(): ints, doubles, strings, bytes, bools, dates.
# Notably EXCLUDED: HUGEINT / UHUGEINT (int128 widening of SUM over
# ints), DECIMAL (scale-dependent formatting), TIMESTAMP WITH TIME
# ZONE (session-TZ dependent).
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BLOB",
    "BOOLEAN",
    "DATE",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_resolves_to_exact_types(con):
    oracles = entry_mod.oracle_sql()
    assert oracles, "oracle_sql() returned nothing"
    offenders = {}
    for name, sql in oracles.items():
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle SQLs rely on implicit DuckDB widening (cast them): "
        f"{offenders}"
    )


def test_every_query_has_an_oracle_or_is_declared():
    # every queries() entry should have an oracle; the driver records a
    # weaker rows-only check otherwise, so any gap must be deliberate.
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs, f"orphan oracles: {os_ - qs}"
    assert qs == os_, f"queries without oracles: {qs - os_}"
