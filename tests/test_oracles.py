"""Mirror of the driver's correctness gate: every queries() entry runs on
Spark AND its oracle_sql() runs on DuckDB at sf0.01; row count, column
set, and order-insensitive values must match.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, round floats,
    stringify, sort rows."""
    cols_sorted = sorted(cols)
    out = []
    for r in rows:
        vals = []
        for c in cols_sorted:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def _entries():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    return [(k, qs[k], os_.get(k)) for k in sorted(qs)]


@pytest.mark.parametrize("name", [k for k, _, _ in _entries()])
def test_query_vs_oracle(spark, duck, name):
    import __spark_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    assert spark_rows is not None
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return
    rel = duck.execute(sql)
    cols = [d[0] for d in rel.description]
    duck_rows = [dict(zip(cols, row)) for row in rel.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    assert sorted(sdf.columns) == sorted(cols), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(cols)}"
    )
    a = _canon(spark_rows, sdf.columns)
    b = _canon(duck_rows, cols)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    total = rows[0]["sha256_rows_total"]
    assert all(r["sha256_rows_matched"] == total for r in rows)
