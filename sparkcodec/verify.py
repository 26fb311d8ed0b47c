"""Round-trip verification + size gate (BASELINE.md §B targets).

Mirrors the reference's CI verification posture — golden equality after a
full conversion round trip (.ci/test_circuit1k_output.sh h5diff;
tests/test_integration.py libsonata exact array equality) — expressed as
Spark jobs:

- ``verify_roundtrip``: per-row sha256 equality on designated content
  columns via a key join, plus a full-row order-insensitive checksum
  (sum of xxhash64 over all columns) that scales to tables where a
  driver-side compare is impossible.
- ``size_gate``: total encoded bytes ≤ the same DataFrame written as
  Parquet/zstd (the north-rule compression bar).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _row_checksum(df: DataFrame) -> int:
    """Order-insensitive whole-table checksum: sum of per-row xxhash64."""
    cols = [F.col(c) for c in sorted(df.columns)]
    return (
        df.select(F.xxhash64(*cols).alias("h"))
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).alias("s"))
        .collect()[0]["s"]
    )


def verify_roundtrip(
    original: DataFrame,
    decoded: DataFrame,
    key_cols: list[str],
    content_cols: list[str] | None = None,
) -> dict:
    """Returns a report dict; ``ok`` is True iff every check passed."""
    content_cols = content_cols or [
        f.name for f in original.schema.fields if f.dataType.typeName() == "string"
    ]
    report: dict = {}
    n_orig = original.count()
    n_dec = decoded.count()
    report["rows_original"] = n_orig
    report["rows_decoded"] = n_dec

    def hashed(df):
        return df.select(
            *key_cols,
            *[F.sha2(F.col(c).cast("binary"), 256).alias(f"__h_{c}") for c in content_cols],
        )
    o, d = hashed(original).alias("o"), hashed(decoded).alias("d")
    joined = o.join(d, on=key_cols, how="full_outer")
    agg = joined.agg(
        F.count(F.lit(1)).alias("joined_rows"),
        *[
            # null-safe: a null content value that round-trips to null is a
            # match; only value-vs-value or null-vs-value differences count
            F.sum(
                (~F.col(f"o.__h_{c}").eqNullSafe(F.col(f"d.__h_{c}"))).cast("long")
            ).alias(f"mismatch_{c}")
            for c in content_cols
        ],
    ).collect()[0]
    report["joined_rows"] = agg["joined_rows"]
    mismatches = {c: agg[f"mismatch_{c}"] for c in content_cols}
    report["sha256_mismatches"] = mismatches
    report["checksum_original"] = str(_row_checksum(original))
    report["checksum_decoded"] = str(_row_checksum(decoded))
    report["ok"] = (
        n_orig == n_dec
        and agg["joined_rows"] == n_orig
        and all(v == 0 for v in mismatches.values())
        and report["checksum_original"] == report["checksum_decoded"]
    )
    return report


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def size_gate(
    spark: SparkSession,
    df: DataFrame,
    blocks_dir: str,
    baseline_dir: str,
) -> dict:
    """Compare our encoded size against the Parquet/zstd reference write."""
    from .engine import blocks_stats

    df.write.mode("overwrite").option("compression", "zstd").parquet(baseline_dir)
    zstd_bytes = _dir_bytes(baseline_dir)
    stats = blocks_stats(spark, blocks_dir).collect()
    enc_bytes = sum(r["enc_bytes"] for r in stats)
    raw_bytes = sum(r["raw_bytes"] for r in stats)
    disk_bytes = _dir_bytes(os.path.join(blocks_dir, "blocks"))
    return {
        "raw_bytes": raw_bytes,
        "enc_bytes": enc_bytes,
        "blocks_disk_bytes": disk_bytes,
        "parquet_zstd_bytes": zstd_bytes,
        "ratio_vs_raw": raw_bytes / enc_bytes if enc_bytes else None,
        # enc_le_zstd compares codec payload bytes; disk_le_zstd is the
        # apples-to-apples physical check (includes our container
        # overhead: blocks parquet framing + per-block meta JSON) and is
        # the one the compression bar gates on
        "enc_le_zstd": enc_bytes <= zstd_bytes,
        "disk_le_zstd": disk_bytes <= zstd_bytes,
        "per_column": [r.asDict() for r in stats],
    }
