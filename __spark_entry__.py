"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship job: encode the sf0.001 ``documents`` table
(the code_files-shaped input) with the sparkcodec engine, decode it, and
return the per-column codec/byte accounting joined with round-trip
verification counts. ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 plus the training-pipeline ops, each with a
DuckDB-runnable oracle where SQL can express it.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode -> decode -> verify the sf0.001 documents table;
    returns one row per (column, codec) with byte accounting and the
    round-trip check result."""
    from sparkcodec.engine import blocks_stats, decode_table, encode_table

    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = os.path.join(tempfile.gettempdir(), "sparkcodec_entry")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark,
        df,
        out,
        cluster_by=["lang"],
        salt_by=["doc_id"],
        sort_by=["lang", "doc_id"],
        num_parts=4,
        resume=False,
    )
    decoded = decode_table(spark, out)
    orig_hash = df.select(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
    dec_hash = decoded.select(F.sha2(F.col("text").cast("binary"), 256).alias("h"))
    n_match = orig_hash.intersectAll(dec_hash).count()
    n_total = df.count()
    stats = blocks_stats(spark, out)
    return stats.withColumn("sha256_rows_matched", F.lit(n_match)).withColumn(
        "sha256_rows_total", F.lit(n_total)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparkcodec.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparkcodec.queries import ORACLES, _records_fixture

    # the record-source oracle reads the fixture's parquet twin — make
    # sure it exists even if the oracle runs before the Spark query
    _records_fixture()
    return dict(ORACLES)
