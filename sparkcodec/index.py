"""CSR run-length edge index — reference parity for src/index/index.cpp.

The reference builds, per node ID, the run-length ranges of edge rows
referencing it: a two-level index ``node_id_to_ranges`` (per-node slice
into the range list) + ``range_to_edge_id`` (row ranges), via local run
grouping (index.cpp:114-137), an MPI_Alltoallv shuffle by node range
(index.cpp:229-249), regroup (142-153) and an Allgather prefix scan for
global offsets (272-303).

Spark-first translation (SURVEY §3.3): the explicit shuffle/offset
choreography collapses into window functions + groupBy — Catalyst plans
the exchange. Row positions come from a window over the caller's
ordering (at extreme scale, substitute a per-partition count prefix-scan;
semantics identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edge_ranges(df: DataFrame, node_col: str, order_cols: list[str]) -> DataFrame:
    """Level-2 index: maximal runs of ``node_col`` over the row order.

    Returns (node_id, range_start, range_end) with 0-based, half-open row
    positions — exactly the reference's ``_groupNodeRanges`` output
    (index.cpp:114-137).
    """
    w = Window.orderBy(*order_cols)
    pos = F.row_number().over(w) - 1
    prev = F.lag(node_col).over(w)
    run_start = F.when(prev.isNull() | (prev != F.col(node_col)), 1).otherwise(0)
    run_id = F.sum(run_start).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.select(F.col(node_col).alias("node_id"), pos.alias("__pos"), run_id.alias("__run"))
        .groupBy("__run", "node_id")
        .agg(
            F.min("__pos").alias("range_start"),
            (F.max("__pos") + 1).alias("range_end"),
        )
        .drop("__run")
    )


def csr_offsets(ranges: DataFrame) -> DataFrame:
    """Level-1 index: per node, [offset, offset+n_ranges) into the range
    list sorted by (node_id, range_start) — reference index.cpp:282-299."""
    per_node = ranges.groupBy("node_id").agg(F.count(F.lit(1)).alias("n_ranges"))
    w = Window.orderBy("node_id").rowsBetween(Window.unboundedPreceding, -1)
    return per_node.select(
        "node_id",
        F.coalesce(F.sum("n_ranges").over(w), F.lit(0)).alias("offset_start"),
        (F.coalesce(F.sum("n_ranges").over(w), F.lit(0)) + F.col("n_ranges")).alias(
            "offset_end"
        ),
    )


def build_index(
    df: DataFrame, node_col: str, order_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Both index levels for one direction; call twice for source/target
    like the reference does (index.cpp:309-324)."""
    ranges = edge_ranges(df, node_col, order_cols)
    return csr_offsets(ranges), ranges
