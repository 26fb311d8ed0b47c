"""CSR run-length edge index — reference parity for src/index/index.cpp.

The reference builds, per node ID, the run-length ranges of edge rows
referencing it: a two-level index ``node_id_to_ranges`` (per-node slice
into the range list) + ``range_to_edge_id`` (row ranges), via local run
grouping (index.cpp:114-137), an MPI_Alltoallv shuffle by node range
(index.cpp:229-249), regroup (142-153) and an Allgather prefix scan for
global offsets (272-303).

Spark-first translation (SURVEY §3.3), distributed end-to-end — no
global single-task window anywhere:

1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions`` gives a
   total order with partition id == rank (the Alltoallv twin; Catalyst
   plans one range exchange).
2. A vectorized ``mapInArrow`` kernel groups maximal runs *locally* per
   partition (the reference's ``_groupNodeRanges``, index.cpp:114-137),
   emitting local row offsets; the result is ``localCheckpoint``-ed —
   the Spark twin of the reference holding each rank's run list in
   memory — so the downstream branches read it instead of re-sorting.
3. Per-partition row totals are read from the O(#parts) closing runs
   and prefix-scanned on the driver into global partition offsets (the
   Allgather twin, index.cpp:272-303), then broadcast-joined back.
4. Runs can only continue across a partition boundary (within a
   partition a run ends exactly where the value changes), so only the
   first/last run of each partition — O(2·#parts) rows — enter a final
   chain-merge kernel; interior runs pass through untouched.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__pid"


class _PidTotalsParam(AccumulatorParam):
    """Dict accumulator {partition id -> total}. Each partition writes its
    own key exactly once per attempt with a value that is a pure function
    of the partition's rows, so merge-by-overwrite is idempotent under
    task retries/speculation (unlike additive accumulators)."""

    def zero(self, value):
        return {}

    def addInPlace(self, a, b):
        a.update(b)
        return a


def _num_range_parts(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _ranged(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Range-shuffle + in-partition sort: total order, pid == global rank.

    No explicit partition count: AQE right-sizes the range shuffle
    (coalescing adjacent range partitions, which preserves the
    pid-is-rank invariant) so small inputs don't pay 32 near-empty
    tasks and huge inputs still spread across the cluster."""
    return (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )


def _offsets_df(spark, totals: dict[int, int]) -> DataFrame:
    """Exclusive prefix sum of per-partition totals (O(#parts) entries,
    driver-side — the reference's Allgather over ranks). ``totals`` comes
    from a _PidTotalsParam accumulator filled during the checkpoint job,
    so no extra Spark action is needed to read it. Partitions absent from
    the dict contributed zero rows and need no offset."""
    acc = 0
    rows = []
    for pid in sorted(totals):
        rows.append((int(pid), acc))
        acc += int(totals[pid])
    if not rows:
        rows = [(0, 0)]
    return spark.createDataFrame(rows, f"{_PID} int, __off long")


# ---------------------------------------------------------------------------
# local run grouping kernel


def _arrow_node_type(spark_t) -> pa.DataType:
    arrow_map = {
        T.LongType: pa.int64(), T.IntegerType: pa.int32(),
        T.ShortType: pa.int16(), T.ByteType: pa.int8(),
        T.StringType: pa.large_string(), T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(), T.BooleanType: pa.bool_(),
    }
    for k, v in arrow_map.items():
        if isinstance(spark_t, k):
            return v
    raise TypeError(f"unsupported node column type {spark_t}")


def _local_runs_fn(node_type: pa.DataType, totals_acc=None):
    out_schema = pa.schema(
        [
            pa.field(_PID, pa.int32()),
            pa.field("node_id", node_type),
            pa.field("__ls", pa.int64()),
            pa.field("__le", pa.int64()),
            pa.field("__last", pa.bool_()),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pid = None
        pos = 0  # rows consumed so far in this partition
        open_node = None  # value of the still-open run
        open_start = 0

        def emit(nodes, starts, ends, last_flags):
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(np.full(len(starts), pid, dtype=np.int32)),
                    pa.array(nodes, type=node_type),
                    pa.array(np.asarray(starts, dtype=np.int64)),
                    pa.array(np.asarray(ends, dtype=np.int64)),
                    pa.array(last_flags, type=pa.bool_()),
                ],
                schema=out_schema,
            )

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if pid is None:
                pid = batch.column(batch.schema.get_field_index(_PID))[0].as_py()
            vals = batch.column(0).to_numpy(zero_copy_only=False)
            change = np.empty(n, dtype=bool)
            change[0] = pos == 0 or vals[0] != open_node
            np.not_equal(vals[1:], vals[:-1], out=change[1:])
            bidx = np.flatnonzero(change)
            if bidx.size == 0:
                pos += n
                continue
            nodes_out, starts_out, ends_out = [], [], []
            if pos > 0:
                # close the run that was open coming into this batch
                nodes_out.append(open_node)
                starts_out.append(open_start)
                ends_out.append(pos + int(bidx[0]))
            # complete runs fully inside this batch
            if bidx.size > 1:
                nodes_out.extend(vals[bidx[:-1]].tolist())
                starts_out.extend((pos + bidx[:-1]).tolist())
                ends_out.extend((pos + bidx[1:]).tolist())
            # the run starting at the final boundary stays open
            open_node = vals[bidx[-1]]
            open_start = pos + int(bidx[-1])
            pos += n
            if nodes_out:
                yield emit(nodes_out, starts_out, ends_out, [False] * len(nodes_out))
        if pos > 0:
            yield emit([open_node], [open_start], [pos], [True])
        if totals_acc is not None and pos > 0:
            # side-channel the partition row count to the driver during the
            # checkpoint job itself — no follow-up collect pass needed
            totals_acc.add({int(pid): int(pos)})

    return fn


def _merge_boundary_fn(node_type: pa.DataType):
    """Chain-merge O(2·#parts) boundary runs: adjacent (end == next start)
    runs with equal node collapse; everything is sorted + vectorized."""
    out_schema = pa.schema(
        [
            pa.field("node_id", node_type),
            pa.field("range_start", pa.int64()),
            pa.field("range_end", pa.int64()),
        ]
    )

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        got = [b for b in batches if b.num_rows]
        if not got:
            return
        tbl = pa.Table.from_batches(got)
        nodes = tbl.column("node_id").to_numpy(zero_copy_only=False)
        starts = tbl.column("range_start").to_numpy(zero_copy_only=False)
        ends = tbl.column("range_end").to_numpy(zero_copy_only=False)
        order = np.argsort(starts, kind="stable")
        nodes, starts, ends = nodes[order], starts[order], ends[order]
        n = len(nodes)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (nodes[1:] != nodes[:-1]) | (starts[1:] != ends[:-1])
        heads = np.flatnonzero(new)
        g_end = np.maximum.reduceat(ends, heads)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(nodes[heads], type=node_type),
                pa.array(starts[heads].astype(np.int64)),
                pa.array(g_end.astype(np.int64)),
            ],
            schema=out_schema,
        )

    return fn


def edge_ranges(df: DataFrame, node_col: str, order_cols: list[str]) -> DataFrame:
    """Level-2 index: maximal runs of ``node_col`` over the row order.

    Returns (node_id, range_start, range_end) with 0-based, half-open row
    positions — exactly the reference's ``_groupNodeRanges`` output
    (index.cpp:114-137), but fully distributed: one range exchange, one
    vectorized local-runs pass (materialized via localCheckpoint, so it
    runs exactly once), an O(#parts) driver offset scan, and an
    O(2·#parts) boundary merge. Nulls in ``node_col`` are not supported
    (matches the reference's dense ids).

    Note: this builder runs Spark jobs eagerly (checkpoint + the tiny
    offsets read), mirroring the reference's two-phase count-then-build
    choreography (index.cpp:198-304).
    """
    spark = df.sparkSession
    spark_t = df.schema[node_col].dataType
    node_type = _arrow_node_type(spark_t)

    ranged = _ranged(
        df.select(F.col(node_col).alias("node_id"), *order_cols), order_cols
    )
    runs_ddl = (
        f"{_PID} int, node_id {spark_t.simpleString()}, "
        "__ls long, __le long, __last boolean"
    )
    # one shuffle + one sort + one kernel pass, materialized: every
    # consumer below reads the checkpoint instead of re-running the sort.
    # Per-partition row counts ride an accumulator out of this same job
    # (the kernel's closing position), so no second collect pass runs.
    totals = spark.sparkContext.accumulator({}, _PidTotalsParam())
    runs = ranged.mapInArrow(
        _local_runs_fn(node_type, totals), runs_ddl
    ).localCheckpoint()
    offs = _offsets_df(spark, totals.value)

    runs_g = runs.join(F.broadcast(offs), _PID).select(
        "node_id",
        (F.col("__ls") + F.col("__off")).alias("range_start"),
        (F.col("__le") + F.col("__off")).alias("range_end"),
        ((F.col("__ls") == 0) | F.col("__last")).alias("__bnd"),
    )
    interior = runs_g.filter(~F.col("__bnd")).drop("__bnd")
    # repartition(1), NOT coalesce(1): coalesce would narrow the whole
    # upstream stage to one task; repartition exchanges only the
    # O(2·#parts) boundary rows.
    merged = (
        runs_g.filter(F.col("__bnd"))
        .drop("__bnd")
        .repartition(1)
        .mapInArrow(
            _merge_boundary_fn(node_type),
            f"node_id {spark_t.simpleString()}, range_start long, range_end long",
        )
    )
    return interior.unionByName(merged)


# ---------------------------------------------------------------------------
# distributed exclusive prefix sum (the Allgather-offset choreography,
# index.cpp:272-303, at row scale)


def prefix_sum_exclusive(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str,
    assume_ranged: bool = False,
) -> DataFrame:
    """Append ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one in the total order of ``order_cols`` — without a
    global single-task window: range shuffle, per-partition vectorized
    cumsum (one pass, checkpointed; the partition totals ride an
    accumulator out of that same job), O(#parts) driver offset scan,
    broadcast join. The partition total is the kernel's actual running
    sum — not a max over a column — so negative values are handled
    correctly.

    ``assume_ranged=True`` skips the shuffle when the caller guarantees
    ``df`` is already range-partitioned by ``order_cols`` (partition i
    holds keys strictly below partition i+1); only the in-partition sort
    and pid tagging are applied."""
    spark = df.sparkSession
    if assume_ranged:
        ranged = df.sortWithinPartitions(*order_cols).withColumn(
            _PID, F.spark_partition_id()
        )
    else:
        ranged = _ranged(df, order_cols)
    in_fields = [(f.name, f.dataType.simpleString()) for f in ranged.schema.fields]
    value_idx = [n for n, _ in in_fields].index(value_col)
    pid_idx = [n for n, _ in in_fields].index(_PID)
    ddl = ", ".join(f"{n} {t}" for n, t in in_fields) + ", __loc long"
    totals = spark.sparkContext.accumulator({}, _PidTotalsParam())

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        running = 0
        pid = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if pid is None:
                pid = batch.column(pid_idx)[0].as_py()
            v = (
                batch.column(value_idx)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            loc = np.empty(len(v), dtype=np.int64)
            loc[0] = running
            np.cumsum(v[:-1], out=loc[1:])
            loc[1:] += running
            running += int(v.sum())
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(loc)],
                schema=batch.schema.append(pa.field("__loc", pa.int64())),
            )
        if pid is not None:
            totals.add({int(pid): running})

    local = ranged.mapInArrow(fn, ddl).localCheckpoint()
    offs = _offsets_df(spark, totals.value)
    return (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out_col, F.col("__loc") + F.col("__off"))
        .drop(_PID, "__loc", "__off")
    )


def csr_offsets(ranges: DataFrame) -> DataFrame:
    """Level-1 index: per node, [offset, offset+n_ranges) into the range
    list sorted by (node_id, range_start) — reference index.cpp:282-299.
    Distributed: one range shuffle by node_id feeds BOTH the per-node
    count (RangePartitioning satisfies the groupBy's clustering, so
    Catalyst adds no second exchange) and the exclusive prefix sum
    (assume_ranged skips its shuffle). No global window anywhere.

    The input is flattened first (localCheckpoint): the range shuffle's
    sampling pass and the prefix materialization would otherwise each
    re-execute the ranges plan — including edge_ranges' boundary-merge
    branch — once per consumer."""
    ranges = ranges.localCheckpoint()
    pre = ranges.repartitionByRange("node_id")
    per_node = pre.groupBy("node_id").agg(F.count(F.lit(1)).alias("n_ranges"))
    with_off = prefix_sum_exclusive(
        per_node, ["node_id"], "n_ranges", "offset_start", assume_ranged=True
    )
    return with_off.select(
        "node_id",
        "offset_start",
        (F.col("offset_start") + F.col("n_ranges")).alias("offset_end"),
    )


def build_index(
    df: DataFrame, node_col: str, order_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Both index levels for one direction; call twice for source/target
    like the reference does (index.cpp:309-324)."""
    ranges = edge_ranges(df, node_col, order_cols)
    return csr_offsets(ranges), ranges
