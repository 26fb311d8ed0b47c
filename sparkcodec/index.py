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


# order-column types whose Spark min/max structs compare identically to
# the Python tuple comparison the disjointness probe performs (floats are
# excluded: NaN ordering differs between the engines)
_PROBE_OK_TYPES = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.StringType, T.BooleanType, T.DateType, T.TimestampType,
)


def _aligned_rank_map(df: DataFrame, order_cols: list[str]):
    """If the existing partitions of ``df`` hold DISJOINT order-key ranges
    (a sorted table's scan does), return {partition_id: rank}; else None.

    One cheap probe job (per-partition min/max/null-count of the order
    tuple, O(#partitions) rows to the driver) decides whether the range
    exchange in :func:`_ranged` can be skipped outright: disjoint
    partitions + a local sort ARE a valid range partitioning, with rank
    = the partition's position in key order (guide: remove shuffles the
    data's existing layout already paid for). Conservative everywhere —
    floats, nulls in the keys, or any overlap fall back to the shuffle."""
    if not all(
        isinstance(df.schema[c].dataType, _PROBE_OK_TYPES) for c in order_cols
    ):
        return None
    # the exchange being skipped is also what SPREADS the work: keeping
    # the input partitioning is only a win when the input already has
    # enough partitions to occupy the cluster (a one-file, one-row-group
    # table scans as a single partition — there the shuffle IS the
    # parallelizer and the probe would be pure overhead)
    try:
        npart = df.rdd.getNumPartitions()
    except Exception:
        return None
    spark = df.sparkSession
    if npart < max(2, spark.sparkContext.defaultParallelism // 2):
        return None
    k = F.struct(*[F.col(c) for c in order_cols])
    nulls = sum(
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) for c in order_cols
    )
    try:
        rows = (
            df.select(*order_cols)
            .withColumn(_PID, F.spark_partition_id())
            .groupBy(_PID)
            .agg(F.min(k).alias("mn"), F.max(k).alias("mx"), nulls.alias("nn"))
            .collect()
        )
    except Exception:
        return None
    if not rows or any(r["nn"] for r in rows):
        return None
    spans = sorted((tuple(r["mn"]), tuple(r["mx"]), int(r[_PID])) for r in rows)
    for (_, prev_mx, _), (nxt_mn, _, _) in zip(spans, spans[1:]):
        if not prev_mx < nxt_mn:
            return None  # overlap (or boundary tie): ranks would be wrong
    return {pid: rank for rank, (_, _, pid) in enumerate(spans)}


def _ranged(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Range-shuffle + in-partition sort: total order, pid == global rank.

    When the input's partitions already hold disjoint key ranges (sorted
    source tables), the exchange is skipped: a local sort plus a
    broadcast pid->rank relabel reproduce the same invariant with zero
    shuffled bytes. Otherwise: no explicit partition count — AQE
    right-sizes the range shuffle (coalescing adjacent range partitions,
    which preserves the pid-is-rank invariant) so small inputs don't pay
    32 near-empty tasks and huge inputs still spread across the cluster."""
    rank_map = _aligned_rank_map(df, order_cols)
    if rank_map is not None:
        spark = df.sparkSession
        map_df = spark.createDataFrame(
            [(int(p), int(r)) for p, r in rank_map.items()],
            f"__pid_raw int, {_PID} int",
        )
        # sort LAST: a local sort sitting below the join is dead code to
        # Catalyst (EliminateSorts strips it); as the terminal operator
        # it survives, exactly like the shuffle path's trailing sort
        return (
            df.withColumn("__pid_raw", F.spark_partition_id())
            .join(F.broadcast(map_df), "__pid_raw")
            .drop("__pid_raw")
            .sortWithinPartitions(*order_cols)
        )
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
    # pandas + Arrow -> a JVM-local relation; a plain list would ride a
    # pickled RDD whose scan re-enters a Python worker at materialization
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=[_PID, "__off"])
    return spark.createDataFrame(pdf, f"{_PID} int, __off long")


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
        first_run = None  # (node, local_start, local_end) of run 0

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
                if first_run is None:
                    first_run = (
                        np.asarray(nodes_out[0]).item(),
                        int(starts_out[0]),
                        int(ends_out[0]),
                    )
                yield emit(nodes_out, starts_out, ends_out, [False] * len(nodes_out))
        if pos > 0:
            yield emit([open_node], [open_start], [pos], [True])
        if totals_acc is not None and pos > 0:
            last_run = (np.asarray(open_node).item(), int(open_start), int(pos))
            if first_run is None:
                first_run = last_run  # single-run partition
            # side-channel the partition row count AND its first/last run
            # to the driver during the checkpoint job itself — the
            # O(#parts) boundary chain-merge then happens on the driver
            # with no follow-up Spark stage
            totals_acc.add({int(pid): (int(pos), first_run, last_run)})

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
    # Per-partition row counts AND first/last runs ride an accumulator out
    # of this same job, so no second collect pass runs.
    totals = spark.sparkContext.accumulator({}, _PidTotalsParam())
    runs = ranged.mapInArrow(
        _local_runs_fn(node_type, totals), runs_ddl
    ).localCheckpoint()
    tv = totals.value  # {pid: (rows, first_run, last_run)}
    offs = _offsets_df(spark, {p: v[0] for p, v in tv.items()})

    runs_g = runs.join(F.broadcast(offs), _PID).select(
        "node_id",
        (F.col("__ls") + F.col("__off")).alias("range_start"),
        (F.col("__le") + F.col("__off")).alias("range_end"),
        ((F.col("__ls") == 0) | F.col("__last")).alias("__bnd"),
    )
    interior = runs_g.filter(~F.col("__bnd")).drop("__bnd")
    # the O(2·#parts) boundary runs are already on the driver (they rode
    # the accumulator); chain-merge them here and union the result in as
    # a literal DataFrame — no repartition(1) exchange, no extra Python
    # stage in the consumer job
    acc = 0
    brows = []
    for pid in sorted(tv):
        rows, first, last = tv[pid]
        spans = [first] if first == last else [first, last]
        for node, ls, le in spans:
            brows.append((node, acc + ls, acc + le))
        acc += rows
    merged_ddl = f"node_id {spark_t.simpleString()}, range_start long, range_end long"
    if brows:
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in brows], type=node_type),
                pa.array([r[1] for r in brows], type=pa.int64()),
                pa.array([r[2] for r in brows], type=pa.int64()),
            ],
            schema=pa.schema(
                [("node_id", node_type), ("range_start", pa.int64()),
                 ("range_end", pa.int64())]
            ),
        )
        merged_rows = [
            tuple(r.values())
            for b in _merge_boundary_fn(node_type)([batch])
            for r in b.to_pylist()
        ]
    else:
        merged_rows = []
    import pandas as pd

    merged = spark.createDataFrame(
        pd.DataFrame(merged_rows, columns=["node_id", "range_start", "range_end"]),
        merged_ddl,
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

    No re-materialization of the input: edge_ranges' output is a cheap
    filter over its own checkpointed runs unioned with a driver-literal
    boundary merge, so the range shuffle's sampling pass re-executing it
    costs one checkpoint read, not a kernel re-run (the extra
    localCheckpoint this used to do was an eager job per call)."""
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
