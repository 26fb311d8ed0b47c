"""`spark.read.format("sparkcodec")` — a PySpark Python DataSource over
the encoded blocks table, with filter pushdown driving the zone maps.

The reader surface (Spark 4.1 Python DataSource API):

* ``schema()`` comes from ``_table_meta.json`` (the table's authoritative
  schema, SURVEY §2 S6).
* ``pushFilters`` accepts simple comparison filters on prunable columns
  and folds them into [lo, hi] bounds per column. Zone-map pruning is
  *conservative* (a kept part/block may still hold non-matching rows), so
  every filter is returned to Spark for post-scan re-evaluation — the
  pushdown only reduces I/O, never correctness obligations.
* ``partitions()`` maps surviving parts (after part-level pruning across
  ALL bounded columns) onto a bounded number of input partitions.
* ``read()`` decodes with the same block-level row-range pruning the
  engine's ``decode_table`` uses, intersecting ranges across bounded
  columns, and yields Arrow RecordBatches.

Reading via ``decode_table`` (mapInArrow) and via this data source are
equivalent; this surface exists so plain ``spark.read`` users get
predicate pushdown from Catalyst filters with no engine-specific API.
Writes go through ``engine.encode_table`` (clustering + skew fanout need
a job-level exchange a per-task writer cannot express).
"""

from __future__ import annotations

import json
import os

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)


def _load_meta(path: str) -> dict:
    from .engine import _j, _read_json

    return _read_json(_j(path, "_table_meta.json"))


def _resolve_sid_option(options, out_dir: str) -> int | None:
    """snapshot_id / as_of options -> a concrete snapshot id (None =
    tip). ``as_of`` accepts unix seconds or an ISO-8601 timestamp and
    resolves through engine.snapshot_id_as_of, same as decode_table."""
    sid = int(options["snapshot_id"]) if options.get("snapshot_id") else None
    as_of = options.get("as_of")
    ref = options.get("ref")
    for label, v in (("as_of", as_of), ("ref", ref)):
        if v == "":
            # an empty option silently reading the TIP would defeat the
            # reproducibility these options exist for — fail loudly
            raise ValueError(f"empty {label} option; pass a value or omit it")
    if sum(1 for x in (sid, as_of, ref) if x is not None) > 1:
        raise ValueError("pass at most one of snapshot_id / as_of / ref, not both")
    if as_of:
        from .engine import snapshot_id_as_of

        sid = snapshot_id_as_of(out_dir, as_of)  # ISO-first string coercion
    if ref:
        from .engine import resolve_ref

        sid = resolve_ref(out_dir, ref)
    return sid


def _default_tasks() -> int:
    """Scan parallelism when no ``tasks`` option is given: 4 tasks per
    core of the ACTIVE session (planning runs driver-side, so the session
    is normally reachable); ``os.cpu_count`` only as the last resort —
    a driver-core count is a poor proxy for cluster parallelism."""
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            return 4 * s.sparkContext.defaultParallelism
    except Exception:
        pass
    return 4 * (os.cpu_count() or 8)


from .engine import _intersect_ranges  # shared with decode_table's multi-predicate path


class SparkcodecReader(DataSourceReader):
    def __init__(self, options, schema):
        self.out_dir = options.get("path")
        if not self.out_dir:
            raise ValueError("sparkcodec reader requires .load(<blocks dir>)")
        self.snapshot_id = _resolve_sid_option(options, self.out_dir)
        self.n_tasks = int(options.get("tasks", 0)) or None
        self.columns = [f.name for f in schema.fields]
        self.bounds: dict[str, list] = {}  # col -> [lo, hi] (None = open)
        self.nulls: dict[str, set] = {}  # col -> {"isnull" | "notnull"}
        self.eqs: dict[str, list] = {}  # col -> probe values (=, IN)

    def pushFilters(self, filters):
        # add_column initial defaults: pre-add parts carry no stats or
        # block files for the column yet their rows READ as the default,
        # so pruning structures would misjudge them — never record
        # pushdown predicates on defaulted columns (Spark re-evaluates
        # every filter after this reader regardless)
        try:
            defaulted = set((_load_meta(self.out_dir).get("defaults") or {}))
        except Exception:
            defaulted = set()
        for f in filters:
            col = ".".join(f.attribute) if hasattr(f, "attribute") else None
            if col is None or col in defaulted:
                continue
            val = getattr(f, "value", None)
            if isinstance(f, IsNotNull):
                self.nulls.setdefault(col, set()).add("notnull")
            elif isinstance(f, IsNull):
                self.nulls.setdefault(col, set()).add("isnull")
            elif isinstance(f, In):
                vs = [v for v in getattr(f, "values", ()) if v is not None]
                if vs and all(isinstance(v, type(vs[0])) for v in vs):
                    self._narrow(col, min(vs), max(vs))
                    self.eqs.setdefault(col, []).extend(vs)
            elif val is None:
                pass
            elif isinstance(f, EqualTo):
                self._narrow(col, val, val)
                self.eqs.setdefault(col, []).append(val)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._narrow(col, val, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._narrow(col, None, val)
            elif isinstance(f, StringStartsWith) and isinstance(val, str) and val:
                # every string with this prefix sorts in
                # [prefix, prefix-with-last-char-incremented)
                hi = None
                if ord(val[-1]) < 0x10FFFF:
                    hi = val[:-1] + chr(ord(val[-1]) + 1)
                self._narrow(col, val, hi)
        # zone maps are conservative: Spark must re-evaluate every filter
        return filters

    def _narrow(self, col, lo, hi):
        cur = self.bounds.setdefault(col, [None, None])
        if lo is not None and (cur[0] is None or lo > cur[0]):
            cur[0] = lo
        if hi is not None and (cur[1] is None or hi < cur[1]):
            cur[1] = hi

    def partitions(self):
        from .engine import (
            completed_parts,
            part_meta,
            part_null_stats,
            part_stats,
            part_vsets,
            prune_parts,
            prune_parts_bloom,
            prune_parts_eq,
            prune_parts_nulls,
            snapshot_parts,
        )

        parts = snapshot_parts(self.out_dir, self.snapshot_id)
        if parts is None:
            parts = sorted(completed_parts(self.out_dir))
        # field-id resolution (ghosts for dropped-and-re-added names,
        # aliases for renamed columns): computed on the driver and
        # shipped INSIDE the partition values — the reader object is
        # serialized before partitions() runs, so a mutated self
        # attribute would never reach the executors. Tasks decode
        # ghosted columns as NULL and renamed columns from their storage
        # names, same rule as engine.decode_table. Computed BEFORE any
        # stat pruning: a ghost part's recorded stats describe the DEAD
        # field, and null pruning must not judge the tip's all-NULL
        # column by them.
        remap: dict = {}
        from .engine import _column_remap, _needs_remap, snapshot_field_ids, snapshots

        snaps = snapshots(self.out_dir)
        if _needs_remap(snaps):
            sid = self.snapshot_id
            if sid is None and snaps:
                from .engine import _tip_entry

                sid = _tip_entry(snaps)["id"]
            if sid is not None:
                remap = _column_remap(
                    self.out_dir, self.columns, parts,
                    snapshot_field_ids(self.out_dir, sid, snaps=snaps),
                    snaps=snaps,
                )
        # parts where a column is GHOSTED decode it as all-NULL whatever
        # its dead stats say: they must bypass null pruning on that
        # column (an 'IS NULL' probe matches EVERY row of such a part,
        # yet the dead field's zero-null accounting would drop it).
        # Range/eq/IN pruning may still use the dead stats: those
        # predicates never match NULL, so any drop they make is sound,
        # and a keep is merely conservative (Spark re-evaluates filters).
        # Aliased parts carry their stats under the storage name, so a
        # lookup by the requested name misses and stays conservative.
        ghost_parts: dict[str, set] = {}
        for p, (gh, _al) in remap.items():
            for c in gh:
                ghost_parts.setdefault(c, set()).add(int(p))
        if self.bounds or self.eqs or self.nulls:
            # ONE manifest-backed metadata read for all pruning dimensions
            # (O(#snapshots) files, not O(#parts) checkpoint opens)
            pm = part_meta(self.out_dir, parts=parts)
            for col, (lo, hi) in self.bounds.items():
                parts = prune_parts(
                    self.out_dir, (col, lo, hi), parts, stats=part_stats(self.out_dir, pm)
                )
            for col, values in self.eqs.items():
                parts = prune_parts_eq(
                    self.out_dir, col, values, parts, part_vsets(self.out_dir, pm)
                )
                parts = prune_parts_bloom(
                    self.out_dir, col, values, parts,
                    {p: d["bloom"] for p, d in pm.items()},
                )
            for col, kinds in self.nulls.items():
                protected = ghost_parts.get(col, set())
                prunable = [p for p in parts if int(p) not in protected]
                kept_ghosts = [p for p in parts if int(p) in protected]
                for kind in kinds:
                    prunable = prune_parts_nulls(
                        self.out_dir, col, kind, prunable,
                        part_null_stats(self.out_dir, pm),
                    )
                parts = sorted(set(prunable) | set(kept_ghosts))
        if not parts:
            return [InputPartition([])]

        def val(p):
            gh, al = remap.get(int(p), (frozenset(), {}))
            return (int(p), tuple(sorted(gh)), tuple(sorted(al.items())))

        vals = [val(p) for p in parts]
        n_tasks = self.n_tasks or min(len(parts), _default_tasks())
        size = -(-len(parts) // n_tasks)
        return [InputPartition(vals[i : i + size]) for i in range(0, len(vals), size)]

    def read(self, partition):
        import pyarrow as pa

        from .engine import (
            _DECODE_ARROW_OF,
            _decode_column_ranges,
            _decode_part_batches,
            _keep_row_ranges,
            _keep_row_ranges_nulls,
        )

        meta = _load_meta(self.out_dir)
        arrow_schema = pa.schema(
            [(c, _DECODE_ARROW_OF[meta["schema"][c]]) for c in self.columns]
        )
        fill = {
            c: v for c, v in (meta.get("defaults") or {}).items()
            if c in self.columns
        } or None
        for pid, gh_cols, al_items in partition.value:
            gh = frozenset(gh_cols)
            al = dict(al_items)
            ranges = None
            pruned = False
            # a GHOST column is all-NULL at this snapshot, so its stored
            # (dead) block stats must not drive pruning: a range or
            # NOT NULL predicate matches nothing (drop the part), and
            # IS NULL matches everything (skip pruning on it)
            if any(c in gh for c in self.bounds) or any(
                c in gh and "notnull" in ks for c, ks in self.nulls.items()
            ):
                continue
            for col, (lo, hi) in self.bounds.items():
                r = _keep_row_ranges(
                    self.out_dir, pid, (al.get(col, col), lo, hi)
                )
                if r is not None:
                    pruned = True
                    ranges = r if ranges is None else _intersect_ranges(ranges, r)
            for col, kinds in self.nulls.items():
                for kind in kinds:
                    if col in gh:
                        continue  # isnull on a ghost: keeps every row
                    r = _keep_row_ranges_nulls(
                        self.out_dir, pid, al.get(col, col), kind
                    )
                    if r is not None:
                        pruned = True
                        ranges = r if ranges is None else _intersect_ranges(ranges, r)
            if pruned and not ranges:
                continue
            if not pruned:
                yield from _decode_part_batches(
                    self.out_dir, self.columns, arrow_schema, pid, gh, al,
                    fill,
                )
                continue
            n_kept = sum(e - s for s, e in ranges)
            def _absent(col):
                t = arrow_schema.field(col).type
                dv = (fill or {}).get(col)
                arr = (
                    pa.nulls(n_kept, type=t) if dv is None
                    else pa.array([dv] * n_kept, type=t)
                )
                return pa.chunked_array([arr], type=t)

            from .engine import _exists as _ex, _part_file as _pf

            per_col = {
                col: (
                    _absent(col)
                    if col in gh
                    or not _ex(_pf(self.out_dir, al.get(col, col), pid))
                    else _decode_column_ranges(
                        self.out_dir, al.get(col, col), pid,
                        arrow_schema.field(col).type, ranges,
                    )
                )
                for col in self.columns
            }
            tbl = pa.Table.from_arrays([per_col[c] for c in self.columns], schema=arrow_schema)
            yield from tbl.to_batches(max_chunksize=65536)


class SparkcodecStreamReader(DataSourceStreamReader):
    """Snapshot changefeed: each micro-batch delivers exactly the parts
    committed by snapshots in (start, end] — the streaming twin of
    ``encode_stream``'s one-snapshot-per-batch ingestion. Offsets are
    snapshot ids, so Spark's streaming checkpoint gives replayable,
    never-torn batches (a snapshot commits atomically after every part
    of its run is durable)."""

    def __init__(self, options, schema):
        self.out_dir = options.get("path")
        if not self.out_dir:
            raise ValueError("sparkcodec stream reader requires .load(<blocks dir>)")
        self.columns = [f.name for f in schema.fields]
        # predicate pushdown for changefeed consumers: the streaming API
        # has no pushFilters hook, so predicates ride an option as JSON —
        # .option("where", '[["doc_id",100,200],["lang",["de","fr"]]]')
        # (a CONJUNCTION in decode_table's where forms). Pruning is
        # conservative (zone maps), so compose with .filter for exactness.
        self.wheres = None
        self.wheres_any = None
        w = options.get("where")
        if w:
            self.wheres = self._parse_where(w)
        wa = options.get("where_any")
        if wa:
            # DNF disjunction, same semantics as decode_table(where_any=):
            # JSON list of DISJUNCTS, each a predicate or conjunction —
            # '[[["lang",["de"]]], [["doc_id",0,99]]]' = lang IN ('de')
            # OR doc_id BETWEEN 0 AND 99. An empty disjunct normalizes
            # to [] (always-true: prunes nothing), never None — read()'s
            # range walk iterates each disjunct.
            self.wheres_any = [
                self._parse_where(d) or [] for d in json.loads(wa)
            ]

    @staticmethod
    def _parse_where(spec):
        """JSON -> normalized conjunction through the engine's validator,
        so a scalar where a value LIST is required raises here instead of
        silently pruning wrong (["lang","de"] must not become the chars
        'd','e'). Accepts a pre-parsed list (where_any disjuncts) or a
        JSON string."""
        from .engine import _normalize_where

        if isinstance(spec, str):
            spec = json.loads(spec)
        if spec and isinstance(spec[0], str):
            spec = [spec]  # single bare predicate -> conjunction of one
        return _normalize_where([tuple(p) for p in spec]) or None

    def initialOffset(self):
        return {"snapshot": 0}

    def latestOffset(self):
        from .engine import snapshots

        snaps = snapshots(self.out_dir)
        return {"snapshot": snaps[-1]["id"] if snaps else 0}

    def partitions(self, start, end):
        from .engine import snapshots

        lo, hi = start["snapshot"], end["snapshot"]
        parts = [
            int(p)
            for s in snapshots(self.out_dir)
            # compaction/delete/rollback snapshots rearrange existing rows
            # — replaying their parts would duplicate data already
            # delivered (the changefeed is append-only). Merge entries
            # record which parts carry genuinely new rows under
            # append_parts: deliver those, skip the rewrites.
            if lo < s["id"] <= hi
            and not s.get("compaction")
            and not s.get("delete")
            and not s.get("rollback_of")
            # materialized tagged roots overlap the retained root's rows
            and not s.get("tag_only")
            # branch commits are off-main; their net new rows arrive
            # once, via the fast-forward entry's append_parts
            and not s.get("branch")
            for p in (
                s["append_parts"] if s.get("append_parts") is not None
                else s["new_parts"]
            )
        ]
        if parts and (self.wheres or self.wheres_any):
            # part-level pruning through every dimension (zone maps +
            # value sets + blooms) before any task is scheduled; DNF
            # disjuncts prune independently and their survivors union
            from .engine import _prune_parts_conj, part_meta

            pm = part_meta(self.out_dir, parts=parts)
            if self.wheres:
                parts = _prune_parts_conj(self.out_dir, self.wheres, parts, pm)
            if self.wheres_any:
                keep: set = set()
                for conj in self.wheres_any:
                    keep |= set(
                        _prune_parts_conj(self.out_dir, conj or [], parts, pm)
                    )
                parts = sorted(keep)
        if not parts:
            return [InputPartition([])]
        # field-id resolution shipped inside the values (same reason as
        # the batch reader: the reader serializes before partitions())
        from .engine import (
            _column_remap,
            _needs_remap,
            _tip_entry,
            snapshot_field_ids,
            snapshots,
        )

        snaps = snapshots(self.out_dir)
        remap: dict = {}
        if _needs_remap(snaps) and snaps:
            remap = _column_remap(
                self.out_dir, self.columns, parts,
                snapshot_field_ids(
                    self.out_dir, _tip_entry(snaps)["id"], snaps=snaps
                ),
                snaps=snaps,
            )

        def val(p):
            gh, al = remap.get(int(p), (frozenset(), {}))
            return (int(p), tuple(sorted(gh)), tuple(sorted(al.items())))

        vals = [val(p) for p in parts]
        n_tasks = min(len(vals), _default_tasks())
        size = -(-len(vals) // n_tasks)
        return [InputPartition(vals[i : i + size]) for i in range(0, len(vals), size)]

    def read(self, partition):
        import pyarrow as pa

        from .engine import (
            _DECODE_ARROW_OF,
            _decode_part_batches_ranged,
            _keep_row_ranges_dnf,
        )

        meta = _load_meta(self.out_dir)
        arrow_schema = pa.schema(
            [(c, _DECODE_ARROW_OF[meta["schema"][c]]) for c in self.columns]
        )
        fill = {
            c: v for c, v in (meta.get("defaults") or {}).items()
            if c in self.columns
        } or None
        for pid, gh_cols, al_items in partition.value:
            gh, al = frozenset(gh_cols), dict(al_items)
            ranges = (
                _keep_row_ranges_dnf(
                    self.out_dir, pid, self.wheres or [], self.wheres_any, al
                )
                if (self.wheres or self.wheres_any)
                else None
            )
            yield from _decode_part_batches_ranged(
                self.out_dir, self.columns, arrow_schema, pid, ranges, gh, al
            )

    def commit(self, end):
        pass  # snapshot log is append-only; nothing to clean up


class SparkcodecCDCStreamReader(DataSourceStreamReader):
    """Changefeed in CDC mode (``.option("cdc", "true").option("key",
    <col>)``): instead of replaying appended ROWS, each micro-batch
    delivers change EVENTS ``(key, _op, _snapshot_id, _n)`` for the
    snapshots in (start, end] — including the delete events the
    append-only feed cannot express (takedown / right-to-erasure
    propagation). Deletes are the exact per-key multiset diff of a
    snapshot's removed parts against its rewrite survivors
    (engine._cdc_plan, same semantics as the batch
    ``engine.table_changes``); a merged key shows as delete(preimage) +
    insert(new row). Each task diffs ONE snapshot's changed parts,
    decoding only the key column — memory is bounded by that snapshot's
    distinct changed keys; for bulk historical diffs use the batch API,
    which aggregates via a full shuffle instead."""

    def __init__(self, options, schema):
        self.out_dir = options.get("path")
        if not self.out_dir:
            raise ValueError("sparkcodec stream reader requires .load(<blocks dir>)")
        self.key_col = options.get("key")
        if not self.key_col:
            raise ValueError('cdc mode requires .option("key", "<column>")')

    def initialOffset(self):
        return {"snapshot": 0}

    def latestOffset(self):
        from .engine import snapshots

        snaps = snapshots(self.out_dir)
        return {"snapshot": snaps[-1]["id"] if snaps else 0}

    def partitions(self, start, end):
        from .engine import (
            _cdc_plan,
            _column_remap,
            _needs_remap,
            _tip_entry,
            snapshot_field_ids,
            snapshots,
        )

        snaps = snapshots(self.out_dir)
        plan = _cdc_plan(snaps, start["snapshot"], end["snapshot"])
        # field-id resolution for the key column rides each plan row
        remap: dict = {}
        if plan and _needs_remap(snaps):
            remap = _column_remap(
                self.out_dir, [self.key_col], sorted({p[1] for p in plan}),
                snapshot_field_ids(
                    self.out_dir, _tip_entry(snaps)["id"], snaps=snaps
                ),
                snaps=snaps,
            )
        by_sid: dict[int, list] = {}
        for sid, pid, w, ch in plan:
            gh, al = remap.get(int(pid), (frozenset(), {}))
            by_sid.setdefault(sid, []).append(
                (sid, pid, w, ch, tuple(sorted(gh)), tuple(sorted(al.items())))
            )
        if not by_sid:
            return [InputPartition([])]
        return [InputPartition(rows) for _sid, rows in sorted(by_sid.items())]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from .engine import _DECODE_ARROW_OF, _part_key_counts

        if not partition.value:
            return
        meta = _load_meta(self.out_dir)
        key_arrow = _DECODE_ARROW_OF[meta["schema"][self.key_col]]
        key_schema = pa.schema([(self.key_col, key_arrow)])
        out_schema = pa.schema([
            (self.key_col, key_arrow), ("_op", pa.string()),
            ("_snapshot_id", pa.int64()), ("_n", pa.int64()),
        ])
        sid = partition.value[0][0]
        # per-part vectorized value_counts, then one Arrow group-by sum
        # per channel — no per-row Python anywhere on the key path
        per_ch: dict[str, list] = {"insert": [], "delete": []}
        for _sid, pid, w, ch, gh_cols, al_items in partition.value:
            res = _part_key_counts(
                self.out_dir, self.key_col, key_schema, pid,
                frozenset(gh_cols), dict(al_items),
            )
            if res is None:
                continue
            values, counts = res
            per_ch[ch].append(pa.table({
                "k": values,
                "n": pc.multiply(counts, pa.scalar(w, pa.int64())),
            }))
        for ch, op in (("insert", "insert"), ("delete", "delete")):
            if not per_ch[ch]:
                continue
            agg = (
                pa.concat_tables(per_ch[ch])
                .group_by("k")
                .aggregate([("n", "sum")])
            )
            keys, n = agg.column("k"), agg.column("n_sum")
            if ch == "delete":
                # multiset diff: only keys with net-positive removal count
                mask = pc.greater(n, 0)
                keys, n = keys.filter(mask), n.filter(mask)
            m = len(keys)
            if m == 0:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    keys.combine_chunks(),
                    pc.fill_null(pa.nulls(m, pa.string()), op),
                    pa.array(np.full(m, sid, dtype=np.int64)),
                    n.combine_chunks(),
                ],
                schema=out_schema,
            )

    def commit(self, end):
        pass  # snapshot log is append-only; nothing to clean up


@dataclass
class _PartCommit(WriterCommitMessage):
    part_id: int
    n_rows: int
    raw_bytes: int
    enc_bytes: int


class SparkcodecWriter(DataSourceArrowWriter):
    """``df.write.format("sparkcodec").mode("append")`` — the plain-Spark
    write path for *pre-grouped* data: each task encodes its input
    partition as one part (the engine's aligned layout, no exchange),
    and the driver commits one snapshot only after every task's parts
    are durable. Clustering/salting/skew-fanout need a job-level
    exchange a per-task writer cannot express — use
    ``engine.encode_table`` for those. Single writer at a time (part
    ids are assigned from a driver-side base)."""

    def __init__(self, options, schema, overwrite):
        if overwrite:
            raise ValueError(
                "sparkcodec supports mode('append'); for a fresh table use "
                "encode_table(resume=False) or a new path"
            )
        self.out_dir = options.get("path")
        if not self.out_dir:
            raise ValueError("sparkcodec writer requires .save(<blocks dir>)")
        self.block_rows = int(options.get("block_rows", 65536))
        self.block_bytes = int(options.get("block_bytes", 32 << 20))
        from pyspark.sql.pandas.types import to_arrow_schema

        from .codecs import type_name
        from .engine import _acquire_writer_lock, _exists, _j, completed_parts

        arrow = to_arrow_schema(schema)
        self.columns = [f.name for f in arrow]
        self.type_names = {f.name: type_name(f.type) for f in arrow}
        # field-id identity: tasks stamp each part's {col: id} into its
        # checkpoint lineage, so the mapping must be resolved up front —
        # inherited from the table for existing columns, and (for an
        # evolving write) pre-merged through the same engine helper
        # commit() will apply, which is pure and deterministic
        self.field_ids = {c: i + 1 for i, c in enumerate(self.columns)}
        if _exists(_j(self.out_dir, "_table_meta.json")):
            prev = _load_meta(self.out_dir)
            if prev["schema"] != self.type_names:
                # add-column evolution, same rule as encode_table (shared
                # engine helper); commit() merges the meta
                from .engine import check_schema_evolution, merge_evolved_meta

                check_schema_evolution(prev, self.type_names, self.columns)
                self.field_ids = merge_evolved_meta(
                    prev, self.type_names, self.columns
                )["field_ids"]
            else:
                from .engine import _field_ids_of

                self.field_ids = _field_ids_of(prev)[0]
        # single-writer lease held from planning (driver-side __init__)
        # through commit()/abort(); part ids are assigned from a
        # driver-side base, so a concurrent writer would collide
        self._lock_owner = _acquire_writer_lock(self.out_dir, "ds-write")
        existing = completed_parts(self.out_dir)
        self.base = (max(existing) + 1) if existing else 0

    def write(self, iterator):
        from pyspark import TaskContext

        from .engine import _encode_one_part

        batches = [b for b in iterator if b.num_rows]
        pid = self.base + TaskContext.get().partitionId()
        if not batches:
            return _PartCommit(-1, 0, 0, 0)
        r = _encode_one_part(
            pid, batches, self.columns, self.out_dir,
            self.block_rows, self.block_bytes, set(), {},
            field_ids=self.field_ids,
        )
        return _PartCommit(pid, r["n_rows"], r["raw_bytes"], r["enc_bytes"])

    def commit(self, messages):
        import time

        from .engine import (
            _atomic_write_json,
            _exists,
            _j,
            _release_writer_lock,
            _snapshot_log_append,
            snapshots,
        )

        try:
            parts = sorted(m.part_id for m in messages if m and m.part_id >= 0)
            meta_path = _j(self.out_dir, "_table_meta.json")
            if _exists(meta_path):
                prev = _load_meta(self.out_dir)
                if prev["schema"] != self.type_names:
                    # add-column evolution validated in __init__: merge meta
                    # through the shared engine helper so readers see the
                    # union (old parts decode the new columns as nulls) and
                    # existing field metadata survives
                    from .engine import merge_evolved_meta

                    _atomic_write_json(
                        meta_path,
                        merge_evolved_meta(prev, self.type_names, self.columns),
                    )
            if not _exists(meta_path):
                meta = {
                    "schema": self.type_names,
                    "columns": self.columns,
                    "num_parts": -1,
                    "layout": "aligned",
                    "cluster_by": None,
                    "salt_by": None,
                    "sort_by": [],
                    "block_rows": self.block_rows,
                    "target_part_rows": None,
                    "field_metadata": {},
                    "field_ids": self.field_ids,
                    "next_field_id": max(self.field_ids.values(), default=0) + 1,
                    "engine_version": "0.1.0",
                }
                _atomic_write_json(meta_path, meta)
            snaps = snapshots(self.out_dir)
            if not snaps:
                # pre-snapshot table (parts exist but no log): this entry
                # becomes the root snapshot (shared engine rule)
                from .engine import legacy_root_parts

                parts = legacy_root_parts(self.out_dir, parts, self.base)
            cur = _load_meta(self.out_dir)
            from .engine import write_manifest

            from .engine import _tip_entry

            entry = {
                # ids are log-sequence; the parent is the MAIN tip (a
                # trailing branch commit is a bystander to this sink)
                "id": (snaps[-1]["id"] + 1) if snaps else 1,
                "parent": _tip_entry(snaps)["id"] if snaps else 0,
                "new_parts": parts,
                # pruning manifest (O(#snapshots) metadata reads for
                # every future pruned read); O(this commit's parts)
                # checkpoint reads here, amortized like the engine path
                "manifest": write_manifest(self.out_dir, parts),
                "n_rows": sum(m.n_rows for m in messages if m),
                "enc_bytes": sum(m.enc_bytes for m in messages if m),
                "layout": "aligned",
                # schema versioned per snapshot (time travel reads the
                # schema in effect at commit time, engine.snapshot_schema)
                "columns": cur["columns"],
                "schema": cur["schema"],
                "field_ids": self.field_ids,
                "ts": time.time(),
            }
            _snapshot_log_append(self.out_dir, entry)
        finally:
            _release_writer_lock(self.out_dir, self._lock_owner)

    def abort(self, messages):
        # written parts are invisible without a snapshot commit (readers
        # resolve the snapshot log); leave them for a later resume/retry
        from .engine import _release_writer_lock

        _release_writer_lock(self.out_dir, self._lock_owner)


class SparkcodecDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(SparkcodecDataSource)`` then
    ``spark.read.format("sparkcodec").load(out_dir)`` for batch,
    ``spark.readStream.format("sparkcodec").load(out_dir)`` to tail
    committed snapshots, or ``df.write.format("sparkcodec")
    .mode("append").save(out_dir)`` for exchange-free appends.
    Reading requires ``spark.sql.python.filterPushdown.enabled=true``
    (on by default in ``sparkcodec.session.get_spark``) because the
    reader implements filter pushdown.

    Column pruning: the Python DataSource API pushes filters but not
    projections, so a bare ``.load(dir).select("lang")`` still decodes
    every column. Pass ``.option("columns", "lang,doc_id")`` to restrict
    the scan — only the named columns' block files are opened (file-level
    pruning, same as ``decode_table(columns=...)``). The option applies
    to BOTH the batch reader and the streaming changefeed (the restricted
    schema flows into the stream reader's decode).

    Time travel: ``.option("snapshot_id", 3)`` by id, or
    ``.option("as_of", "2026-08-17T12:00:00")`` (ISO-8601 or unix
    seconds) for the latest snapshot committed at or before that time.

    Changefeed predicates: the streaming API has no pushFilters hook,
    so ``spark.readStream`` accepts ``.option("where",
    '[["doc_id",100,200],["lang",["de"]]]')`` — a JSON conjunction in
    ``decode_table``'s where forms — and ``.option("where_any",
    '[[["lang",["de"]]],[["doc_id",0,99]]]')``, a DNF disjunction of
    such conjunctions (matching ``decode_table(where_any=...)``: each
    disjunct prunes independently, survivors union, and the result
    intersects ``where``). Parts and blocks outside every predicate are
    never decoded (zone maps + value sets + blooms); pruning is
    conservative, so compose with ``.filter`` for exactness.

    CDC: ``spark.readStream ... .option("cdc", "true").option("key",
    "doc_id")`` switches the changefeed from replaying appended rows to
    delivering change EVENTS ``(key, _op, _snapshot_id, _n)`` including
    DELETE events (see :class:`SparkcodecCDCStreamReader`); the batch
    twin is ``engine.table_changes``.
    """

    @classmethod
    def name(cls):
        return "sparkcodec"

    def schema(self):
        from .engine import _SPARK_TYPE_OF, _resolve_snapshot_meta

        if (self.options.get("cdc") or "").lower() == "true":
            # CDC change-event schema: key + op/snapshot/count metadata
            key = self.options.get("key")
            if not key:
                raise ValueError('cdc mode requires .option("key", "<column>")')
            meta = _load_meta(self.options.get("path"))
            if key not in meta["schema"]:
                raise ValueError(
                    f"cdc key {key!r} not in table columns {meta['columns']}"
                )
            return (
                f"`{key}` {_SPARK_TYPE_OF[meta['schema'][key]]}, "
                f"`_op` string, `_snapshot_id` long, `_n` long"
            )
        # Spark may call schema() repeatedly while planning one read:
        # compute the snapshot-schema overlay (one log read) once per
        # DataSource instance
        cached = getattr(self, "_schema_cache", None)
        if cached is not None:
            meta, cols = cached
        else:
            path = self.options.get("path")
            meta = _load_meta(path)
            # schema as recorded at the resolved snapshot (explicit
            # snapshot_id option, else the tip): matches decode_table — a
            # rollback across an add-column evolution narrows the DS read
            # schema back too
            sid = _resolve_sid_option(self.options, path)
            meta, _sid, _snaps = _resolve_snapshot_meta(path, meta, sid)
            cols = meta["columns"]
            self._schema_cache = (meta, cols)
        sel = self.options.get("columns")
        if sel:
            want = [c.strip() for c in sel.split(",") if c.strip()]
            unknown = sorted(set(want) - set(cols))
            if unknown:
                raise ValueError(
                    f"columns option names unknown columns {unknown}; "
                    f"table has {cols}"
                )
            cols = [c for c in cols if c in want]  # keep table order
        return ", ".join(f"`{c}` {_SPARK_TYPE_OF[meta['schema'][c]]}" for c in cols)

    def reader(self, schema):
        return SparkcodecReader(self.options, schema)

    def streamReader(self, schema):
        if (self.options.get("cdc") or "").lower() == "true":
            return SparkcodecCDCStreamReader(self.options, schema)
        return SparkcodecStreamReader(self.options, schema)

    def writer(self, schema, overwrite):
        return SparkcodecWriter(self.options, schema, overwrite)
