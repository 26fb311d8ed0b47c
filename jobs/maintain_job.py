#!/usr/bin/env python
"""spark-submit entry point: table maintenance (compaction + expiry).

    spark-submit --py-files sparkcodec.zip jobs/maintain_job.py \
        --table /mnt/shared/enc [--compact] [--target-part-rows 262144] \
        [--expire-keep-last 3] [--delete col:lo:hi] [--rollback N] \
        [--optimize-zorder c1,c2 | --optimize-sort c1,c2] \
        [--tag NAME[:SID]] [--delete-tag NAME] [--tags] \
        [--create-branch NAME[:SID]] [--rebase NAME] [--fast-forward NAME] \
        [--delete-branch NAME] [--branches] \
        [--stats] [--history]

--delete removes rows with lo <= col <= hi as a copy-on-write snapshot
(zone maps bound the rewrite to overlapping parts; omit lo or hi for a
half-open range). Numeric-looking bounds parse as numbers; quote a bound
('100') to force a string comparison on string columns — quoted bounds
may contain colons (ts:'12:00':'13:00'). The separate
--delete-col/--delete-lo/--delete-hi flags avoid quoting entirely.
--compact merges small live parts into bigger ones as a new snapshot
(earlier snapshots stay time-travelable); --optimize-zorder /
--optimize-sort rewrites the WHOLE live set re-clustered in one atomic
snapshot (run after a stretch of appends so every row shares one
z-space); --vacuum reclaims crashed-run orphan parts without touching
retention; --expire-keep-last N deletes
part files referenced by no retained snapshot and squashes the log.
Run compaction on a schedule after streaming ingestion
(`encode_stream` commits one small snapshot per micro-batch) to keep
per-part fixed costs amortized — see BENCH.md for the measured
small-part overhead. Prints one JSON line with both reports.
"""

from __future__ import annotations

import argparse
import json
import sys


def _coerce_bound(v: str | None):
    """Bound literal -> engine value: empty = open bound, quoted = forced
    string (quotes stripped), numeric-looking = int/float, else string."""
    if not v:
        return None
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]  # quoted: force string bound
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def parse_delete_spec(spec: str) -> tuple:
    """Parse ``col:lo:hi`` into a delete predicate, splitting on ':' only
    OUTSIDE quotes so a quoted bound containing a colon (the documented
    string-forcing syntax, e.g. ``ts:'12:00':'13:00'``) stays one token."""
    toks: list[str] = []
    cur: list[str] = []
    q: str | None = None
    for ch in spec:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"":
            cur.append(ch)
            q = ch
        elif ch == ":":
            toks.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    toks.append("".join(cur))
    if len(toks) != 3:
        raise ValueError(f"--delete expects col:lo:hi, got {spec!r}")
    return toks[0], _coerce_bound(toks[1]), _coerce_bound(toks[2])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="encoded blocks dir")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--target-part-rows", type=int, default=262_144)
    ap.add_argument("--expire-keep-last", type=int, default=None)
    ap.add_argument(
        "--rollback", type=int, default=None,
        help="restore this snapshot id as a new forward-moving commit",
    )
    ap.add_argument(
        "--stats", action="store_true",
        help="print exact per-column min/max/nulls/rows from metadata only",
    )
    ap.add_argument(
        "--history", action="store_true",
        help="print the snapshot log (id, parent, parts, rows, flags)",
    )
    ap.add_argument(
        "--tag", default=None, metavar="NAME[:SID]",
        help="pin a named tag to a snapshot (default the tip); tagged "
             "snapshots survive --expire-keep-last until untagged; "
             "refuses an existing name unless --tag-force",
    )
    ap.add_argument(
        "--tag-force", action="store_true",
        help="move an existing tag (the old pin becomes expirable)",
    )
    ap.add_argument("--delete-tag", default=None, metavar="NAME")
    ap.add_argument(
        "--vacuum", action="store_true",
        help="delete part files no snapshot ever referenced (crashed-run "
             "orphans) without touching retention or time travel",
    )
    ap.add_argument(
        "--vacuum-include-pending", action="store_true",
        help="vacuum: also reclaim a crashed append's resumable parts",
    )
    ap.add_argument("--tags", action="store_true", help="print all tags")
    ap.add_argument(
        "--create-branch", default=None, metavar="NAME[:SID]",
        help="create a WRITABLE branch ref at a snapshot (default the "
             "tip); branch commits are invisible to main until "
             "--fast-forward folds them back as one atomic snapshot",
    )
    ap.add_argument("--delete-branch", default=None, metavar="NAME")
    ap.add_argument(
        "--fast-forward", default=None, metavar="NAME",
        help="fold branch NAME into main (refused if main moved since "
             "the fork — re-apply the branch's changes on the new tip)",
    )
    ap.add_argument(
        "--rebase", default=None, metavar="NAME",
        help="re-fork a diverged branch onto the current main tip "
             "(part-granular three-way merge; refused when both sides "
             "rewrote the same part) — follow with --fast-forward to "
             "complete the merge",
    )
    ap.add_argument(
        "--branches", action="store_true", help="print all branch tips"
    )
    ap.add_argument(
        "--optimize-zorder", default=None, metavar="COLS",
        help="re-cluster the live table on the Morton interleave of "
             "these comma-separated columns as one snapshot",
    )
    ap.add_argument(
        "--optimize-sort", default=None, metavar="COLS",
        help="re-cluster the live table lexicographically sorted on "
             "these comma-separated columns as one snapshot",
    )
    ap.add_argument(
        "--optimize-where", action="append", default=None, metavar="COL:LO:HI",
        help="bound the optimize rewrite to parts overlapping this range "
             "(repeat for a conjunction); untouched parts keep their ids",
    )
    ap.add_argument(
        "--drop-column", default=None, metavar="COL",
        help="metadata-only DROP COLUMN snapshot: tip reads stop "
             "decoding it, pre-drop snapshots still time-travel to it; "
             "the column's field id is retired — re-adding the name "
             "reads old parts as NULL, never the dead values",
    )
    ap.add_argument(
        "--rename-column", default=None, metavar="OLD:NEW",
        help="metadata-only RENAME COLUMN snapshot (the field id stays, "
             "only the name moves): old parts resolve through per-part "
             "aliases, no data rewrite",
    )
    ap.add_argument(
        "--add-column", default=None, metavar="COL:TYPE[:DEFAULT]",
        help="metadata-only ADD COLUMN snapshot with an optional initial "
             "DEFAULT (pre-add rows read it; numeric-looking defaults "
             "coerce to numbers, quote '...' to force a string)",
    )
    ap.add_argument(
        "--merge-branch", default=None, metavar="NAME",
        help="full merge: rebase (row-level replay when both sides "
             "rewrote a part — starts a local Spark session) then "
             "fast-forward, in one command",
    )
    ap.add_argument(
        "--delete", action="append", default=None,
        help="col:lo:hi range to delete; repeat the flag for a "
             "conjunction (a row is deleted when it matches EVERY range)",
    )
    ap.add_argument("--delete-col", default=None, help="delete: column name")
    ap.add_argument(
        "--delete-lo", default=None,
        help="delete: low bound (numeric-looking coerces to a number; "
             "quote '...' to force a string; may contain colons)",
    )
    ap.add_argument(
        "--delete-hi", default=None,
        help="delete: high bound (same coercion as --delete-lo)",
    )
    args = ap.parse_args()
    # validate BEFORE any branch runs: a usage error must not fire after
    # --delete/--compact already committed snapshots
    if args.optimize_zorder and args.optimize_sort:
        ap.error("pass --optimize-zorder or --optimize-sort, not both")
    if args.optimize_where and not (args.optimize_zorder or args.optimize_sort):
        ap.error("--optimize-where requires --optimize-zorder or --optimize-sort")
    br_name = br_sid = None
    if args.create_branch:
        br_name, _, bsid_s = args.create_branch.partition(":")
        if not br_name:
            ap.error("--create-branch needs a name: NAME[:SID]")
        if bsid_s:
            try:
                br_sid = int(bsid_s)
            except ValueError:
                ap.error(
                    f"--create-branch snapshot id must be an integer, "
                    f"got {bsid_s!r}"
                )
    ren_old = ren_new = None
    if args.rename_column:
        ren_old, _, ren_new = args.rename_column.partition(":")
        if not ren_old or not ren_new:
            ap.error("--rename-column needs OLD:NEW")
    add_col = add_type = add_default = None
    if args.add_column:
        bits = args.add_column.split(":", 2)
        if len(bits) < 2 or not bits[0] or not bits[1]:
            ap.error("--add-column needs COL:TYPE[:DEFAULT]")
        add_col, add_type = bits[0], bits[1]
        if len(bits) == 3:
            add_default = _coerce_bound(bits[2])
    tag_name = tag_sid = None
    if args.tag:
        tag_name, _, sid_s = args.tag.partition(":")
        if not tag_name:
            ap.error("--tag needs a name: NAME[:SID]")
        if sid_s:
            try:
                tag_sid = int(sid_s)
            except ValueError:
                ap.error(f"--tag snapshot id must be an integer, got {sid_s!r}")

    out = {}
    if args.delete or args.delete_col:
        from pyspark.sql import SparkSession

        from sparkcodec.engine import delete_rows

        if args.delete_col:
            preds = [(
                args.delete_col,
                _coerce_bound(args.delete_lo),
                _coerce_bound(args.delete_hi),
            )]
        else:
            try:
                preds = [parse_delete_spec(s) for s in args.delete]
            except ValueError as e:
                ap.error(str(e))
        spark = SparkSession.builder.appName("sparkcodec-maintain").getOrCreate()
        out["delete"] = delete_rows(spark, args.table, preds)
    if args.compact:
        from pyspark.sql import SparkSession

        from sparkcodec.engine import compact_table

        spark = SparkSession.builder.appName("sparkcodec-maintain").getOrCreate()
        out["compact"] = compact_table(
            spark, args.table, target_part_rows=args.target_part_rows
        )
    if args.optimize_zorder or args.optimize_sort:
        from pyspark.sql import SparkSession

        from sparkcodec.engine import optimize_table

        spark = SparkSession.builder.appName("sparkcodec-maintain").getOrCreate()
        cols = (args.optimize_zorder or args.optimize_sort).split(",")
        opt_where = (
            [parse_delete_spec(s) for s in args.optimize_where]
            if args.optimize_where
            else None
        )
        out["optimize"] = optimize_table(
            spark, args.table,
            zorder_by=cols if args.optimize_zorder else None,
            sort_by=cols if args.optimize_sort else None,
            target_part_rows=args.target_part_rows,
            where=opt_where,
        )
    if args.tag:
        from sparkcodec.engine import tag_snapshot

        out["tag"] = tag_snapshot(
            args.table, tag_name, tag_sid, force=args.tag_force
        )
    if args.delete_tag:
        from sparkcodec.engine import delete_tag

        out["delete_tag"] = delete_tag(args.table, args.delete_tag)
    if args.tags:
        from sparkcodec.engine import list_tags

        out["tags"] = list_tags(args.table)
    if args.create_branch:
        from sparkcodec.engine import create_branch

        out["create_branch"] = create_branch(args.table, br_name, br_sid)
    if args.rebase:
        from sparkcodec.engine import rebase_branch

        out["rebase"] = rebase_branch(args.table, args.rebase)
    if args.fast_forward:
        from sparkcodec.engine import fast_forward

        out["fast_forward"] = fast_forward(args.table, args.fast_forward)
    if args.delete_branch:
        from sparkcodec.engine import delete_branch

        out["delete_branch"] = delete_branch(args.table, args.delete_branch)
    if args.branches:
        from sparkcodec.engine import list_branches

        out["branches"] = list_branches(args.table)
    if args.merge_branch:
        from pyspark.sql import SparkSession

        from sparkcodec.engine import merge_branch

        spark = SparkSession.builder.appName("sparkcodec-maintain").getOrCreate()
        out["merge_branch"] = merge_branch(args.table, args.merge_branch,
                                           spark=spark)
    if args.drop_column:
        from sparkcodec.engine import drop_column

        out["drop_column"] = drop_column(args.table, args.drop_column)
    if args.rename_column:
        from sparkcodec.engine import rename_column

        out["rename_column"] = rename_column(args.table, ren_old, ren_new)
    if args.add_column:
        from sparkcodec.engine import add_column

        out["add_column"] = add_column(
            args.table, add_col, add_type, default=add_default
        )
    if args.rollback is not None:
        from sparkcodec.engine import rollback_table

        out["rollback"] = rollback_table(args.table, args.rollback)
    if args.vacuum:
        from sparkcodec.engine import vacuum_orphans

        out["vacuum"] = vacuum_orphans(
            args.table, include_pending=args.vacuum_include_pending
        )
    if args.expire_keep_last is not None:
        from sparkcodec.engine import expire_snapshots

        out["expire"] = expire_snapshots(args.table, keep_last=args.expire_keep_last)
    if args.stats:
        from sparkcodec.engine import table_column_stats

        out["stats"] = table_column_stats(args.table)
    if args.history:
        from sparkcodec.engine import snapshots

        out["history"] = [
            {
                "id": s["id"],
                "parent": s["parent"],
                "n_new": len(s.get("new_parts", [])),
                "n_removed": len(s.get("removed_parts", [])),
                "n_rows": s.get("n_rows"),
                "flags": sorted(
                    k for k in ("compaction", "delete", "merge", "optimize",
                                "rollback_of", "stream")
                    if k in s
                ),
            }
            for s in snapshots(args.table)
        ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
