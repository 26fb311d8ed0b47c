#!/usr/bin/env python
"""spark-submit entry point: table maintenance (compaction + expiry).

    spark-submit --py-files sparkcodec.zip jobs/maintain_job.py \
        --table /mnt/shared/enc [--compact] [--target-part-rows 262144] \
        [--expire-keep-last 3] [--delete col:lo:hi]

--delete removes rows with lo <= col <= hi as a copy-on-write snapshot
(zone maps bound the rewrite to overlapping parts; omit lo or hi for a
half-open range). Numeric-looking bounds parse as numbers; quote a bound
('100') to force a string comparison on string columns. --compact merges small live parts into bigger ones as a new snapshot
(earlier snapshots stay time-travelable); --expire-keep-last N deletes
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="encoded blocks dir")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--target-part-rows", type=int, default=262_144)
    ap.add_argument("--expire-keep-last", type=int, default=None)
    ap.add_argument("--delete", default=None, help="col:lo:hi range to delete")
    args = ap.parse_args()

    out = {}
    if args.delete:
        from pyspark.sql import SparkSession

        from sparkcodec.engine import delete_rows

        def coerce(v):
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

        col, lo, hi = args.delete.split(":", 2)
        spark = SparkSession.builder.appName("sparkcodec-maintain").getOrCreate()
        out["delete"] = delete_rows(spark, args.table, (col, coerce(lo), coerce(hi)))
    if args.compact:
        from pyspark.sql import SparkSession

        from sparkcodec.engine import compact_table

        spark = SparkSession.builder.appName("sparkcodec-maintain").getOrCreate()
        out["compact"] = compact_table(
            spark, args.table, target_part_rows=args.target_part_rows
        )
    if args.expire_keep_last is not None:
        from sparkcodec.engine import expire_snapshots

        out["expire"] = expire_snapshots(args.table, keep_last=args.expire_keep_last)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
