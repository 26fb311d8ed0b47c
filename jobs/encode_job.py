#!/usr/bin/env python
"""spark-submit entry point: encode a table into a sparkcodec blocks dir.

Cluster usage (north rule: spark-submit --py-files on N / 4N executors):

    zip -r sparkcodec.zip sparkcodec   # run from the repo root
    spark-submit --py-files sparkcodec.zip \
        --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824 \
        jobs/encode_job.py --input /mnt/shared/code_files \
        --output /mnt/shared/enc \
        [--layout clustered|aligned] [--no-resume] [--verify]

Input may be any Spark-readable parquet path; --output must be a shared
POSIX filesystem visible to every executor (local dir in local mode,
NFS/Lustre/fuse mount on a cluster) — block files are written with
local filesystem APIs and object-store URLs are rejected.

Local smoke: spark-submit --master local[8] --py-files sparkcodec.zip ...
The job prints one JSON line with the encode metrics (and the verify
report when --verify is given) and exits non-zero on a failed verify.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--layout", default="clustered", choices=["clustered", "aligned"])
    ap.add_argument("--num-parts", type=int, default=None)
    ap.add_argument("--target-part-rows", type=int, default=262_144)
    ap.add_argument("--cluster-by", default=None, help="comma-separated")
    ap.add_argument("--salt-by", default=None, help="comma-separated")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--verify", action="store_true", help="decode + sha256 round-trip check")
    ap.add_argument("--key-cols", default="repo,path,commit")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sparkcodec.engine import decode_table, encode_table

    spark = SparkSession.builder.appName("sparkcodec-encode").getOrCreate()
    df = spark.read.parquet(args.input)
    metrics = encode_table(
        spark,
        df,
        args.output,
        layout=args.layout,
        num_parts=args.num_parts,
        target_part_rows=args.target_part_rows,
        cluster_by=args.cluster_by.split(",") if args.cluster_by else None,
        salt_by=args.salt_by.split(",") if args.salt_by else None,
        resume=not args.no_resume,
    )
    out = {"encode": metrics}
    ok = True
    if args.verify:
        from sparkcodec.verify import verify_roundtrip

        report = verify_roundtrip(df, decode_table(spark, args.output), args.key_cols.split(","))
        out["verify"] = report
        ok = bool(report["ok"])
    print(json.dumps(out, default=str))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
