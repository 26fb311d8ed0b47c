#!/usr/bin/env python
"""Supplemental isolation benchmarks for OPTIMIZATION_r07.md.

NOT part of the driver contract — `bench.py` is the frozen measured
suite; this file isolates the pieces the round-7 optimizations target so
their before/after numbers can be reproduced:

  python bench_extra.py codec     # single-thread codec kernel phases
  python bench_extra.py select    # per-task codec selection cost
  python bench_extra.py boundary  # JVM->Python Arrow boundary at 2 cores
  python bench_extra.py queries   # operator queries, noop sink, best-of-N
  python bench_extra.py cal       # host-window calibration (pure CPU)

Every mode prints one JSON line. Run on an idle host; the `cal` numbers
contextualize any absolute wall against the host's delivered capacity in
that window (this sandbox oscillates between ~100% and ~60% of the
round-6 measurement window — see OPTIMIZATION_r07.md "measurement
conditions").
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_INPUT = os.environ.get(
    "SPARKCODEC_BENCH_INPUT", "/tmp/sparkcodec_bench/code_files_300000"
)


def _best(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def mode_codec() -> dict:
    """Single-thread FSST + post phases on the bench corpus content."""
    import numpy as np
    import pyarrow.parquet as pq

    from sparkcodec.codecs.fsst import build_table, decode_to_blob, encode_with_table
    from sparkcodec.codecs.kernels import string_parts
    from sparkcodec.codecs.primitives import post_compress, post_decompress

    t = pq.read_table(os.path.join(BENCH_INPUT, "part-0000.parquet"))
    arr = t.column("content").combine_chunks()
    lens, blob = string_parts(arr)
    mb = blob.nbytes / 1e6
    t_build = _best(lambda: build_table(lens, blob), reps=3)
    tab = build_table(lens, blob)
    t_enc = _best(lambda: encode_with_table(lens, blob, tab))
    codes, exc = encode_with_table(lens, blob, tab)
    t_dec = _best(lambda: decode_to_blob(codes, exc, tab))
    assert np.array_equal(decode_to_blob(codes, exc, tab), blob)
    payload = codes.tobytes()
    t_post = _best(lambda: post_compress(payload, "zstd"))
    z, eff = post_compress(payload, "zstd")
    t_unpost = _best(lambda: post_decompress(z, eff))
    return {
        "content_mb": round(mb, 2),
        "fsst_encode_mbps": round(mb / t_enc, 1),
        "fsst_decode_mbps": round(mb / t_dec, 1),
        "table_build_ms": round(t_build * 1000, 1),
        "post_zstd_ms": round(t_post * 1000, 1),
        "post_unzstd_ms": round(t_unpost * 1000, 1),
        "codes_bytes": len(payload),
        "post_bytes": len(z),
    }


def mode_select() -> dict:
    """choose_codec cost per column (runs once per Spark task)."""
    import pyarrow.parquet as pq

    from sparkcodec.select import choose_codec

    t = pq.read_table(os.path.join(BENCH_INPUT, "part-0000.parquet"))
    out = {}
    for col in t.column_names:
        arr = t.column(col).combine_chunks()
        out[col] = {
            "ms": round(_best(lambda: choose_codec(arr), reps=3) * 1000, 1),
            "spec": choose_codec(arr)[0],
        }
    return out


def mode_boundary() -> dict:
    """Scan floor vs scan+Arrow-boundary floor at local[2] (guide §4.1:
    what the aligned direct-scan path removes)."""
    import pyarrow as pa

    from sparkcodec.session import get_spark

    spark = get_spark(cores=2, app_name="bench-extra-boundary", extra_conf={
        "spark.sql.files.maxPartitionBytes": str(2 << 20),
    })
    df = spark.read.parquet(BENCH_INPUT)
    df.count()

    def noop():
        df.write.format("noop").mode("overwrite").save()

    def consume(batches):
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_pylist(
            [{"n": n}], schema=pa.schema([("n", pa.int64())])
        )

    def through_python():
        df.mapInArrow(consume, "n long").collect()

    return {
        "scan_noop_sec": round(_best(noop, reps=3), 2),
        "scan_plus_arrow_consume_sec": round(_best(through_python, reps=3), 2),
    }


def mode_queries() -> dict:
    """Operator queries, noop sink, best-of-N (jitter-resistant twin of
    the frozen suite's single-sample timing)."""
    from sparkcodec.queries import QUERIES
    from sparkcodec.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bench-extra-queries")
    names = [
        "profile_documents", "run_length_lineitem", "csr_offsets",
        "synapse_ids", "exact_dedup", "token_stats", "ann_cosine_topk",
    ]
    out = {}
    for n in names:
        fn = QUERIES[n]

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        out[n] = round(_best(run, reps=4), 3)
    return out


def mode_cal() -> dict:
    from sparkcodec.benchjob import run_calibrate

    return run_calibrate([2, 8, CPUS])


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "codec"
    res = {
        "codec": mode_codec,
        "select": mode_select,
        "boundary": mode_boundary,
        "queries": mode_queries,
        "cal": mode_cal,
    }[mode]()
    print("BENCH_EXTRA " + json.dumps({"mode": mode, **res}))


if __name__ == "__main__":
    main()
