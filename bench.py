#!/usr/bin/env python
"""sparkcodec benchmark harness.

Runs the headline jobs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "encode": {... two-parallelism throughput + scaling efficiency ...}}

Each measurement runs in its own subprocess (fresh JVM) — session reuse
across different local[N] masters measurably distorts timings. Scaling
evidence (BASELINE.md §B, BENCH.md): the same encode job at N=2 and
4N=8 cores over the same cached input is the primary N vs 4N executor
proxy (both within this host's physical cores); the 8 -> $CPUS pair is
also published together with a pure-CPU hardware calibration.
efficiency = gbps(4N) / (4 * gbps(N)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = "/tmp/sparkcodec_bench"
REPO = os.path.dirname(os.path.abspath(__file__))

QUERY_NAMES = [
    "profile_documents",
    "run_length_lineitem",
    "csr_offsets",
    "synapse_ids",
    "exact_dedup",
    "token_stats",
    "ann_cosine_topk",
]


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_input(rows: int) -> str:
    path = os.path.join(CACHE, f"code_files_{rows}")
    if not os.path.exists(path):
        os.makedirs(CACHE, exist_ok=True)
        from sparkcodec.tables import write_code_files

        write_code_files(path + ".tmp", rows, seed=42, n_files=32)
        os.replace(path + ".tmp", path)
    return path


def benchjob(args: list[str]) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "sparkcodec.benchjob", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BENCHJOB "):
            return json.loads(line[len("BENCHJOB ") :])
    raise RuntimeError(f"benchjob failed: {proc.stdout[-2000:]} {proc.stderr[-2000:]}")


def merge_enc(a: dict, b: dict) -> dict:
    """Fold two invocations of the same encode leg (the ABBA design) into
    one measurement: walls concatenate, best/median recompute."""
    walls = a["walls"] + b["walls"]
    best = min(walls)
    med = sorted(walls)[len(walls) // 2]
    out = dict(b)
    out["walls"] = walls
    out["walls_warmup"] = a["walls_warmup"] + b["walls_warmup"]
    out["wall"] = best
    out["wall_median"] = med
    out["gbps"] = round(a["raw_bytes"] / best / 1e9, 4)
    out["gbps_median"] = round(a["raw_bytes"] / med / 1e9, 4)
    return out


def main() -> None:
    sf = sf_of(SF_DIR)
    rows = max(2000, int(600_000 * sf))  # sf0.1 -> 60k rows (~130 MB content)
    # scaling runs use a larger input so compute dominates job overheads —
    # the regime a real N vs 4N cluster comparison lives in
    scale_rows = max(rows, 300_000)
    input_path = ensure_input(rows)
    scale_path = ensure_input(scale_rows)
    out8 = os.path.join(CACHE, "enc_n8")
    outN = os.path.join(CACHE, f"enc_n{CPUS}")

    # primary N vs 4N pair: 2 vs 8 cores — both within the host's physical
    # cores, so a JVM-thread + Python-worker pair per slot never exceeds
    # the hardware; 8 vs CPUS is reported too but is SMT/fault-bandwidth
    # bound above ~16 threads on this box (see calibration + BENCH.md).
    # Both layouts are measured on the pair: clustered (exchange+sort)
    # and aligned (zero-shuffle, the pre-grouped-input scale path).
    #
    # Measurement design: the PAIRS run FIRST (coolest host) and each
    # pair is sampled ABBA (2,8,8,2) across separate JVMs, so a linear
    # host drift (page-cache pressure, khugepaged debt from earlier
    # jobs) cancels out of the ratio instead of biasing one leg; best
    # walls merge across the A and B invocations. Both legs of a pair
    # run the SAME pinned-split plan (see benchjob), so the ratio
    # measures scaling, not plan shape.
    def enc(cores, path, out, reps, warm=1):
        return benchjob([
            "--mode", "encode", "--cores", str(cores), "--input", path,
            "--out", out, "--reps", str(reps), "--warm", str(warm),
        ])

    # aligned legs run 2 MiB splits (64 one-wave-per-8-slots tasks →
    # eight waves at local[8]): the sandbox VM steals whole cores for
    # seconds at a time, and with only 4 waves one stolen task re-walled
    # the leg — at 8 waves the steal amortizes (measured: same degraded
    # host window, 4 MiB → 0.775, 2 MiB → 0.929). Clustered legs keep
    # 4 MiB: their granularity is the shuffle's, and finer scan splits
    # only add map-side stream overhead there.
    os.environ["SPARKCODEC_BENCH_LAYOUT"] = "aligned"
    os.environ["SPARKCODEC_BENCH_SPLIT"] = str(2 << 20)
    # 3 reps per invocation (best-of-6 per leg): the host's delivered
    # parallel capacity oscillates on a ~minute scale, so a pair needs
    # enough samples for both legs to catch a healthy window
    encA2a = enc(2, scale_path, outN + "_a2", 3)
    encA8a = enc(8, scale_path, outN + "_a8", 3)
    encA8b = enc(8, scale_path, outN + "_a8", 3)
    encA2b = enc(2, scale_path, outN + "_a2", 3)
    del os.environ["SPARKCODEC_BENCH_LAYOUT"]
    del os.environ["SPARKCODEC_BENCH_SPLIT"]
    encA2, encA8 = merge_enc(encA2a, encA2b), merge_enc(encA8a, encA8b)
    enc2a = enc(2, scale_path, out8 + "_c2", 2)
    enc8a = enc(8, scale_path, out8, 2)
    enc8b = enc(8, scale_path, out8, 2)
    enc2b = enc(2, scale_path, out8 + "_c2", 2)
    enc2, enc8 = merge_enc(enc2a, enc2b), merge_enc(enc8a, enc8b)

    cal = benchjob(["--mode", "calibrate", "--cores", str(CPUS)])
    encN = benchjob(["--mode", "encode", "--cores", str(CPUS), "--input", scale_path, "--out", outN])
    os.environ["SPARKCODEC_BENCH_LAYOUT"] = "aligned"
    encA = benchjob(
        ["--mode", "encode", "--cores", str(CPUS), "--input", scale_path, "--out", outN + "_aligned"]
    )
    del os.environ["SPARKCODEC_BENCH_LAYOUT"]
    dec = benchjob(["--mode", "decode", "--cores", str(CPUS), "--input", scale_path, "--out", outN])
    qres = benchjob(
        ["--mode", "queries", "--cores", str(CPUS), "--sf-dir", SF_DIR, "--queries", ",".join(QUERY_NAMES)]
    )

    speedup = encN["gbps"] / enc8["gbps"]
    efficiency = speedup / (CPUS / 8)
    # hardware ceiling: throughput speedup embarrassingly-parallel pure-CPU
    # work shows for the same core pair on this host (calibrate runs N
    # fixed-size units on N procs, so per-unit throughput is N/wall)
    hw_speedup = (CPUS / cal[str(CPUS)]) / (8 / cal["8"]) if cal.get(str(CPUS)) else None
    # host ceiling for the PRIMARY 2->8 pair: each calibrate worker burns a
    # fixed unit, so per-unit throughput at n workers is n/wall(n); the
    # ratio bounds what ANY 2-vs-8-slot comparison can show when the
    # sandbox's effective parallel capacity is externally throttled
    hw_speedup_2_8 = (8 / cal["8"]) / (2 / cal["2"]) if cal.get("2") else None
    hw_ceiling_2_8 = (hw_speedup_2_8 / 4) if hw_speedup_2_8 else None
    queries = {
        "encode_local2_aligned": encA2["wall"],
        "encode_local8": enc8["wall"],
        f"encode_local{CPUS}": encN["wall"],
        "decode_verify": dec["wall"],
        **qres,
    }
    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline suite wall time (aligned encode@2 + encode@8 + encode@N + decode-verify + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "encode": {
            "rows": scale_rows,
            "raw_bytes": encN["raw_bytes"],
            "enc_bytes": encN["enc_bytes"],
            # PRIMARY north-rule scaling pair: N=2 vs 4N=8 slots (both within
            # physical cores), aligned layout — the engine's scale path
            "scaling_efficiency_N2_to_4N8_aligned": round(
                encA8["gbps"] / (4 * encA2["gbps"]), 4
            ),
            # same pair on the clustered (exchange+sort) layout — zstd
            # shuffle blocks keep the exchange CPU-bound so it scales
            "scaling_efficiency_N2_to_4N8_clustered": round(
                enc8["gbps"] / (4 * enc2["gbps"]), 4
            ),
            "gbps_aligned_local2": encA2["gbps"],
            "walls_aligned_local2": encA2["walls"],
            "gbps_aligned_local8": encA8["gbps"],
            "walls_aligned_local8": encA8["walls"],
            "gbps_local2": enc2["gbps"],
            "walls_local2": enc2["walls"],
            "gbps_local8": enc8["gbps"],
            f"gbps_local{CPUS}": encN["gbps"],
            "walls_local8": enc8["walls"],
            f"walls_local{CPUS}": encN["walls"],
            "speedup_8_to_N": round(speedup, 3),
            f"scaling_efficiency_8_to_{CPUS}": round(efficiency, 4),
            "hw_calibration_walls": cal,
            # pure-CPU host efficiency for the SAME 2->8 pair, measured in
            # the same run: 1.0 on a host that really gives 8 slots 4x the
            # compute of 2; the *_vs_hw_2_to_8 fields divide the encode
            # pairs by this ceiling (host-normalized scaling)
            "hw_ceiling_2_to_8": round(hw_ceiling_2_8, 4) if hw_ceiling_2_8 else None,
            "scaling_eff_aligned_vs_hw_2_to_8": (
                round(encA8["gbps"] / (4 * encA2["gbps"]) / hw_ceiling_2_8, 4)
                if hw_ceiling_2_8 else None
            ),
            "scaling_eff_clustered_vs_hw_2_to_8": (
                round(enc8["gbps"] / (4 * enc2["gbps"]) / hw_ceiling_2_8, 4)
                if hw_ceiling_2_8 else None
            ),
            "hw_calibration_speedup_8_to_N": round(hw_speedup, 3) if hw_speedup else None,
            "scaling_efficiency_vs_hw_ceiling": (
                round(speedup / hw_speedup, 4) if hw_speedup else None
            ),
            f"gbps_aligned_local{CPUS}": encA["gbps"],
            "aligned_compression_ratio": round(
                encA["raw_bytes"] / max(1, encA["enc_bytes"]), 3
            ),
            "compression_ratio_vs_raw": round(encN["raw_bytes"] / max(1, encN["enc_bytes"]), 3),
        },
        "decode_checksum_match": dec["checksum_match"],
        # per-phase attribution of the decode wall (io vs codec CPU,
        # single-thread extrapolation) — the decode_verify jitter monitor
        "decode_phase_profile": dec.get("phase_profile"),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
