"""Stats-driven codec auto-selection with a measured fallback.

The reference hardcodes its physical encoding (Snappy, dictionary off —
src/touches/parquet_writer.cpp:122-124); the north rule's value-add is
choosing per column *from data statistics*. Strategy (SURVEY §7.4):

1. cheap vectorized stats on a sample block (cardinality ratio, run
   count, value range, string length / distinct-byte profile) narrow the
   candidate list per north-rule routing (low-card → dict+RLE,
   narrow/monotone ints → FoR+bit-pack, long text → FSST);
2. every surviving candidate is *actually encoded* on the sample and the
   smallest wins — statistics route, measurements decide.

Selection runs once per (partition, column) and is recorded in lineage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import encode_array
from .codecs.api import _FLOAT_LIKE, _INT_LIKE, _STR_LIKE, type_name
from .codecs.fsst import SymbolTable, build_table
from .codecs.kernels import string_parts

# page compressor used behind lightweight codecs when it pays off.
# zstd level 3 (pyarrow's bundled codec) is the speed/ratio default:
# measured on the bench FSST code stream it compresses ~6x faster than
# zlib-6 (4.3ms vs 25.5ms per 1.3MB page) and decompresses ~2.4x faster
# at ~11% larger output; SPARKCODEC_POST=zstd6 matches zlib-6's size at
# still ~1.5x its encode speed, SPARKCODEC_POST=lzma trades ~2x encode
# speed for ~10-15% smaller output.
import os as _os

DEFAULT_POST = _os.environ.get("SPARKCODEC_POST", "zstd")

SAMPLE_ROWS = 1024
SAMPLE_BYTES = 512 << 10


def column_stats(arr: pa.Array) -> dict:
    """Vectorized sample statistics driving candidate routing."""
    tname = type_name(arr.type)
    n = len(arr)
    stats: dict = {"t": tname, "n": n}
    if n == 0:
        return stats
    if arr.null_count:
        arr = arr.drop_null()
        n = len(arr)
        if n == 0:
            return stats
    if tname in _STR_LIKE:
        lens, blob = string_parts(arr)
        card = len(arr.unique())
        # byte entropy of the sample (bits/byte; UTF-8 text tops out
        # near 6.0 for base64/compressed payloads vs <4.9 for real
        # code/text) — SURVEY §7 profile stat, routes incompressible
        # columns away from the FSST table build
        if blob.size:
            counts = np.bincount(blob[: 1 << 20], minlength=256)
            p = counts[counts > 0] / counts.sum()
            entropy = float(-(p * np.log2(p)).sum())
        else:
            entropy = 0.0
        stats.update(
            card=card,
            card_ratio=card / n,
            avg_len=float(lens.mean()) if n else 0.0,
            total_bytes=int(lens.sum()),
            byte_entropy=entropy,
        )
    elif tname in _INT_LIKE:
        from .codecs.api import _to_int64

        v = _to_int64(arr)
        runs = int(np.count_nonzero(v[1:] != v[:-1]) + 1) if n > 1 else n
        vmin, vmax = int(v.min()), int(v.max())
        range_bits = max(1, (vmax - vmin).bit_length())
        if n > 1:
            gaps = (v[1:].view(np.uint64) - v[:-1].view(np.uint64)).view(np.int64)
            gap_spread = int(gaps.max()) - int(gaps.min())
            gap_bits = max(1, gap_spread.bit_length())
        else:
            gap_bits = range_bits
        stats.update(
            vmin=vmin,
            vmax=vmax,
            runs=runs,
            run_ratio=runs / n,
            range_bits=range_bits,
            gap_bits=gap_bits,
        )
    return stats


def candidates_for(stats: dict) -> list[str]:
    """North-rule routing: stats → candidate codec specs (ordered)."""
    tname = stats["t"]
    if stats.get("n", 0) == 0:
        return ["raw"]
    if tname in _STR_LIKE:
        out = []
        low_card = stats.get("card_ratio", 1.0) <= 0.5
        if low_card:
            out.append("dict")  # low-cardinality: lang, repo, commit
            out.append(f"dict+{DEFAULT_POST}")
        high_entropy = stats.get("byte_entropy", 0.0) > 5.9
        if (
            stats.get("avg_len", 0) >= 16
            and stats.get("card_ratio", 1.0) > 0.1
            and not high_entropy
        ):
            # long, mostly-distinct text (content, paths); low-card columns
            # never reach FSST — dict dominates and the table build isn't
            # free; near-random columns (base64/compressed blobs measure
            # ~6.0 bits/byte vs <4.9 for real code/text) skip the table
            # build too — nothing to learn
            out.append(f"fsst+{DEFAULT_POST}")
            out.append("fsst")
        out.append(f"raw+{DEFAULT_POST}")
        if high_entropy:
            out.append("raw")  # post pass likely useless as well; measure
        return out
    if tname in _INT_LIKE:
        out = []
        if stats.get("run_ratio", 1.0) <= 0.5:
            out.append("rle")
        out.append("for")
        if stats.get("gap_bits", 64) < stats.get("range_bits", 64):
            # successive gaps narrower than the block range: timestamps,
            # monotone ids/offsets — delta packs at gap width
            out.append("delta")
        if stats.get("run_ratio", 1.0) > 0.3:
            out.append(f"for+{DEFAULT_POST}")
        return out
    if tname in _FLOAT_LIKE:
        return ["alp", f"alp+{DEFAULT_POST}", f"raw+{DEFAULT_POST}", "raw"]
    return ["raw"]


def sample_block(arr: pa.Array) -> pa.Array:
    """Bounded head sample of a block for measurement."""
    s = arr.slice(0, SAMPLE_ROWS)
    if s.nbytes > SAMPLE_BYTES:
        # long strings: take fewer rows
        k = max(8, int(SAMPLE_ROWS * SAMPLE_BYTES / s.nbytes))
        s = arr.slice(0, k)
    return s


def choose_codec(
    arr: pa.Array, fsst_table: SymbolTable | None = None
) -> tuple[str, SymbolTable | None]:
    """Pick the codec spec for a column by measuring candidates on a sample.

    Returns (spec, fsst_table) — the table is built here (once per
    partition) when FSST is a candidate, so blocks can share it.
    """
    from .codecs.api import parse_spec
    from .codecs.primitives import post_compress

    sample = sample_block(arr)
    stats = column_stats(sample)
    specs = candidates_for(stats)
    if any(parse_spec(s)[0] == "fsst" for s in specs) and fsst_table is None:
        lens, blob = string_parts(sample if sample.null_count == 0 else sample.fill_null(""))
        fsst_table = build_table(lens, blob)
    # evaluate candidates IN ROUTING ORDER, encoding each base once; a
    # later candidate must be >5% smaller to displace an earlier one —
    # the router's priors carry decode-side value a few-percent size edge
    # doesn't outweigh (dict: O(#distinct) value table + exact vsets for
    # pruning; fsst: symbol-level decode) and the deterministic order
    # keeps the choice stable run to run
    enc_cache: dict[str, bytes | None] = {}
    best_spec, best_size = None, None
    for spec in specs:
        base, post = parse_spec(spec)
        if base not in enc_cache:
            try:
                enc_cache[base] = encode_array(sample, base, fsst_table=fsst_table)[0]
            except (ValueError, TypeError):
                enc_cache[base] = None
        payload = enc_cache[base]
        if payload is None:
            continue
        blob, eff = post_compress(payload, post)
        # displacement needs a RELATIVE and an ABSOLUTE margin: at
        # few-dozen-byte sample payloads (one distinct value) a 5% edge
        # is a couple of bytes of container framing, not a signal
        if best_size is None or (
            len(blob) < best_size * 0.95 and best_size - len(blob) > 64
        ):
            best_spec = base if eff is None else f"{base}+{eff}"
            best_size = len(blob)
    return best_spec or "raw", fsst_table
