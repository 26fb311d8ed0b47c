"""Low-level vectorized primitives shared by every codec.

All kernels operate on numpy arrays / bytes, never per-row Python
(BASELINE.json input_hint: vectorized pandas/Arrow UDFs only).

Payload layout convention: a codec payload is a flat ``bytes`` object made
of concatenated *sections*; the section byte-lengths live in the codec's
``meta`` dict (key ``"secs"``), so the payload itself stays opaque and the
meta stays a small JSON-serializable dict.
"""

from __future__ import annotations

import zlib
import lzma

import numpy as np

# ---------------------------------------------------------------------------
# sections

def pack_sections(parts: list[bytes]) -> tuple[bytes, list[int]]:
    """Concatenate byte sections; return (payload, lengths-for-meta)."""
    return b"".join(parts), [len(p) for p in parts]


def split_sections(payload: bytes, secs: list[int]) -> list[bytes]:
    out, off = [], 0
    for n in secs:
        out.append(payload[off : off + n])
        off += n
    return out


# ---------------------------------------------------------------------------
# bit packing (the width-k core of bitpack / FoR / RLE-lengths / dict codes)
#
# Semantics follow the reference's nibble packing idea generalized to width
# k (reference: src/touches/parquet_writer.h:64-70 packs two 4-bit fields in
# a byte); here widths are chosen per block from the actual value range.

_BYTE_WIDTHS = (8, 16, 32, 64)


def bit_width(max_value: int) -> int:
    """Bits needed to store values in [0, max_value]."""
    return int(max_value).bit_length()


def pack_uints(vals: np.ndarray, width: int) -> bytes:
    """Pack a uint64 array into a little-endian bitstream of `width` bits/value.

    width == 0 means all values are zero and nothing is stored.
    Byte-aligned widths take the fast strided path.
    """
    n = len(vals)
    if n == 0 or width == 0:
        return b""
    vals = vals.astype(np.uint64, copy=False)
    if width in _BYTE_WIDTHS:
        return vals.astype(f"<u{width // 8}", copy=False).tobytes()
    # general path: explode to an n x width bit matrix, pack LSB-first
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_uints(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length n."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _BYTE_WIDTHS:
        return np.frombuffer(buf, dtype=f"<u{width // 8}", count=n).astype(np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n * width, bitorder="little"
    ).reshape(n, width)
    shifts = np.arange(width, dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    # accumulate column-wise to avoid an n*width*8-byte temp
    for j in range(width):
        out |= bits[:, j].astype(np.uint64) << shifts[j]
    return out


# ---------------------------------------------------------------------------
# frame-of-reference on raw uint64 (wrap-around arithmetic => full-range safe)

def for_deltas(vals_i64: np.ndarray, frame: int) -> np.ndarray:
    """(vals - frame) mod 2^64 as uint64; exact for any int64 range."""
    return vals_i64.astype(np.int64, copy=False).view(np.uint64) - np.uint64(frame & 0xFFFFFFFFFFFFFFFF)


def for_restore(deltas: np.ndarray, frame: int) -> np.ndarray:
    """Inverse of :func:`for_deltas` -> int64."""
    return (deltas.astype(np.uint64, copy=False) + np.uint64(frame & 0xFFFFFFFFFFFFFFFF)).view(
        np.int64
    )


# ---------------------------------------------------------------------------
# run-length splitting (the reference's _groupNodeRanges, vectorized:
# src/index/index.cpp:114-137 emits (value, start, end) runs with a scan;
# here: boundary mask -> flatnonzero -> diff)

def run_split(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (run_values, run_lengths) for a 1-D array."""
    n = len(vals)
    if n == 0:
        return vals[:0], np.zeros(0, dtype=np.int64)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.not_equal(vals[1:], vals[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    lengths = np.diff(np.append(starts, n)).astype(np.int64)
    return vals[starts], lengths


def run_expand(run_values: np.ndarray, run_lengths: np.ndarray) -> np.ndarray:
    return np.repeat(run_values, run_lengths)


# ---------------------------------------------------------------------------
# page compression (post stage). Mirrors the reference applying a library
# compressor (Snappy) over its own encoded pages
# (src/touches/parquet_writer.cpp:122-126); we use stdlib codecs the same way.

# zstd page compression rides pyarrow's bundled codec (no extra deps).
# pyarrow's one-shot zstd decompress requires the raw size, so the
# compressed page is framed with an 8-byte little-endian raw length.
_ZSTD_CODECS: dict[int, object] = {}


def _zstd_codec(level: int):
    cod = _ZSTD_CODECS.get(level)
    if cod is None:
        import pyarrow as pa

        cod = _ZSTD_CODECS[level] = pa.Codec("zstd", compression_level=level)
    return cod


def _zstd_compress(b: bytes, level: int) -> bytes:
    out = _zstd_codec(level).compress(b)
    return len(b).to_bytes(8, "little") + out.to_pybytes()


def _zstd_decompress(b: bytes) -> bytes:
    raw_len = int.from_bytes(b[:8], "little")
    # level is an encode-side knob only; any zstd codec decodes any level
    return _zstd_codec(1).decompress(b[8:], raw_len).to_pybytes()


_POST_ENCODERS = {
    "zlib": lambda b: zlib.compress(b, 6),
    "zlib1": lambda b: zlib.compress(b, 1),
    "zlib9": lambda b: zlib.compress(b, 9),
    "zstd": lambda b: _zstd_compress(b, 3),
    "zstd6": lambda b: _zstd_compress(b, 6),
    "zstd9": lambda b: _zstd_compress(b, 9),
    "lzma": lambda b: lzma.compress(b, preset=2),
    "lzma6": lambda b: lzma.compress(b, preset=6),
}

_POST_DECODERS = {
    "zlib": zlib.decompress,
    "zlib1": zlib.decompress,
    "zlib9": zlib.decompress,
    "zstd": _zstd_decompress,
    "zstd6": _zstd_decompress,
    "zstd9": _zstd_decompress,
    "lzma": lzma.decompress,
    "lzma6": lzma.decompress,
}

POST_CODECS = tuple(_POST_ENCODERS)


def post_compress(payload: bytes, post: str | None) -> tuple[bytes, str | None]:
    """Apply a page compressor; returns (bytes, effective_post).

    Falls back to identity when compression does not help (stores the
    smaller of the two, like Parquet's is_compressed page flag).
    """
    if not post:
        return payload, None
    out = _POST_ENCODERS[post](payload)
    if len(out) >= len(payload):
        return payload, None
    return out, post


def post_decompress(payload: bytes, post: str | None) -> bytes:
    if not post:
        return payload
    return _POST_DECODERS[post](payload)
