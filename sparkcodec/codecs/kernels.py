"""Codec kernels: bitpack, frame-of-reference, RLE, raw, dictionary.

Every kernel is pure numpy/pyarrow over whole blocks — the Spark-side
callers hand in one Arrow batch slice at a time (see engine.py). Each
``encode_*`` returns ``(payload: bytes, meta: dict)``; meta is tiny and
JSON-serializable, payload is opaque bytes whose internal section lengths
are in ``meta["secs"]``.

Reference anchors (parity, not port):
- bit packing generalizes the nibble packing of
  src/touches/parquet_writer.h:64-70;
- frame-of-reference generalizes the static narrowing casts of
  src/circuit/sonata_writer.cpp:159-194;
- RLE is the vectorized form of the run grouping in
  src/index/index.cpp:114-137;
- dictionary mirrors the '@library' enumeration of
  src/circuit/sonata_writer.cpp:110-119 (and like the reference's writer,
  which disables Parquet's own dictionary at
  src/touches/parquet_writer.cpp:124, we own the encoding ourselves).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .primitives import (
    bit_width,
    for_deltas,
    for_restore,
    pack_sections,
    pack_uints,
    run_expand,
    run_split,
    split_sections,
    unpack_uints,
)

# ---------------------------------------------------------------------------
# integer kernels (operate on int64 numpy arrays; typed wrappers in api.py)


def enc_bitpack(vals: np.ndarray) -> tuple[bytes, dict]:
    """Width-k packing of non-negative ints at their natural width."""
    n = len(vals)
    if n and int(vals.min()) < 0:
        raise ValueError("bitpack requires non-negative values; use 'for'")
    w = bit_width(int(vals.max())) if n else 0
    return pack_uints(vals.astype(np.uint64, copy=False), w), {"c": "bitpack", "n": n, "w": w}


def dec_bitpack(payload: bytes, meta: dict) -> np.ndarray:
    return unpack_uints(payload, meta["n"], meta["w"]).view(np.int64)


def enc_for(vals: np.ndarray) -> tuple[bytes, dict]:
    """Frame-of-reference: subtract the block min, bit-pack the deltas.

    Wrap-around uint64 arithmetic makes this exact even for full-range
    int64 input (delta range up to 2^64-1).
    """
    n = len(vals)
    if n == 0:
        return b"", {"c": "for", "n": 0, "w": 0, "f": 0}
    frame = int(vals.min())
    deltas = for_deltas(vals, frame)
    w = bit_width(int(deltas.max()))
    return pack_uints(deltas, w), {"c": "for", "n": n, "w": w, "f": frame}


def dec_for(payload: bytes, meta: dict) -> np.ndarray:
    deltas = unpack_uints(payload, meta["n"], meta["w"])
    return for_restore(deltas, meta["f"])


def enc_rle(vals: np.ndarray) -> tuple[bytes, dict]:
    """Run-length encoding; run values and run lengths each FoR-packed."""
    rv, rl = run_split(vals)
    pv, mv = enc_for(rv)
    pl, ml = enc_for(rl)
    payload, secs = pack_sections([pv, pl])
    return payload, {"c": "rle", "n": len(vals), "secs": secs, "rv": mv, "rl": ml}


def dec_rle(payload: bytes, meta: dict) -> np.ndarray:
    pv, pl = split_sections(payload, meta["secs"])
    rv = dec_for(pv, meta["rv"])
    rl = dec_for(pl, meta["rl"])
    return run_expand(rv, rl)


def enc_delta(vals: np.ndarray) -> tuple[bytes, dict]:
    """Delta coding: first value + FoR-packed first-order differences.

    Wins where successive gaps are small but the absolute range is wide
    (timestamps, monotone offsets/ids) — FoR alone packs at the *range*
    width, delta at the *gap* width. Differences are taken in wrap-around
    uint64 (exact for any int64 input) and stored with the smaller of
    FoR / RLE, so constant-stride sequences (regular timestamps)
    collapse to a single run.
    """
    n = len(vals)
    if n == 0:
        return b"", {"c": "delta", "n": 0, "first": 0, "d": {"c": "for", "n": 0, "w": 0, "f": 0}}
    v = vals.astype(np.int64, copy=False)
    du = (v[1:].view(np.uint64) - v[:-1].view(np.uint64)).view(np.int64)
    payload, m = enc_int_auto(du)
    return payload, {"c": "delta", "n": n, "first": int(v[0]), "d": m}


def dec_delta(payload: bytes, meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    du = dec_int(payload, meta["d"]).view(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(meta["first"] & 0xFFFFFFFFFFFFFFFF)
    np.cumsum(du, out=out[1:])
    out[1:] += out[0]
    return out.view(np.int64)


def enc_int_auto(vals: np.ndarray) -> tuple[bytes, dict]:
    """Measured pick among {for, rle} for an int block (both cheap)."""
    p_for, m_for = enc_for(vals)
    p_rle, m_rle = enc_rle(vals)
    if len(p_rle) < len(p_for):
        return p_rle, m_rle
    return p_for, m_for


_INT_DECODERS = {"bitpack": dec_bitpack, "for": dec_for, "rle": dec_rle, "delta": dec_delta}


def dec_int(payload: bytes, meta: dict) -> np.ndarray:
    return _INT_DECODERS[meta["c"]](payload, meta)


# ---------------------------------------------------------------------------
# raw kernels


def enc_raw_fixed(vals: np.ndarray) -> tuple[bytes, dict]:
    """Verbatim little-endian bytes of a fixed-width array (escape hatch,
    like the reference's plain data pages)."""
    v = vals
    if v.dtype.byteorder == ">":
        v = v.astype(v.dtype.newbyteorder("<"))
    return v.tobytes(), {"c": "raw", "n": len(vals), "dt": v.dtype.str}


def dec_raw_fixed(payload: bytes, meta: dict) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.dtype(meta["dt"]), count=meta["n"])


# ---------------------------------------------------------------------------
# string/binary representation helpers
#
# A string block is (lens: int64[n], blob: uint8[total]); lens are FoR-packed
# in every string codec, the blob treatment is what differs.


def string_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-ish-copy (lens, blob) view of a string/binary Arrow array.

    Nulls must be removed/filled by the caller (api.py handles validity).
    """
    a = arr
    if not pa.types.is_large_binary(a.type):
        a = a.cast(pa.large_binary())
    off_buf = a.buffers()[1]
    off = np.frombuffer(off_buf, dtype=np.int64, count=len(a) + 1 + a.offset)[a.offset :]
    data_buf = a.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8, count=len(data_buf))
        if data_buf is not None
        else np.zeros(0, np.uint8)
    )
    blob = data[off[0] : off[-1]]
    lens = np.diff(off)
    return lens, blob


def strings_from_parts(lens: np.ndarray, blob: np.ndarray) -> pa.Array:
    off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(lens), [None, pa.py_buffer(off.tobytes()), pa.py_buffer(blob.tobytes())]
    )


def enc_raw_str(arr: pa.Array) -> tuple[bytes, dict]:
    lens, blob = string_parts(arr)
    pl, ml = enc_for(lens)
    payload, secs = pack_sections([pl, blob.tobytes()])
    return payload, {"c": "raw_str", "n": len(arr), "secs": secs, "lens": ml}


def dec_raw_str(payload: bytes, meta: dict) -> pa.Array:
    pl, blob = split_sections(payload, meta["secs"])
    lens = dec_for(pl, meta["lens"])
    return strings_from_parts(lens, np.frombuffer(blob, np.uint8))


# ---------------------------------------------------------------------------
# dictionary codec (strings; the '@library' analog)


def enc_dict(arr: pa.Array, values_codec=None) -> tuple[bytes, dict]:
    """Dictionary-encode a string block: sorted value table + int codes.

    The table is sorted so equal prefixes sit adjacent (helps the value
    table's own compression) and the code assignment is deterministic.
    Codes are sub-encoded with the measured best of {FoR, RLE} — sorted or
    clustered inputs collapse to runs exactly like the reference's
    node-id runs.
    """
    d = arr.dictionary_encode()
    values = d.dictionary
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # sort the dictionary, remap codes through the rank permutation
    order = np.asarray(pa.compute.sort_indices(values))
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    codes = rank[codes] if len(order) else codes
    values = values.take(pa.array(order)) if len(order) else values

    pc, mc = enc_int_auto(codes)
    if values_codec is None:
        pv, mv = enc_raw_str(values)
    else:
        pv, mv = values_codec(values)
    payload, secs = pack_sections([pc, pv])
    return payload, {"c": "dict", "n": len(arr), "secs": secs, "codes": mc, "values": mv, "card": len(values)}


def dec_dict(payload: bytes, meta: dict, values_decoder=None) -> pa.Array:
    pc, pv = split_sections(payload, meta["secs"])
    codes = dec_int(pc, meta["codes"])
    if values_decoder is None:
        values = dec_raw_str(pv, meta["values"])
    else:
        values = values_decoder(pv, meta["values"])
    return values.take(pa.array(codes))
