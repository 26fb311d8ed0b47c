"""Typed block codec API: ``encode_array(arr, spec) -> (payload, meta)``.

Spec grammar: ``"<codec>"`` or ``"<codec>+<post>"`` where codec ∈
{raw, bitpack, for, rle, dict, fsst} and post ∈ {zlib, zlib1, zlib9,
lzma, lzma6} (page compression, see primitives.post_compress). ``"auto"``
is resolved upstream by :mod:`sparkcodec.select` — this layer only runs
concrete specs.

Every meta is a small JSON-safe dict; every payload is opaque bytes. Nulls
are carried as an extra FoR-packed null-index section (key ``"nulls"``),
so kernels only ever see dense values — mirroring how the reference keeps
validity out of its fixed-width record kernels entirely (its schemas are
non-nullable, src/touches/parquet_writer.cpp:21-102).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import alp as alp_mod
from . import fsst as fsst_mod
from .kernels import (
    dec_bitpack,
    dec_delta,
    dec_dict,
    dec_for,
    dec_raw_fixed,
    dec_raw_str,
    dec_rle,
    enc_bitpack,
    enc_delta,
    enc_dict,
    enc_for,
    enc_raw_fixed,
    enc_raw_str,
    enc_rle,
)
from .primitives import pack_sections, post_compress, post_decompress, split_sections

# ---------------------------------------------------------------------------
# logical type registry (the complete set we accept; cf. the reference's
# fixed cast matrix at src/circuit/sonata_writer.cpp:159-194)

_PA_BY_NAME = {
    "i8": pa.int8(),
    "i16": pa.int16(),
    "i32": pa.int32(),
    "i64": pa.int64(),
    "u8": pa.uint8(),
    "u16": pa.uint16(),
    "u32": pa.uint32(),
    "u64": pa.uint64(),
    "bool": pa.bool_(),
    "f32": pa.float32(),
    "f64": pa.float64(),
    "str": pa.string(),
    "lstr": pa.large_string(),
    "bin": pa.binary(),
    "lbin": pa.large_binary(),
    "date32": pa.date32(),
    "ts_us": pa.timestamp("us"),
    "ts_us_utc": pa.timestamp("us", tz="UTC"),
}
_NAME_BY_PA = {v: k for k, v in _PA_BY_NAME.items()}

_INT_LIKE = {
    "i8", "i16", "i32", "i64", "u8", "u16", "u32", "u64", "bool",
    "date32", "ts_us", "ts_us_utc",
}
_STR_LIKE = {"str", "lstr", "bin", "lbin"}
_FLOAT_LIKE = {"f32", "f64"}


def type_name(t: pa.DataType) -> str:
    try:
        return _NAME_BY_PA[t]
    except KeyError:
        raise TypeError(f"unsupported column type for sparkcodec: {t}") from None


def _to_int64(arr: pa.Array) -> np.ndarray:
    t = arr.type
    if pa.types.is_date32(t):
        arr = arr.view(pa.int32())
    elif pa.types.is_timestamp(t) or pa.types.is_uint64(t):
        # uint64: lossless int64 bijection via bit view (the reference's
        # unsigned->wider-signed matrix has no wider type for u64 either,
        # src/circuit/sonata_writer.cpp:159-194); FoR wrap-around math is
        # exact under the reinterpretation
        arr = arr.view(pa.int64())
    elif pa.types.is_boolean(t):
        return arr.to_numpy(zero_copy_only=False).astype(np.int64)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _from_int64(vals: np.ndarray, tname: str) -> pa.Array:
    target = _PA_BY_NAME[tname]
    a = pa.array(vals, type=pa.int64())
    if tname == "date32":
        return a.cast(pa.int32()).view(target)
    if tname.startswith("ts_") or tname == "u64":
        return a.view(target)
    if tname == "bool":
        return pa.array(vals.astype(bool))
    return a.cast(target)


# ---------------------------------------------------------------------------


def parse_spec(spec: str) -> tuple[str, str | None]:
    if "+" in spec:
        base, post = spec.split("+", 1)
        return base, post
    return spec, None


def encode_array(arr: pa.Array, spec: str, fsst_table=None) -> tuple[bytes, dict]:
    """Encode one Arrow array block with a concrete codec spec."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    base, post = parse_spec(spec)
    tname = type_name(arr.type)

    null_sec = b""
    null_meta = None
    if arr.null_count > 0:
        null_idx = np.flatnonzero(np.asarray(arr.is_null()))
        null_sec, null_meta = enc_for(null_idx)
        if tname in {"bin", "lbin"}:
            fill = b""
        elif tname in _STR_LIKE:
            fill = ""
        elif tname == "bool":
            fill = False
        else:
            fill = 0
        arr = arr.fill_null(fill)

    if tname in _STR_LIKE:
        if base == "raw":
            payload, meta = enc_raw_str(arr)
        elif base == "dict":
            payload, meta = enc_dict(arr)
        elif base == "fsst":
            payload, meta = fsst_mod.enc_fsst(arr, table=fsst_table)
        elif base == "rle":
            # RLE over strings == dict (codes collapse to runs); route there
            payload, meta = enc_dict(arr)
        else:
            raise ValueError(f"codec {base!r} not applicable to {tname}")
    elif tname in _INT_LIKE:
        vals = _to_int64(arr)
        if base == "raw":
            payload, meta = enc_raw_fixed(vals)
        elif base == "bitpack":
            payload, meta = enc_bitpack(vals)
        elif base == "for":
            payload, meta = enc_for(vals)
        elif base == "rle":
            payload, meta = enc_rle(vals)
        elif base == "delta":
            payload, meta = enc_delta(vals)
        elif base == "dict":
            # int dictionary = FoR over the sorted-unique table + codes;
            # for ints plain FoR/RLE is at least as good — route there
            payload, meta = enc_rle(vals)
        else:
            raise ValueError(f"codec {base!r} not applicable to {tname}")
    elif tname in _FLOAT_LIKE:
        if base == "alp":
            payload, meta = alp_mod.enc_alp(arr.to_numpy(zero_copy_only=False))
        elif base == "raw":
            payload, meta = enc_raw_fixed(arr.to_numpy(zero_copy_only=False))
        else:
            raise ValueError(f"floats support 'raw'/'alp' (+post); got {base!r}")
    else:  # pragma: no cover
        raise TypeError(tname)

    if null_meta is not None:
        payload, secs = pack_sections([null_sec, payload])
        meta = {"c": meta["c"], "outer_secs": secs, "nulls": null_meta, "inner": meta}

    payload, eff_post = post_compress(payload, post)
    meta["t"] = tname
    meta["n_rows"] = len(arr)
    if eff_post:
        meta["post"] = eff_post
    return payload, meta


def decode_array(payload: bytes, meta: dict) -> pa.Array:
    """Inverse of :func:`encode_array`; restores the exact Arrow type."""
    payload = post_decompress(payload, meta.get("post"))
    tname = meta["t"]

    null_idx = None
    inner = meta
    if "nulls" in meta:
        null_sec, payload = split_sections(payload, meta["outer_secs"])
        null_idx = dec_for(null_sec, meta["nulls"])
        inner = meta["inner"]

    c = inner["c"]
    if tname in _STR_LIKE:
        if c == "raw_str":
            out = dec_raw_str(payload, inner)
        elif c == "dict":
            out = dec_dict(payload, inner)
        elif c == "fsst":
            out = fsst_mod.dec_fsst(payload, inner)
        else:
            raise ValueError(c)
        target = _PA_BY_NAME[tname]
        if out.type != target:
            out = out.cast(target)
    elif tname in _INT_LIKE:
        if c == "raw":
            vals = dec_raw_fixed(payload, inner).astype(np.int64, copy=False)
        elif c == "bitpack":
            vals = dec_bitpack(payload, inner)
        elif c == "for":
            vals = dec_for(payload, inner)
        elif c == "rle":
            vals = dec_rle(payload, inner)
        elif c == "delta":
            vals = dec_delta(payload, inner)
        else:
            raise ValueError(c)
        out = _from_int64(np.asarray(vals), tname)
    elif tname in _FLOAT_LIKE:
        if c == "alp":
            out = pa.array(alp_mod.dec_alp(payload, inner), type=_PA_BY_NAME[tname])
        else:
            out = pa.array(dec_raw_fixed(payload, inner), type=_PA_BY_NAME[tname])
    else:  # pragma: no cover
        raise TypeError(tname)

    if null_idx is not None and len(null_idx):
        # restore nulls by attaching a validity bitmap directly — no
        # pandas round trip on the hot decode path; the decoded array is
        # freshly built (offset 0, no validity buffer), so buffers() is
        # [None, ...data buffers] and we can swap in our bitmap
        valid = np.ones(len(out), dtype=bool)
        valid[np.asarray(null_idx)] = False
        validity = pa.py_buffer(np.packbits(valid, bitorder="little"))
        out = pa.Array.from_buffers(
            out.type,
            len(out),
            [validity] + out.buffers()[1:],
            null_count=len(null_idx),
        )
    return out
