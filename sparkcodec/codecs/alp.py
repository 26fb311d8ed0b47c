"""ALP-style lossless float compression (ALP, SIGMOD 2024 — PAPERS.md).

From-scratch simplified scheme for decimal-heavy float columns (prices,
quantities, measurements): pick a power-of-ten exponent ``e`` on a sample,
encode each value as the integer ``I = round(v * 10^e)`` when the decode
arithmetic ``float64(I) / 10^e`` reproduces the value **bit-exactly**,
divide out a common factor ``10^f`` from the integers, and FoR/bit-pack
the result. Values that don't round-trip (true reals, NaN/inf, -0.0,
out-of-range) go to an out-of-band exception stream stored raw.

Self-verifying by construction: the encoder runs the exact decoder
arithmetic to classify exceptions, so decode is always bit-identical.

The reference stores floats raw (fixed f32/f64 columns,
src/touches/touch_defs.h:33-50); ALP is the codec that makes decimal
float columns competitive, complementing the north-rule five.
"""

from __future__ import annotations

import numpy as np

from .kernels import dec_for, enc_for
from .primitives import pack_sections, split_sections

_MAX_E = 15  # 10^15 < 2^53: scaled integers stay exactly representable
_I_CAP = float(1 << 53)


def _classify(v64: np.ndarray, e: int, f32: bool) -> tuple[np.ndarray, np.ndarray]:
    """(scaled int64 with 0 at exceptions, bool exact-mask) for exponent e."""
    sc = np.float64(10.0**e)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = np.round(v64 * sc)
    ok = np.isfinite(scaled) & (np.abs(scaled) < _I_CAP)
    ints = np.where(ok, scaled, 0.0).astype(np.int64)
    # run the decoder's own arithmetic; bit equality (via int views) also
    # rejects -0.0 -> 0.0 and NaN payload changes
    if f32:
        recon = (ints.astype(np.float64) / sc).astype(np.float32)
        exact = ok & (recon.view(np.int32) == v64.astype(np.float32).view(np.int32))
    else:
        recon = ints.astype(np.float64) / sc
        exact = ok & (recon.view(np.int64) == v64.view(np.int64))
    ints[~exact] = 0
    return ints, exact


def _pick_e(v64: np.ndarray, f32: bool) -> int:
    """Choose the exponent minimizing estimated encoded bytes on a sample."""
    sample = v64[:: max(1, len(v64) // 4096)][:4096]
    best_e, best_cost = 0, None
    for e in range(_MAX_E + 1):
        ints, exact = _classify(sample, e, f32)
        n_exc = int((~exact).sum())
        if exact.any():
            spread = int(ints.max()) - int(ints.min())
            bits = max(1, spread.bit_length())
        else:
            bits = 0
        cost = n_exc * (12 if f32 else 16) + bits * len(sample) / 8
        if best_cost is None or cost < best_cost:
            best_e, best_cost = e, cost
        if n_exc == 0:
            # larger e can only widen the integers once everything is exact
            break
    return best_e


def enc_alp(vals: np.ndarray) -> tuple[bytes, dict]:
    """Encode a float32/float64 block; returns (payload, meta)."""
    f32 = vals.dtype == np.float32
    v64 = vals.astype(np.float64) if f32 else np.asarray(vals, dtype=np.float64)
    n = len(v64)
    if n == 0:
        payload, secs = pack_sections([b"", b"", b""])
        return payload, {"c": "alp", "n": 0, "e": 0, "f": 0, "secs": secs,
                         "d": {"c": "for", "n": 0, "w": 0, "f": 0},
                         "xi": {"c": "for", "n": 0, "w": 0, "f": 0},
                         "ft": "f32" if f32 else "f64"}
    e = _pick_e(v64, f32)
    ints, exact = _classify(v64, e, f32)
    exc_idx = np.flatnonzero(~exact)
    exc_vals = (vals if not f32 else np.asarray(vals, dtype=np.float32))[exc_idx]
    # divide out a common power of ten (ALP's "factor"): trailing decimal
    # zeros are free bits
    f = 0
    nz = ints[exact]
    nz = nz[nz != 0]
    while f < _MAX_E and nz.size and (nz % 10 == 0).all():
        nz = nz // 10
        ints = ints // 10
        f += 1
    p_ints, m_ints = enc_for(ints)
    p_xi, m_xi = enc_for(exc_idx.astype(np.int64))
    payload, secs = pack_sections([p_ints, p_xi, exc_vals.tobytes()])
    return payload, {
        "c": "alp", "n": n, "e": e, "f": f, "secs": secs,
        "d": m_ints, "xi": m_xi, "ft": "f32" if f32 else "f64",
    }


def dec_alp(payload: bytes, meta: dict) -> np.ndarray:
    fdt = np.float32 if meta["ft"] == "f32" else np.float64
    if meta["n"] == 0:
        return np.zeros(0, dtype=fdt)
    p_ints, p_xi, exc_b = split_sections(payload, meta["secs"])
    ints = dec_for(p_ints, meta["d"])
    if meta["f"]:
        ints = ints * (10 ** meta["f"])
    sc = np.float64(10.0 ** meta["e"])
    out64 = ints.astype(np.float64) / sc
    out = out64.astype(np.float32) if meta["ft"] == "f32" else out64
    exc_idx = dec_for(p_xi, meta["xi"])
    if len(exc_idx):
        out[exc_idx] = np.frombuffer(exc_b, dtype=fdt)
    return out
