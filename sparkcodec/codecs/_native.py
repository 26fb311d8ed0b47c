"""Optional native FSST kernel (ctypes + cc), with automatic fallback.

The FSST token loop is inherently sequential per segment (each token's
start depends on the previous token's length), which caps the numpy
wavefront implementation at ~20 MB/s/core — every position pays several
full-width vector passes (see fsst.py). The same greedy loop in C is a
few branches per token over the SAME tables the Python side builds
(tab12, the two single-candidate prefix hash tables, the decode symbol
rows), so this module compiles a ~100-line C file once per host into
``$TMPDIR/sparkcodec_native_<sha>.so`` and binds it with ctypes.

Properties:

- **Bit-identical output** to the numpy path (asserted in
  tests/test_codecs.py): both implement the identical match policy —
  2-byte direct table, gate bit, 5-byte-prefix candidate first (a hit
  is final), 3-byte-prefix fallback, longest-that-fits at segment
  tails, escape byte 255.
- **Zero hard dependency**: any failure here (no cc, sandboxed tmp,
  dlopen error) makes ``lib()`` return None and callers fall back to
  the numpy path. The compile is guarded by an atomic rename so
  concurrent Spark workers race safely; the .so is content-addressed by
  the C source hash.
- ctypes releases the GIL during calls.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>
#include <string.h>

#define ESC 255u
#define HMUL 0x9E3779B97F4A7C15ULL
#define MASK3 0xFFFFFFULL
#define MASK5 0xFFFFFFFFFFULL

static inline uint64_t load64(const uint8_t *p) {
    uint64_t w;
    memcpy(&w, p, 8);
    return w;  /* little-endian hosts only; the Python side gates on that */
}

/* Greedy FSST encode of one blob split into segments.
 * pad: blob bytes with >=8 zero bytes of padding after n_bytes.
 * Returns the number of output codes; *n_exc gets the escape count. */
long fsst_encode(const uint8_t *pad, long n_bytes,
                 const int64_t *seg_start, const int64_t *seg_end, long n_segs,
                 const uint16_t *tab12, const uint8_t *lit_code,
                 const uint64_t *hsym0, const uint64_t *hmask0,
                 const uint8_t *hlen0, const uint8_t *hcode0,
                 const uint64_t *hsym1, const uint64_t *hmask1,
                 const uint8_t *hlen1, const uint8_t *hcode1,
                 uint8_t *out, uint8_t *exc, long *n_exc) {
    long o = 0, e = 0;
    (void)n_bytes;
    for (long s = 0; s < n_segs; s++) {
        long p = seg_start[s];
        const long end = seg_end[s];
        while (p < end) {
            const long rem = end - p;
            const uint16_t t = tab12[(uint16_t)(pad[p] | (pad[p + 1] << 8))];
            unsigned code = t & 0xFFu;
            long len = (t >> 8) & 0x3u;
            if ((t & 0x400u) && rem >= 3) {
                const uint64_t w = load64(pad + p);
                uint64_t slot = ((w & MASK5) * HMUL) >> 52;
                if ((w & hmask0[slot]) == hsym0[slot] && hlen0[slot] <= rem) {
                    code = hcode0[slot];
                    len = hlen0[slot];
                } else {
                    slot = ((w & MASK3) * HMUL) >> 52;
                    if ((w & hmask1[slot]) == hsym1[slot] && hlen1[slot] <= rem) {
                        code = hcode1[slot];
                        len = hlen1[slot];
                    }
                }
            }
            if (len > rem) {  /* 2-byte direct match straddling the end */
                code = lit_code[pad[p]];
                len = 1;
            }
            out[o] = (uint8_t)code;
            if (code == ESC)
                exc[e++] = pad[p];
            o++;
            p += len;
        }
    }
    *n_exc = e;
    return o;
}

/* Expand a code stream; sym8 is 256 rows of 8 zero-padded symbol bytes.
 * out must have >=8 bytes of slack after the true total. Returns bytes
 * written (excluding slack). */
long fsst_decode(const uint8_t *codes, long n, const uint8_t *exc,
                 const uint8_t *sym8, const uint8_t *symlen, uint8_t *out) {
    long o = 0, e = 0;
    for (long i = 0; i < n; i++) {
        const unsigned c = codes[i];
        if (c == ESC) {
            out[o++] = exc[e++];
        } else {
            memcpy(out + o, sym8 + 8u * c, 8);
            o += symlen[c];
        }
    }
    return o;
}
"""

_LIB = None
_TRIED = False


def lib():
    """The compiled kernel, or None when unavailable (callers fall back)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    import sys

    if sys.byteorder != "little":
        return None
    try:
        h = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(
            tempfile.gettempdir(), f"sparkcodec_native_{h}.so"
        )
        if not os.path.exists(so_path):
            tmp_c = so_path + f".{os.getpid()}.c"
            tmp_so = so_path + f".{os.getpid()}.tmp"
            with open(tmp_c, "w") as f:
                f.write(_C_SRC)
            try:
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", tmp_so, tmp_c],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp_so, so_path)  # atomic: racing workers agree
            finally:
                for p in (tmp_c, tmp_so):
                    try:
                        os.remove(p)
                    except OSError:
                        pass
        cdll = ctypes.CDLL(so_path)
        cdll.fsst_encode.restype = ctypes.c_long
        cdll.fsst_decode.restype = ctypes.c_long
        _LIB = cdll
    except Exception:
        _LIB = None
    return _LIB


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def encode(pad, n_bytes, seg_start, seg_end, table, out, exc):
    """ctypes binding; returns (n_codes, n_exc). Arrays must be
    C-contiguous with the dtypes the kernel expects (fsst.py guarantees
    this by construction)."""
    cdll = lib()
    n_exc = ctypes.c_long(0)
    n = cdll.fsst_encode(
        _ptr(pad, ctypes.c_uint8), ctypes.c_long(int(n_bytes)),
        _ptr(seg_start, ctypes.c_int64), _ptr(seg_end, ctypes.c_int64),
        ctypes.c_long(len(seg_start)),
        _ptr(table.tab12, ctypes.c_uint16), _ptr(table.lit_u8, ctypes.c_uint8),
        _ptr(table.hsym[0], ctypes.c_uint64), _ptr(table.hmask[0], ctypes.c_uint64),
        _ptr(table.hlen[0], ctypes.c_uint8), _ptr(table.hcode[0], ctypes.c_uint8),
        _ptr(table.hsym[1], ctypes.c_uint64), _ptr(table.hmask[1], ctypes.c_uint64),
        _ptr(table.hlen[1], ctypes.c_uint8), _ptr(table.hcode[1], ctypes.c_uint8),
        _ptr(out, ctypes.c_uint8), _ptr(exc, ctypes.c_uint8),
        ctypes.byref(n_exc),
    )
    return int(n), int(n_exc.value)


def decode(codes, exc, table, out):
    """ctypes binding; returns bytes written."""
    cdll = lib()
    return int(
        cdll.fsst_decode(
            _ptr(codes, ctypes.c_uint8), ctypes.c_long(len(codes)),
            _ptr(exc, ctypes.c_uint8),
            _ptr(table.sym8, ctypes.c_uint8),
            _ptr(table.symlen_u8, ctypes.c_uint8),
            _ptr(out, ctypes.c_uint8),
        )
    )
