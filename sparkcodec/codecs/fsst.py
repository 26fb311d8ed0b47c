"""FSST-style symbol-table string compression (FSST, VLDB 2020 — PAPERS.md).

From-scratch design for vectorized execution (no per-row Python):

* **Table build** — BPE-style iterative pair merging over a bounded sample
  (string-boundary aware), producing ≤255 symbols of 1..8 bytes. The table
  is built once per (partition, column) and reused across blocks; its
  sha256 goes into block meta / lineage (north rule: "per-partition
  255-symbol tables built in a sampling pass").
* **Encode** — greedy longest-match, vectorized as a *wavefront*: one
  cursor per fixed-size segment (segments never straddle string
  boundaries), each iteration matches all active cursors at once via
  ``searchsorted`` over per-length symbol-prefix integer tables and emits
  one output code per cursor. Output code 255 is an escape; escaped raw
  bytes go to an out-of-band exception stream so the code stream stays
  one byte per token and decode stays branch-free.
* **Decode** — pure gather/expand: per-code symbol lengths → cumulative
  offsets → one fancy-indexing pass reconstructs the full blob, then the
  FoR-packed original string lengths split it back into rows.

The reference has no string compression (strings appear only as '@library'
dictionary values, src/circuit/sonata_writer.cpp:110-119); FSST is the
north-rule codec that makes the `content` column competitive.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .primitives import pack_sections, split_sections
from .kernels import dec_for, enc_for, string_parts, strings_from_parts

ESC = 255  # output code reserved for escaped literal bytes
MAX_SYMBOLS = 255  # codes 0..254 are symbols
MAX_SYM_LEN = 8
SENTINEL = np.uint32(0xFFFF)  # never a valid code during table build

_MASKS = np.array([(1 << (8 * L)) - 1 for L in range(9)], dtype=np.uint64)


class SymbolTable:
    """Immutable symbol table: `symbols` is a list of 1..8-byte bytestrings."""

    __slots__ = (
        "symbols",
        "symdata",
        "symlen",
        "symoff",
        "keys",
        "codes",
        "lit_code",
        "sha",
        "tab12",
        "hkeys",
        "hcodes",
        "hprobe",
        "max_len",
    )

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        # decode-side flat layout; slot ESC holds a 1-byte dummy for the
        # branch-free gather (overwritten by the exception stream)
        lens = [len(s) for s in symbols] + [1] * (256 - len(symbols))
        data = b"".join(symbols) + b"\x00" * (256 - len(symbols))
        self.symdata = np.frombuffer(data, dtype=np.uint8)
        self.symlen = np.array(lens, dtype=np.int64)
        off = np.zeros(257, dtype=np.int64)
        np.cumsum(self.symlen, out=off[1:])
        self.symoff = off[:256]
        # encode-side: per-length sorted prefix-integer tables
        self.keys = [np.zeros(0, dtype=np.uint64) for _ in range(MAX_SYM_LEN + 1)]
        self.codes = [np.zeros(0, dtype=np.uint16) for _ in range(MAX_SYM_LEN + 1)]
        by_len: dict[int, list[tuple[int, int]]] = {}
        lit = np.full(256, ESC, dtype=np.uint16)
        for code, s in enumerate(symbols):
            if len(s) == 1:
                lit[s[0]] = code
            else:
                key = int.from_bytes(s, "little")
                by_len.setdefault(len(s), []).append((key, code))
        self.lit_code = lit
        for L, pairs in by_len.items():
            pairs.sort()
            self.keys[L] = np.array([k for k, _ in pairs], dtype=np.uint64)
            self.codes[L] = np.array([c for _, c in pairs], dtype=np.uint16)
        # fused O(1) direct-index table over the 2-byte prefix; one int32
        # gather answers every question the hot loop asks:
        #   bits 0..7   code of the best 1/2-byte match (escape default)
        #   bits 8..9   its length (1 or 2)
        #   bits 10..15 per-length gate: bit 10+L-3 set iff some L-byte
        #               symbol (L=3..8) starts with this 2-byte prefix
        t12 = (lit.astype(np.int32) | (1 << 8))[np.tile(np.arange(256), 256)]
        self.tab12 = np.ascontiguousarray(t12)
        if self.keys[2].size:
            self.tab12[self.keys[2].astype(np.int64)] = self.codes[2].astype(np.int32) | (2 << 8)
        # per-length open-addressing hash tables for >=3-byte symbols
        hbits = 11
        hsize = 1 << hbits
        self.hkeys = [None] * (MAX_SYM_LEN + 1)
        self.hcodes = [None] * (MAX_SYM_LEN + 1)
        self.hprobe = [0] * (MAX_SYM_LEN + 1)
        self.max_len = 1
        for L in range(2, MAX_SYM_LEN + 1):
            if self.keys[L].size:
                self.max_len = L
        for L in range(3, MAX_SYM_LEN + 1):
            if not self.keys[L].size:
                continue
            pref2 = (self.keys[L] & np.uint64(0xFFFF)).astype(np.int64)
            self.tab12[pref2] |= np.int32(1 << (10 + L - 3))
            hk = np.full(hsize, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
            hc = np.zeros(hsize, dtype=np.int64)
            maxp = 1
            for key, code in zip(self.keys[L], self.codes[L]):
                h = int((int(key) * 0x9E3779B97F4A7C15) % (1 << 64)) >> (64 - hbits)
                p = 0
                while hk[(h + p) & (hsize - 1)] != np.uint64(0xFFFFFFFFFFFFFFFF):
                    p += 1
                hk[(h + p) & (hsize - 1)] = key
                hc[(h + p) & (hsize - 1)] = code
                maxp = max(maxp, p + 1)
            self.hkeys[L] = hk
            self.hcodes[L] = hc
            self.hprobe[L] = maxp
        self.sha = hashlib.sha256(
            b"\x00".join(symbols) + len(symbols).to_bytes(2, "little")
        ).hexdigest()

    def to_bytes(self) -> tuple[bytes, bytes]:
        """(concatenated symbol bytes, per-symbol length bytes)."""
        return b"".join(self.symbols), bytes(len(s) for s in self.symbols)

    @classmethod
    def from_bytes(cls, symdata: bytes, symlens: bytes) -> "SymbolTable":
        out, off = [], 0
        for L in symlens:
            out.append(symdata[off : off + L])
            off += L
        return cls(out)


def _merge_pass(seq: np.ndarray, a: int, b: int, new_code: int) -> np.ndarray:
    """One BPE merge: replace non-overlapping (a,b) adjacencies with new_code."""
    m = (seq[:-1] == a) & (seq[1:] == b)
    idx = np.flatnonzero(m)
    if idx.size == 0:
        return seq
    if a == b:
        # overlapping matches only possible for equal pairs: keep alternate
        # matches within each run of consecutive match positions
        run_break = np.diff(idx, prepend=idx[0] - 2) > 1
        lab = np.cumsum(run_break) - 1
        run_first = idx[np.flatnonzero(run_break)]
        keep = ((idx - run_first[lab]) % 2) == 0
        idx = idx[keep]
    seq[idx] = new_code
    delete = np.zeros(len(seq), dtype=bool)
    delete[idx + 1] = True
    return seq[~delete]


def build_table(
    lens: np.ndarray,
    blob: np.ndarray,
    sample_bytes: int = 1 << 16,
    max_strings: int = 256,
    min_pair_count: int = 4,
    max_merges: int = 200,
) -> SymbolTable:
    """Build a symbol table from a sample of the block's strings.

    Sampling is deterministic: evenly strided rows, each row truncated so
    the total stays under ``sample_bytes``.
    """
    n = len(lens)
    if n == 0 or len(blob) == 0:
        return SymbolTable([])
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    nonempty = np.flatnonzero(lens > 0)
    if nonempty.size == 0:
        return SymbolTable([])
    take = nonempty[:: max(1, len(nonempty) // max_strings)][:max_strings]
    per_str_cap = max(64, sample_bytes // max(1, len(take)))
    pieces = []
    total = 0
    for i in take:
        if total >= sample_bytes:
            break
        m = min(int(lens[i]), per_str_cap, sample_bytes - total)
        pieces.append(blob[starts[i] : starts[i] + m].astype(np.uint32))
        pieces.append(np.array([SENTINEL], dtype=np.uint32))
        total += m
    seq = np.concatenate(pieces)

    # literal symbols: every distinct byte gets a code; if all 256 byte
    # values occur, the rarest ones lose their slot and will be escaped
    counts = np.bincount(blob[: 1 << 22], minlength=256)
    present = np.flatnonzero(counts > 0)
    if present.size > MAX_SYMBOLS - 8:
        keep = np.argsort(counts)[::-1][: MAX_SYMBOLS - 8]
        present = np.sort(keep[counts[keep] > 0])
    symbols: list[bytes] = [bytes([b]) for b in present]
    sym_of_code: dict[int, bytes] = {int(b): bytes([b]) for b in present}
    next_code = 256
    budget = min(MAX_SYMBOLS - len(symbols), max_merges)

    # batched BPE: count pair frequencies once per round, then apply up to
    # 16 symbol-disjoint merges from that count (disjoint symbols -> their
    # occurrence counts don't interfere), recount next round. ~16x fewer
    # sort-based counting passes than merge-at-a-time BPE for the same table.
    seen = set(symbols)
    while budget > 0:
        keys = (seq[:-1].astype(np.uint64) << np.uint64(32)) | seq[1:].astype(np.uint64)
        valid = (seq[:-1] != SENTINEL) & (seq[1:] != SENTINEL)
        uniq, counts = np.unique(keys[valid], return_counts=True)
        if uniq.size == 0:
            break
        order = np.argsort(counts)[::-1]
        batch: list[tuple[int, int, bytes]] = []
        used: set[int] = set()
        for k in order[:64]:
            if counts[k] < min_pair_count or len(batch) >= 16 or len(batch) >= budget:
                break
            a = int(uniq[k] >> np.uint64(32))
            b = int(uniq[k] & np.uint64(0xFFFFFFFF))
            if a in used or b in used:
                continue
            sa, sb = sym_of_code.get(a), sym_of_code.get(b)
            if sa is None or sb is None or len(sa) + len(sb) > MAX_SYM_LEN:
                continue
            batch.append((a, b, sa + sb))
            used.update((a, b))
        if not batch:
            break
        for a, b, merged in batch:
            if merged not in seen:
                symbols.append(merged)
                seen.add(merged)
                budget -= 1
            sym_of_code[next_code] = merged
            seq = _merge_pass(seq, a, b, next_code)
            next_code += 1

    return SymbolTable(symbols)


def encode_with_table(
    lens: np.ndarray,
    blob: np.ndarray,
    table: SymbolTable,
    seg: int | None = None,
    tile_bytes: int = 1 << 24,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match encode; returns (codes uint8, exceptions uint8).

    Wavefront execution: one cursor per segment, all segments advance in
    lockstep; matches never cross a segment (hence never a string) boundary.

    The wavefront is *tiled*: segments run in groups whose blob span fits
    in cache (``tile_bytes``; 16 MB measured best on this host — smaller
    tiles shrink the wavefront until numpy per-call overhead dominates,
    larger ones make every per-token gather a cache miss over the whole
    block).

    ``seg`` trades iteration count against match quality: iterations per
    tile ~ seg, wavefront width ~ min(blob, tile)/seg, and a match can't
    cross a segment boundary. Smaller segs are measurably faster on
    few-MB blocks (+35% at 128) but DON'T do it: boundary phase shifts
    re-tokenize repeated text differently, and the downstream zlib page
    pass loses its long LZ77 matches (+22% encoded bytes at 128 vs 512
    on the code corpus, vs only +1.5% pre-zlib). 512 is the ratio-safe
    default at every block size.
    """
    n_bytes = len(blob)
    if n_bytes == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.uint8)
    if seg is None:
        seg = 512
    # segment table: split each string into <=seg-byte pieces
    nseg_per = np.maximum((lens + seg - 1) // seg, 0).astype(np.int64)
    total_segs = int(nseg_per.sum())
    str_starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=str_starts[1:])
    seg_str = np.repeat(np.arange(len(lens)), nseg_per)
    first_seg_of_str = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(nseg_per, out=first_seg_of_str[1:])
    within = np.arange(total_segs, dtype=np.int64) - first_seg_of_str[seg_str]
    seg_start = str_starts[seg_str] + within * seg
    seg_end = np.minimum(seg_start + seg, str_starts[seg_str + 1])

    pad = np.zeros(n_bytes + MAX_SYM_LEN, dtype=np.uint8)
    pad[:n_bytes] = blob
    # 2-byte little-endian prefix at every position, built in one streaming
    # pass: the hot loop then needs a single gather per cursor instead of
    # two byte gathers plus shift/or passes
    w16 = pad[:-1].astype(np.uint16)
    w16 |= pad[1:].astype(np.uint16) << np.uint16(8)
    # one output code per token and tokens consume >=1 byte, so each
    # segment's region [seg_start, seg_end) can never overflow; escaped raw
    # bytes live in the parallel `exc` buffer at the same positions
    out = np.empty(n_bytes, dtype=np.uint8)
    exc = np.empty(n_bytes, dtype=np.uint8)
    final_ptr = seg_start.copy()
    out_base = seg_start

    tab12 = table.tab12
    hkeys, hcodes, hprobe = table.hkeys, table.hcodes, table.hprobe
    any_long = any(k is not None for k in hkeys)
    GATE = np.int32(1 << 10)
    hmask = np.int64((1 << 11) - 1)
    hmul = np.uint64(0x9E3779B97F4A7C15)
    hshift = np.uint64(64 - 11)
    shifts = [np.uint64(8 * j) for j in range(MAX_SYM_LEN)]
    # unaligned uint64 view over pad: w64[i] = 8 little-endian bytes at i,
    # so long-symbol word assembly is ONE gather instead of seven (x86 and
    # arm64 both allow unaligned loads; big-endian hosts take the loop)
    little = __import__("sys").byteorder == "little"
    w64 = (
        np.ndarray((n_bytes,), dtype=np.uint64, buffer=pad, strides=(1,))
        if little and n_bytes
        else None
    )

    # tile boundaries: segments are start-ordered, so a searchsorted over
    # multiples of tile_bytes yields contiguous same-span groups
    n_tiles = max(1, -(-n_bytes // tile_bytes))
    cuts = np.searchsorted(seg_start, np.arange(1, n_tiles, dtype=np.int64) * tile_bytes)
    bounds = np.concatenate(([0], cuts, [total_segs]))
    for ti in range(len(bounds) - 1):
        lo, hi = int(bounds[ti]), int(bounds[ti + 1])
        if lo >= hi:
            continue
        sl = slice(lo, hi)
        alive0 = lo + np.flatnonzero(seg_start[sl] < seg_end[sl])
        cur_a = seg_start[alive0].copy()
        end_a = seg_end[alive0].copy()
        ptr_a = seg_start[alive0].copy()
        seg_a = alive0
        while cur_a.size:
            # fused lookup: one w16 gather + one tab12 gather yield
            # code | len<<8 | long-symbol-gate<<16
            t = tab12[w16[cur_a]]
            rem = end_a - cur_a
            best_code = t & 0xFF
            best_len = (t >> 8) & 0x3
            if any_long:
                cand = np.flatnonzero((t >= GATE) & (rem >= 3))
                if cand.size:
                    cpos = cur_a[cand]
                    if w64 is not None:
                        wc = w64[cpos]
                    else:
                        wc = pad[cpos].astype(np.uint64)
                        for j in range(1, MAX_SYM_LEN):
                            wc |= pad[cpos + j].astype(np.uint64) << shifts[j]
                    remc = rem[cand]
                    tc = t[cand]
                    for L in range(3, MAX_SYM_LEN + 1):
                        hk = hkeys[L]
                        if hk is None:
                            continue
                        # per-length gate: probe only cursors whose 2-byte
                        # prefix starts some L-byte symbol
                        sub = np.flatnonzero((tc >> (10 + L - 3)) & 1)
                        if not sub.size:
                            continue
                        pref = wc[sub] & _MASKS[L]
                        h = ((pref * hmul) >> hshift).astype(np.int64)
                        remL = remc[sub]
                        for probe in range(hprobe[L]):
                            slot = (h + probe) & hmask
                            hit = np.flatnonzero((hk[slot] == pref) & (remL >= L))
                            if hit.size:
                                tgt = cand[sub[hit]]
                                best_code[tgt] = hcodes[L][slot[hit]]
                                best_len[tgt] = L
            # a 2-byte match may straddle the segment end (words look past
            # it): downgrade those to the 1-byte literal
            over = np.flatnonzero(best_len > rem)
            if over.size:
                best_code[over] = table.lit_code[blob[cur_a[over]]]
                best_len[over] = 1
            out[ptr_a] = best_code.astype(np.uint8)
            escaped = np.flatnonzero(best_code == ESC)
            if escaped.size:
                exc[ptr_a[escaped]] = blob[cur_a[escaped]]
            ptr_a += 1
            cur_a += best_len
            done = cur_a >= end_a
            if done.any():
                final_ptr[seg_a[done]] = ptr_a[done]
                keep = ~done
                cur_a, end_a, ptr_a, seg_a = (
                    cur_a[keep], end_a[keep], ptr_a[keep], seg_a[keep],
                )

    # compact per-segment regions
    out_lens = final_ptr - out_base
    total = int(out_lens.sum())
    if total == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.uint8)
    pref = np.zeros(total_segs, dtype=np.int64)
    np.cumsum(out_lens[:-1], out=pref[1:])
    idx = np.repeat(out_base, out_lens) + (np.arange(total, dtype=np.int64) - np.repeat(pref, out_lens))
    codes = out[idx]
    exceptions = exc[idx][codes == ESC]
    return codes, exceptions


def decode_to_blob(codes: np.ndarray, exceptions: np.ndarray, table: SymbolTable) -> np.ndarray:
    """Vectorized expansion of a code stream back to the original bytes."""
    if len(codes) == 0:
        return np.zeros(0, np.uint8)
    c = codes.astype(np.int64)
    lens = table.symlen[c]
    total = int(lens.sum())
    starts = np.zeros(len(c), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # idx[j] = symoff[code] + (j - token_start): one repeat + one arange
    idx = np.repeat(table.symoff[c] - starts, lens) + np.arange(total, dtype=np.int64)
    out = table.symdata[idx]
    esc_pos = starts[codes == ESC]
    out[esc_pos] = exceptions
    return out


# ---------------------------------------------------------------------------
# block-level codec interface (payload, meta) — table travels inside the
# payload so every block stays independently decodable; the per-partition
# caller passes the same prebuilt table for all its blocks.


def enc_fsst(arr: pa.Array, table: SymbolTable | None = None) -> tuple[bytes, dict]:
    lens, blob = string_parts(arr)
    if table is None:
        table = build_table(lens, blob)
    codes, exceptions = encode_with_table(lens, blob, table)
    symdata, symlens = table.to_bytes()
    p_lens, m_lens = enc_for(lens)
    payload, secs = pack_sections(
        [symdata, symlens, codes.tobytes(), exceptions.tobytes(), p_lens]
    )
    meta = {
        "c": "fsst",
        "n": len(arr),
        "secs": secs,
        "lens": m_lens,
        "nsym": len(table.symbols),
        "sth": table.sha[:16],
    }
    return payload, meta


_TABLE_CACHE: dict[str, SymbolTable] = {}


def dec_fsst(payload: bytes, meta: dict) -> pa.Array:
    symdata, symlens, codes_b, exc_b, p_lens = split_sections(payload, meta["secs"])
    # every block of a partition ships the same table (enc_fsst encodes
    # them with one prebuilt per-partition table) but rebuilds its
    # encode-side hash structures on decode — ~10% of the decode wall.
    # Cache by the content hash stamped in the meta, verified against
    # THIS payload's symbol bytes so a stale or colliding entry can
    # never decode with the wrong table (the compare is a few hundred
    # bytes; the rebuild it skips is the expensive part).
    sth = meta.get("sth")
    table = _TABLE_CACHE.get(sth) if sth else None
    if table is None or table.to_bytes() != (symdata, symlens):
        table = SymbolTable.from_bytes(symdata, symlens)
        if sth:
            if len(_TABLE_CACHE) > 256:
                _TABLE_CACHE.clear()
            _TABLE_CACHE[sth] = table
    codes = np.frombuffer(codes_b, dtype=np.uint8)
    exceptions = np.frombuffer(exc_b, dtype=np.uint8)
    blob = decode_to_blob(codes, exceptions, table)
    lens = dec_for(p_lens, meta["lens"])
    return strings_from_parts(lens, blob)
