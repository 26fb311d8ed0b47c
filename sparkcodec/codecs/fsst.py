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

from . import _native
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
        "hsym",
        "hlen",
        "hcode",
        "hmask",
        "max_len",
        "symlen_u8",
        "sym_cols",
        "lit_u8",
        "sym8",
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
        # fused O(1) direct-index table over the 2-byte prefix; one uint16
        # gather answers every question the hot loop asks:
        #   bits 0..7   code of the best 1/2-byte match (escape default)
        #   bits 8..9   its length (1 or 2)
        #   bit  10     gate: some >=3-byte symbol starts with this prefix
        # uint16 suffices (code 8 bits + len 2 + gate 1) and halves the
        # memory traffic of the full-width tab12 gather in the encoder
        t12 = (lit.astype(np.uint16) | (1 << 8))[np.tile(np.arange(256), 256)]
        self.tab12 = np.ascontiguousarray(t12)
        if self.keys[2].size:
            self.tab12[self.keys[2].astype(np.int64)] = self.codes[2].astype(np.uint16) | (2 << 8)
        self.max_len = 1
        for L in range(2, MAX_SYM_LEN + 1):
            if self.keys[L].size:
                self.max_len = L
        # single-candidate hash tables for >=3-byte symbols (the FSST-paper
        # encode structure, doubled): slot 0 of `hsym`/`hlen`/`hcode` pairs
        # is keyed by the 5-byte prefix (long symbols), slot 1 by the
        # 3-byte prefix (the fallback for short symbols and long symbols
        # whose 5-prefix slot was taken). Each slot holds the full
        # zero-padded symbol word, its length and code, so a position pays
        # exactly one probe per table:
        #   match iff (word_at_pos & mask[hlen[slot]]) == hsym[slot].
        # Symbols are inserted longest-first (code order breaks ties); a
        # symbol colliding in both tables simply goes unused by the
        # encoder — a tiny ratio cost, never a correctness one (decode
        # reads the table by code, not by hash).
        hbits = 12
        hsize = 1 << hbits
        hs = [np.full(hsize, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64) for _ in range(2)]
        hl = [np.zeros(hsize, dtype=np.uint8) for _ in range(2)]
        hc = [np.zeros(hsize, dtype=np.uint8) for _ in range(2)]
        long_syms = sorted(
            ((code, s) for code, s in enumerate(symbols) if len(s) >= 3),
            key=lambda cs: (-len(cs[1]), cs[0]),
        )
        for code, s in long_syms:
            pref2 = int.from_bytes(s[:2], "little")
            self.tab12[pref2] |= np.uint16(1 << 10)
            word = int.from_bytes(s.ljust(8, b"\x00"), "little")
            for ti, klen in ((0, 5), (1, 3)):
                if len(s) < klen:
                    continue
                key = int.from_bytes(s[:klen], "little")
                slot = (key * 0x9E3779B97F4A7C15 % (1 << 64)) >> (64 - hbits)
                if hl[ti][slot] == 0:
                    hs[ti][slot] = word
                    hl[ti][slot] = len(s)
                    hc[ti][slot] = code
                    break
        self.hsym = hs
        self.hlen = hl
        self.hcode = hc
        # per-slot match mask (= _MASKS[hlen]) precomputed so the probe
        # pays one uint64 gather instead of a length gather + mask gather
        self.hmask = [_MASKS[hl[ti]] for ti in range(2)]
        # decode-side column-major symbol bytes: sym_cols[j][code] is byte j
        # of the symbol (zero beyond its length) — the per-length scatter
        # decode gathers one column at a time, no repeat/arange index build
        sym2d = np.zeros((256, MAX_SYM_LEN), dtype=np.uint8)
        for code, s in enumerate(symbols):
            sym2d[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        self.sym_cols = [np.ascontiguousarray(sym2d[:, j]) for j in range(MAX_SYM_LEN)]
        self.symlen_u8 = self.symlen.astype(np.uint8)
        # native-kernel views: row-major 256x8 symbol bytes and the
        # literal fallback as uint8 (ESC is 255, so the cast is exact)
        self.sym8 = np.ascontiguousarray(sym2d)
        self.lit_u8 = lit.astype(np.uint8)
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

    # native kernel when available: the SAME greedy longest-match policy
    # over the SAME tables, as a scalar C loop (the per-token data
    # dependency that forces the numpy path into full-width vector
    # passes is free in C) — bit-identical output, ~10x faster; any
    # compile/load failure falls through to the numpy path below
    if _native.lib() is not None:
        out = np.empty(n_bytes, dtype=np.uint8)
        exc = np.empty(n_bytes, dtype=np.uint8)
        n, ne = _native.encode(pad, n_bytes, seg_start, seg_end, table, out, exc)
        return out[:n], exc[:ne]

    # 2-byte little-endian prefix at every position, built in one streaming
    # pass: each position's match lookup is then a single gather
    w16 = pad[:-1].astype(np.uint16)
    w16 |= pad[1:].astype(np.uint16) << np.uint16(8)

    tab12 = table.tab12
    hsym, hlen, hcode = table.hsym, table.hlen, table.hcode
    hmask = table.hmask
    any_long = bool(hlen[0].any() or hlen[1].any())
    GATE = np.uint16(1 << 10)
    hmul = np.uint64(0x9E3779B97F4A7C15)
    hshift = np.uint64(64 - 12)
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

    def _words_at(pos: np.ndarray) -> np.ndarray:
        if w64 is not None:
            return w64[pos]
        wc = pad[pos].astype(np.uint64)
        for j in range(1, MAX_SYM_LEN):
            wc |= pad[pos + j].astype(np.uint64) << shifts[j]
        return wc

    def _probe_long(w: np.ndarray, rem: np.ndarray | None):
        """Best >=3-byte symbol match for each word: one probe per table
        (5-byte-prefix table first, 3-byte-prefix fallback), longest wins.
        Returns (code, length) with length 0 where nothing matched (or
        nothing matched within ``rem``)."""
        ln = np.zeros(len(w), dtype=np.uint8)
        code = np.zeros(len(w), dtype=np.uint8)
        # 5-table first; a hit there is FINAL: any longer candidate shares
        # the position's 5-byte prefix, and the slot holds the longest
        # symbol with that prefix (longest-first insertion), so only the
        # miss subset ever pays the 3-table probe. Slots stay uint64 (a
        # valid numpy index type — the int64 astype would be a full extra
        # pass) and the per-slot match MASK is gathered directly.
        slot = ((w & _MASKS[5]) * hmul) >> hshift
        ok = (w & hmask[0][slot]) == hsym[0][slot]
        if rem is not None:
            ok &= hlen[0][slot] <= rem
        hit = np.flatnonzero(ok)
        if hit.size:
            sh = slot[hit]
            ln[hit] = hlen[0][sh]
            code[hit] = hcode[0][sh]
        miss = np.flatnonzero(ln == 0)
        if miss.size:
            wm = w[miss]
            slot = ((wm & _MASKS[3]) * hmul) >> hshift
            ok = (wm & hmask[1][slot]) == hsym[1][slot]
            if rem is not None:
                ok &= hlen[1][slot] <= rem[miss]
            hit = np.flatnonzero(ok)
            if hit.size:
                sh = slot[hit]
                tgt = miss[hit]
                ln[tgt] = hlen[1][sh]
                code[tgt] = hcode[1][sh]
        return code, ln

    # ---- phase 1: longest match (code, len) at EVERY byte position, in a
    # handful of full-width vectorized passes (the parse loop then touches
    # each cursor with two gathers instead of re-running the match search
    # per wavefront iteration). Longer lengths overwrite shorter ones, so
    # the result is the greedy longest match, same as the per-cursor search.
    t = tab12[w16[:n_bytes]]
    best_code = (t & 0xFF).astype(np.uint8)
    best_len = ((t >> 8) & 0x3).astype(np.uint8)
    if any_long:
        cand_all = np.flatnonzero(t >= GATE)
        if cand_all.size:
            lcode, llen = _probe_long(_words_at(cand_all), None)
            hit = np.flatnonzero(llen)
            if hit.size:
                tgt = cand_all[hit]
                best_code[tgt] = lcode[hit]
                best_len[tgt] = llen[hit]

    # ---- phase 2: clamp matches that would cross a segment boundary.
    # Only the last <=7 positions of each segment can overshoot; refit
    # those to the longest symbol that FITS (identical to the rem-gated
    # search the wavefront used to run per cursor).
    win_lo = np.maximum(seg_start, seg_end - (MAX_SYM_LEN - 1))
    wlens = seg_end - win_lo
    wtot = int(wlens.sum())
    if wtot:
        woff = np.zeros(total_segs, dtype=np.int64)
        np.cumsum(wlens[:-1], out=woff[1:])
        tail_idx = np.repeat(win_lo, wlens) + (
            np.arange(wtot, dtype=np.int64) - np.repeat(woff, wlens)
        )
        rem_t = np.repeat(seg_end, wlens) - tail_idx
        bad = np.flatnonzero(best_len[tail_idx] > rem_t)
        if bad.size:
            p = tail_idx[bad]
            rem = rem_t[bad]
            t_f = t[p]
            code = (t_f & 0xFF).astype(np.uint8)
            ln = ((t_f >> 8) & 0x3).astype(np.uint8)
            two_bad = np.flatnonzero((ln == 2) & (rem < 2))
            if two_bad.size:
                pb = p[two_bad]
                code[two_bad] = table.lit_code[blob[pb]].astype(np.uint8)
                ln[two_bad] = 1
            if any_long:
                lcode, llen = _probe_long(_words_at(p), rem)
                hit = np.flatnonzero(llen)
                if hit.size:
                    code[hit] = lcode[hit]
                    ln[hit] = llen[hit]
            best_code[p] = code
            best_len[p] = ln

    # ---- phase 3: wavefront parse. One cursor per segment advancing in
    # lockstep; every iteration is now two gathers + one scatter (the match
    # table is precomputed), so per-iteration numpy overhead is flat.
    # One output code per token and tokens consume >=1 byte, so each
    # segment's region [seg_start, seg_end) can never overflow; escaped raw
    # bytes live in the parallel `exc` buffer at the same positions.
    out = np.empty(n_bytes, dtype=np.uint8)
    exc = np.empty(n_bytes, dtype=np.uint8)
    final_ptr = seg_start.copy()
    out_base = seg_start

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
            bc = best_code[cur_a]
            out[ptr_a] = bc
            escaped = np.flatnonzero(bc == ESC)
            if escaped.size:
                exc[ptr_a[escaped]] = blob[cur_a[escaped]]
            ptr_a += 1
            cur_a += best_len[cur_a]
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
    """Vectorized expansion of a code stream back to the original bytes.

    Tokens are grouped by symbol length (<= 8 groups); each group writes
    its bytes with L column-wise scatters from the code-indexed symbol
    byte columns — no giant repeat/arange gather index is ever built."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, np.uint8)
    if _native.lib() is not None:
        total = int(table.symlen_u8[codes].sum(dtype=np.int64))
        out = np.empty(total + MAX_SYM_LEN, dtype=np.uint8)
        wrote = _native.decode(
            np.ascontiguousarray(codes), np.ascontiguousarray(exceptions),
            table, out,
        )
        if wrote == total:  # belt and braces; mismatch -> numpy path
            return out[:total]
    lens = table.symlen_u8[codes]
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lens[:-1], dtype=np.int64, out=starts[1:])
    total = int(starts[-1]) + int(lens[-1])
    sym_cols = table.sym_cols
    if int(lens[0]) == 1 and total == n:
        # all 1-byte tokens: one straight gather
        out = sym_cols[0][codes]
    else:
        # one stable radix argsort groups tokens by length (cheaper than a
        # mask+flatnonzero scan per distinct length)
        order = np.argsort(lens, kind="stable")
        slens = lens[order]
        # cuts[L-1]:cuts[L] is the slice of length-L tokens in `order`
        cuts = np.searchsorted(slens, np.arange(1, MAX_SYM_LEN + 2))
        out = np.empty(total, dtype=np.uint8)
        for L in range(1, MAX_SYM_LEN + 1):
            lo, hi = int(cuts[L - 1]), int(cuts[L])
            if hi == lo:
                continue
            sel = order[lo:hi]
            pos = starts[sel]
            cc = codes[sel]
            for j in range(L):
                out[pos + j] = sym_cols[j][cc]
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
