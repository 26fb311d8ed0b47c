"""Codec unit tests: encode→decode == identity on adversarial blocks.

Mirrors the reference's round-trip test strategy (tests/test_integration.py
asserts exact array equality column-by-column via libsonata; here the
assertion is Arrow-array equality per codec). FIXTURES.md §1 lists the
adversarial cases covered below.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcodec.codecs import decode_array, encode_array
from sparkcodec.codecs.primitives import (
    pack_uints,
    run_expand,
    run_split,
    unpack_uints,
)

rng = np.random.default_rng(42)

INT_CASES = {
    "empty": np.zeros(0, np.int64),
    "single": np.array([7], np.int64),
    "all_identical": np.full(1000, 42, np.int64),
    "all_distinct": np.arange(5000, dtype=np.int64),
    "runs": np.repeat(np.arange(50, dtype=np.int64), 100),
    "negative": rng.integers(-(2**40), 2**40, 3000).astype(np.int64),
    "full_range": np.array([-(2**63), 2**63 - 1, 0, -1, 1], np.int64),
    "long_run": np.repeat(np.int64(3), 70000),
    "small_nonneg": rng.integers(0, 16, 4000).astype(np.int64),
}

STR_CASES = {
    "empty": [],
    "single": ["hello"],
    "empty_strings": ["", "", ""],
    "all_identical": ["same"] * 500,
    "low_card": [f"lang{i % 7}" for i in range(2000)],
    "runs": sum(([f"v{i}"] * 37 for i in range(30)), []),
    "all_distinct": [f"path/to/file_{i}.py" for i in range(3000)],
    "non_ascii": ["héllo wörld", "日本語テキスト", "emoji 🎉🎊", "", "mixed é日🎉"] * 50,
    "over_255_symbols": [bytes([i % 256, (i * 7) % 256]).decode("latin1") for i in range(1000)],
    "big": ["def f():\n    return 42\n" * 200] * 20,
    "code_like": [
        "import numpy as np\n\ndef main(argv):\n    return np.sum(argv)\n" * (i % 9 + 1)
        for i in range(300)
    ],
}


def _roundtrip(arr: pa.Array, spec: str):
    payload, meta = encode_array(arr, spec)
    assert isinstance(payload, bytes)
    import json

    json.dumps(meta)  # meta must stay JSON-serializable
    out = decode_array(payload, meta)
    assert out.cast(arr.type).equals(arr), f"{spec} mismatch"
    return payload, meta


@pytest.mark.parametrize("case", list(INT_CASES))
@pytest.mark.parametrize("spec", ["raw", "for", "rle", "for+zlib", "rle+zlib"])
def test_int_roundtrip(case, spec):
    vals = INT_CASES[case]
    _roundtrip(pa.array(vals, type=pa.int64()), spec)


@pytest.mark.parametrize("case", ["all_identical", "runs", "small_nonneg", "empty"])
def test_bitpack_roundtrip(case):
    _roundtrip(pa.array(INT_CASES[case], type=pa.int64()), "bitpack")


def test_bitpack_rejects_negative():
    with pytest.raises(ValueError):
        encode_array(pa.array([-1, 2], type=pa.int64()), "bitpack")


@pytest.mark.parametrize("t", [pa.int8(), pa.int16(), pa.int32(), pa.uint16(), pa.date32()])
def test_narrow_int_types(t):
    vals = [0, 1, 2, 100, 127]
    _roundtrip(pa.array(vals, type=t), "for")
    _roundtrip(pa.array(vals, type=t), "rle")


def test_timestamp_roundtrip():
    arr = pa.array([1, 2, 3, 10**15], type=pa.timestamp("us"))
    _roundtrip(arr, "for")


def test_bool_roundtrip():
    arr = pa.array([True, False, True, True] * 100, type=pa.bool_())
    _roundtrip(arr, "rle")
    _roundtrip(arr, "bitpack")


@pytest.mark.parametrize("t", [pa.float32(), pa.float64()])
def test_float_roundtrip(t):
    arr = pa.array(rng.normal(size=1000), type=t)
    _roundtrip(arr, "raw")
    _roundtrip(arr, "raw+zlib")


@pytest.mark.parametrize("case", list(STR_CASES))
@pytest.mark.parametrize("spec", ["raw", "dict", "fsst", "fsst+zlib", "dict+zlib"])
def test_string_roundtrip(case, spec):
    arr = pa.array(STR_CASES[case], type=pa.string())
    _roundtrip(arr, spec)


def test_binary_roundtrip():
    blobs = [bytes(rng.integers(0, 256, n, dtype=np.uint8)) for n in [0, 1, 100, 5000]]
    arr = pa.array(blobs, type=pa.binary())
    for spec in ["raw", "fsst", "dict"]:
        _roundtrip(arr, spec)


def test_nulls_roundtrip():
    arr = pa.array([1, None, 3, None, 5], type=pa.int64())
    _roundtrip(arr, "for")
    sarr = pa.array(["a", None, "c"], type=pa.string())
    _roundtrip(sarr, "dict")
    _roundtrip(sarr, "fsst")


def test_dict_compresses_low_cardinality():
    arr = pa.array([f"lang{i % 5}" for i in range(10000)])
    p_dict, _ = encode_array(arr, "dict")
    p_raw, _ = encode_array(arr, "raw")
    assert len(p_dict) < len(p_raw) / 10


def test_rle_compresses_runs():
    arr = pa.array(np.repeat(np.arange(10, dtype=np.int64), 10000), type=pa.int64())
    p_rle, _ = encode_array(arr, "rle")
    p_raw, _ = encode_array(arr, "raw")
    assert len(p_rle) < len(p_raw) / 100


def test_fsst_compresses_code():
    text = "def function_name(argument):\n    return argument + 1\n" * 40
    arr = pa.array([text] * 50)
    p, meta = encode_array(arr, "fsst")
    p_raw, _ = encode_array(arr, "raw")
    assert meta["inner" if "inner" in meta else "c"]
    assert len(p) < len(p_raw) / 2, (len(p), len(p_raw))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=300))
def test_int_roundtrip_property(xs):
    arr = pa.array(np.array(xs, dtype=np.int64) if xs else np.zeros(0, np.int64), type=pa.int64())
    for spec in ["for", "rle"]:
        payload, meta = encode_array(arr, spec)
        assert decode_array(payload, meta).equals(arr)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=200), max_size=100))
def test_string_roundtrip_property(xs):
    arr = pa.array(xs, type=pa.string())
    for spec in ["dict", "fsst", "raw"]:
        payload, meta = encode_array(arr, spec)
        assert decode_array(payload, meta).cast(pa.string()).equals(arr)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(0, 2**50), min_size=0, max_size=200),
    st.integers(1, 64),
)
def test_pack_uints_property(xs, extra_w):
    vals = np.array(xs, dtype=np.uint64)
    w = max(int(vals.max()).bit_length() if len(vals) else 0, 1)
    w = min(max(w, extra_w % 64 + 1), 64)
    if len(vals) and int(vals.max()).bit_length() > w:
        vals = vals >> np.uint64(64 - w)
    buf = pack_uints(vals, w)
    out = unpack_uints(buf, len(vals), w)
    assert np.array_equal(out, vals)


def test_run_split_expand():
    vals = np.array([5, 5, 5, 2, 2, 9], dtype=np.int64)
    rv, rl = run_split(vals)
    assert rv.tolist() == [5, 2, 9] and rl.tolist() == [3, 2, 1]
    assert np.array_equal(run_expand(rv, rl), vals)


def test_fsst_adversarial_corners():
    """Escape-valued bytes, full byte alphabet, segment-boundary tokens,
    cross-corpus table reuse, 255-symbol serialization boundary."""
    from sparkcodec.codecs.fsst import SymbolTable, build_table
    from sparkcodec.codecs.kernels import string_parts

    cases = [
        pa.array([bytes([255]) * 100, bytes([255, 65]) * 50, b"A" + bytes([255]) * 7], pa.binary()),
        pa.array([bytes(range(256)) * 10] * 5, pa.binary()),
        pa.array(["ab" * 2000, "xyz" * 1000]),
        pa.array(["Q" * 512, "R" * 1024, "S" * 511, "T" * 513]),
        pa.array(["日本語" * 300, "🎉" * 200, "é" * 999]),
        pa.array(["", "data" * 100] * 50),
    ]
    for arr in cases:
        _roundtrip(arr, "fsst")

    # table built on one corpus must stay correct on unrelated bytes
    a = pa.array(["def foo(): pass\n" * 50] * 100)
    lens, blob = string_parts(a)
    table = build_table(lens, blob)
    b = pa.array(
        [bytes(rng.integers(0, 256, 500, dtype=np.uint8)).decode("latin1") for _ in range(100)]
    )
    payload, meta = encode_array(b, "fsst", fsst_table=table)
    assert decode_array(payload, meta).cast(b.type).equals(b)

    # 255-symbol serialization boundary
    syms = [bytes([i]) for i in range(247)] + [
        b"abcdefgh", b"xy", b"zw", b"qqq", b"rrrr", b"ss", b"tt", b"uu",
    ]
    t = SymbolTable(syms)
    t2 = SymbolTable.from_bytes(*t.to_bytes())
    assert t2.symbols == t.symbols and t2.sha == t.sha


def test_dict_high_cardinality():
    big = pa.array([f"path/{i:06d}/" + "x" * (i % 50) for i in range(70000)])
    _roundtrip(big, "dict")


def test_uint64_full_range_roundtrip():
    vals = pa.array([0, 1, 2**63, 2**64 - 1, 12345], type=pa.uint64())
    for spec in ("for", "rle", "raw"):
        _roundtrip(vals, spec)


# ---------------------------------------------------------------------------
# delta codec


@pytest.mark.parametrize("case", list(INT_CASES))
def test_delta_roundtrip(case):
    _roundtrip(pa.array(INT_CASES[case], type=pa.int64()), "delta")


def test_delta_beats_for_on_timestamps():
    # wide absolute range, tiny gaps: delta's home turf
    base = 1_700_000_000_000_000
    vals = base + np.cumsum(rng.integers(0, 1000, 50000))
    p_delta, _ = encode_array(pa.array(vals, type=pa.int64()), "delta")
    p_for, _ = encode_array(pa.array(vals, type=pa.int64()), "for")
    assert len(p_delta) < len(p_for) / 2


def test_delta_full_range_wraparound():
    vals = np.array([2**63 - 1, -(2**63), 0, 2**63 - 1, -1], np.int64)
    _roundtrip(pa.array(vals, type=pa.int64()), "delta")


# ---------------------------------------------------------------------------
# ALP float codec


ALP_CASES = {
    "prices": np.round(rng.uniform(0, 10000, 5000), 2),
    "quantities": rng.integers(1, 51, 5000).astype(np.float64),
    "percentages": np.round(rng.uniform(0, 0.1, 5000), 4),
    "mixed_decimals": np.concatenate(
        [np.round(rng.uniform(0, 100, 1000), 2), rng.normal(size=50)]
    ),
    "true_reals": rng.normal(size=2000),
    "empty": np.zeros(0, np.float64),
    "single": np.array([3.14], np.float64),
    "all_zero": np.zeros(1000, np.float64),
    "huge": np.array([1e300, -1e300, 1e-300, 0.25], np.float64),
}


@pytest.mark.parametrize("case", list(ALP_CASES))
@pytest.mark.parametrize("spec", ["alp", "alp+zlib"])
def test_alp_roundtrip(case, spec):
    _roundtrip(pa.array(ALP_CASES[case], type=pa.float64()), spec)


def test_alp_special_values_bit_exact():
    vals = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1.25, -7.5], np.float64)
    payload, meta = encode_array(pa.array(vals, type=pa.float64()), "alp")
    out = np.asarray(decode_array(payload, meta).to_numpy(zero_copy_only=False))
    assert np.array_equal(out.view(np.int64), vals.view(np.int64)), "not bit-exact"


def test_alp_float32():
    vals = np.round(rng.uniform(0, 100, 3000), 2).astype(np.float32)
    payload, meta = encode_array(pa.array(vals, type=pa.float32()), "alp")
    out = np.asarray(decode_array(payload, meta).to_numpy(zero_copy_only=False))
    assert np.array_equal(out.view(np.int32), vals.view(np.int32))


def test_alp_compresses_decimals():
    vals = np.round(rng.uniform(0, 1000, 50000), 2)  # 2-decimal prices
    arr = pa.array(vals, type=pa.float64())
    p_alp, m = encode_array(arr, "alp")
    p_raw, _ = encode_array(arr, "raw")
    assert len(p_alp) < len(p_raw) / 2, (len(p_alp), len(p_raw))
    assert m["e"] == 2


def test_alp_factor_strips_trailing_zeros():
    # values like 1200.00, 3400.00 — e=2 scaling then factor 10^2 divides out
    vals = (rng.integers(1, 100, 10000) * 100).astype(np.float64)
    p_f, m = encode_array(pa.array(vals, type=pa.float64()), "alp")
    assert m["f"] >= 1
    _roundtrip(pa.array(vals, type=pa.float64()), "alp")


def test_alp_nulls():
    arr = pa.array([1.25, None, 3.5, None, 0.75], type=pa.float64())
    _roundtrip(arr, "alp")


# ---------------------------------------------------------------------------
# selector routing for the measured-pick layer


def test_selector_picks_delta_for_timestamps():
    from sparkcodec.select import choose_codec

    base = 1_700_000_000_000_000
    vals = base + np.cumsum(rng.integers(0, 1000, 20000))
    spec, _ = choose_codec(pa.array(vals, type=pa.int64()))
    assert spec.split("+")[0] in {"delta", "rle"}, spec
    # and the pick must actually be the smallest of the plain candidates
    chosen, _ = encode_array(pa.array(vals, type=pa.int64()), spec.split("+")[0])
    alt, _ = encode_array(pa.array(vals, type=pa.int64()), "for")
    assert len(chosen) <= len(alt)


def test_selector_picks_alp_for_decimals():
    from sparkcodec.select import choose_codec

    vals = np.round(rng.uniform(0, 1000, 20000), 2)
    spec, _ = choose_codec(pa.array(vals, type=pa.float64()))
    assert spec.split("+")[0] == "alp", spec


def test_selector_keeps_fsst_for_code_content():
    """Regression: auto-seg on the tiny selection sample must not bias the
    measured ratio against FSST (it once flipped content to raw+zlib)."""
    from sparkcodec.select import choose_codec
    from sparkcodec.tables import code_files_arrow

    t = code_files_arrow(2000, seed=7)
    spec, tab = choose_codec(t.column("content").combine_chunks())
    assert spec.split("+")[0] == "fsst", spec
    assert tab is not None


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, allow_subnormal=True, width=64),
        max_size=300,
    )
)
def test_alp_roundtrip_property(xs):
    """ALP must be bit-exact on arbitrary doubles (NaN payloads,
    infinities, subnormals, -0.0 — everything)."""
    vals = np.array(xs, dtype=np.float64)
    from sparkcodec.codecs.alp import dec_alp, enc_alp

    payload, meta = enc_alp(vals)
    import json

    out = dec_alp(payload, json.loads(json.dumps(meta)))
    assert np.array_equal(out.view(np.int64), vals.view(np.int64))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, allow_subnormal=True, width=32),
        max_size=200,
    )
)
def test_alp_f32_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.float32)
    from sparkcodec.codecs.alp import dec_alp, enc_alp

    payload, meta = enc_alp(vals)
    out = dec_alp(payload, meta)
    assert np.array_equal(out.view(np.int32), vals.view(np.int32))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=300))
def test_delta_roundtrip_property(xs):
    from sparkcodec.codecs.kernels import dec_delta, enc_delta

    vals = np.array(xs, dtype=np.int64)
    payload, meta = enc_delta(vals)
    out = dec_delta(payload, meta)
    assert np.array_equal(out, vals)


def test_selector_skips_fsst_for_random_bytes():
    """Near-random columns (base64 of compressed/encrypted payloads:
    ~6.0 bits/byte vs <4.9 for real code/text) must not pay an FSST
    table build that cannot win."""
    import base64

    from sparkcodec.select import candidates_for, choose_codec, column_stats

    blob_rows = [
        base64.b64encode(bytes(rng.integers(0, 256, 600).astype(np.uint8))).decode()
        for _ in range(500)
    ]
    arr = pa.array(blob_rows)
    stats = column_stats(arr)
    assert stats["byte_entropy"] > 5.9, stats["byte_entropy"]
    cands = candidates_for(stats)
    assert not any(c.startswith("fsst") for c in cands), cands
    spec, tab = choose_codec(arr)
    assert spec.split("+")[0] == "raw" and tab is None


def test_delta_collapses_constant_stride():
    # regular timestamps: every gap identical -> RLE inside delta -> O(1)
    vals = 1_700_000_000_000_000 + np.arange(100000, dtype=np.int64) * 1000
    p, m = encode_array(pa.array(vals, type=pa.int64()), "delta")
    assert len(p) < 128, len(p)
    _roundtrip(pa.array(vals, type=pa.int64()), "delta")


def test_native_fsst_matches_numpy_bit_for_bit():
    """The compiled FSST kernel and the numpy wavefront implement the
    same match policy: codes, exceptions, and decode output must be
    bit-identical on text, structured strings, and escape-heavy data.
    Skipped silently only where no C toolchain exists (the numpy path is
    the permanent fallback)."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from sparkcodec.codecs import _native
    from sparkcodec.codecs.fsst import build_table, decode_to_blob, encode_with_table
    from sparkcodec.codecs.kernels import string_parts

    if _native.lib() is None:
        pytest.skip("no native kernel on this host")
    rng = np.random.default_rng(7)
    corpora = [
        ["def f(x):\n    return x + 1\n" * 40] * 50,          # code-like
        [f"src/pkg/module_{i}.py" for i in range(500)],        # paths
        [bytes(rng.integers(0, 256, 512, dtype=np.uint8)) for _ in range(64)],  # escapes
        ["", "a", "ab" * 1000, "\x00" * 99],                   # edges
    ]
    for rows in corpora:
        typ = pa.large_binary() if isinstance(rows[0], bytes) else pa.string()
        arr = pa.array(rows, type=typ)
        lens, blob = string_parts(arr)
        tab = build_table(lens, blob)
        c_nat, e_nat = encode_with_table(lens, blob, tab)
        orig = _native.lib
        _native.lib = lambda: None
        try:
            c_np, e_np = encode_with_table(lens, blob, tab)
            d_np = decode_to_blob(c_nat, e_nat, tab)
        finally:
            _native.lib = orig
        assert np.array_equal(c_nat, c_np) and np.array_equal(e_nat, e_np)
        assert np.array_equal(decode_to_blob(c_nat, e_nat, tab), blob)
        assert np.array_equal(d_np, blob)
