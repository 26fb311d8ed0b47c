"""Tests for the binary record source (S1-S3 parity), multimodal
plumbing, and streaming operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkcodec.binsource import (
    decode_record_bytes,
    parse_header,
    read_records,
    synthesize_records,
    write_record_file,
)


@pytest.fixture(scope="module")
def record_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("records")
    r1 = synthesize_records(500, version=1, seed=1)
    r2 = synthesize_records(300, version=2, seed=2)
    r2_swapped = synthesize_records(200, version=2, seed=3)
    write_record_file(str(d / "touches_v1.bin"), r1, version=1)
    write_record_file(str(d / "touches_v2.bin"), r2, version=2)
    write_record_file(str(d / "touches_v2_be.bin"), r2_swapped, version=2, big_endian=True)
    return d, r1, r2, r2_swapped


def test_header_and_decode_roundtrip(record_dir):
    d, r1, _r2, _ = record_dir
    raw = (d / "touches_v1.bin").read_bytes()
    arch, version, count = parse_header(raw)
    assert (version, count) == (1, 500)
    pdf = decode_record_bytes(raw)
    assert len(pdf) == 500
    assert np.array_equal(pdf["pre_gid"].to_numpy(), r1["pre_gid"])
    assert np.array_equal(pdf["distance_soma"].to_numpy(), r1["distance_soma"])
    assert pdf["branch_type"].isna().all()  # V1 lacks V2 columns


def test_endianness_swap(record_dir):
    """S3: a foreign-endian file decodes to identical values."""
    d, _r1, _r2, r2s = record_dir
    pdf = decode_record_bytes((d / "touches_v2_be.bin").read_bytes())
    assert np.array_equal(pdf["pre_gid"].to_numpy(), r2s["pre_gid"])
    assert np.allclose(pdf["spine_length"].to_numpy(), r2s["spine_length"])


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_record_bytes(b"XXXX" + b"\x00" * 32)


def test_distributed_scan(spark, record_dir):
    """S1: binaryFile scan + vectorized decode across all versions."""
    d, r1, r2, r2s = record_dir
    df = read_records(spark, str(d) + "/*.bin")
    assert df.count() == 1000
    by_ver = {r["version"]: r["n"] for r in df.groupBy("version").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_ver == {1: 500, 2: 500}
    # checksum parity against local decode (vectorized both sides)
    got = df.agg(F.sum("pre_gid").alias("s")).collect()[0]["s"]
    want = int(r1["pre_gid"].sum() + r2["pre_gid"].sum() + r2s["pre_gid"].sum())
    assert got == want


def test_synapse_id_on_records(spark, record_dir):
    """P3 applied to the decoded scan (the touch2parquet derive step)."""
    from sparkcodec.pipeline import with_synapse_id

    d, *_ = record_dir
    df = read_records(spark, str(d) + "/touches_v1.bin")
    out = with_synapse_id(df, "pre_gid", ["source_file", "post_gid"])
    row = out.filter(F.col("synapse_id") % (1 << 24) == 0).count()
    n_gids = df.select("pre_gid").distinct().count()
    assert row == n_gids  # exactly one seq-0 row per gid


# ---------------------------------------------------------------------------
# multimodal


def test_multimodal_features(spark):
    from sparkcodec.multimodal import extract_features, synth_media_df

    media = synth_media_df(spark, 60)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        expect = r["width"] * r["height"] * r["channels"] * r["n_frames"]
        assert r["payload_bytes"] == expect + 16  # header is 16 bytes
    kinds = {r["kind"] for r in rows}
    assert kinds == {"img", "aud", "vid"}


def test_multimodal_frame_sampling(spark):
    from sparkcodec.multimodal import extract_features, sample_frames, synth_media_df

    media = synth_media_df(spark, 60)
    before = {r["media_id"]: r["n_frames"] for r in extract_features(media).collect()}
    sampled = sample_frames(media, every_k=2)
    after = {r["media_id"]: r["n_frames"] for r in extract_features(sampled).collect()}
    for mid, nf in before.items():
        assert after[mid] == (nf + 1) // 2 if nf > 1 else 1


def test_multimodal_resize_is_stubbed(spark):
    from sparkcodec.multimodal import resize_images, synth_media_df

    media = synth_media_df(spark, 4)
    with pytest.raises(Exception, match="(?i)pillow|NotImplemented"):
        resize_images(media, 8, 8).collect()


def test_real_decode_unimplemented():
    from sparkcodec.multimodal import decode_header

    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 24)


# ---------------------------------------------------------------------------
# streaming


def test_windowed_stream_matches_batch(spark):
    from sparkcodec.streaming import events_stream, run_stream_to_memory, windowed_event_counts

    sf = "/root/testdata/sf0.001"
    agg = windowed_event_counts(events_stream(spark, sf))
    got = run_stream_to_memory(spark, agg, "win_counts")
    batch = spark.read.parquet(f"{sf}/events.parquet")
    want = (
        batch.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n_events", "total_value")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sessionize_stream(spark):
    from sparkcodec.streaming import events_stream, run_stream_to_memory, sessionize

    sf = "/root/testdata/sf0.001"
    sess = sessionize(events_stream(spark, sf), gap="30 minutes")
    got = run_stream_to_memory(spark, sess, "sessions")
    assert got.count() > 0
    assert got.agg(F.sum("n_events")).collect()[0][0] == spark.read.parquet(
        f"{sf}/events.parquet"
    ).count()
