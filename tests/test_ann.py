"""Persisted ANN index (sparkcodec.ann): build → pruned probe →
extend → tag-pinned version reads, and parity with the in-plan IVF."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_ANN_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def test_persisted_probe_matches_in_plan_ivf(spark, emb, tmp_path):
    """The persisted-index probe returns exactly the in-plan IVF
    result (same centroids, same candidates, same scores) — the two
    paths are interchangeable, so the oracle that verifies one
    verifies the other."""
    from sparkcodec.ann import ann_topk, build_ann_index
    from sparkcodec.queries import _IVF_K, _IVF_SEED_BASE, q_ann_ivf_topk

    idx = str(tmp_path / "idx")
    build_ann_index(spark, emb, idx, k=_IVF_K, seed_base=_IVF_SEED_BASE)
    got = [(r["vec_id"], r["cos"], r["rnk"]) for r in
           ann_topk(spark, emb, idx, query_id=0).collect()]
    want = [(r["vec_id"], r["cos"], r["rnk"]) for r in
            q_ann_ivf_topk(spark, SF).collect()]
    assert got == want


def test_probe_is_pruned_not_full_scan(spark, emb, tmp_path):
    """Probing opens only the parts whose value sets hold a probed
    cluster id — the pruned decode keeps strictly fewer parts than the
    index has, and the kept rows are exactly the probed clusters'."""
    from sparkcodec import engine
    from sparkcodec.ann import (
        ann_index_params,
        build_ann_index,
        probe_postings,
        query_clusters,
    )

    idx = str(tmp_path / "idx")
    build_ann_index(spark, emb, idx, k=8, seed_base=100)
    params = ann_index_params(idx)
    qv = emb.filter("vec_id = 0").select("embedding").head()[0]
    probes = query_clusters(qv, params["k"], params["seed_base"], nprobe=2)
    assert len(probes) == 2 and probes[0] != probes[1]

    live = engine.snapshot_parts(idx)
    kept = engine.prune_parts_eq(idx, "cluster", probes, live)
    assert 0 < len(kept) < len(live), (kept, live)

    got = {r["vec_id"] for r in probe_postings(spark, idx, probes).collect()}
    full = engine.decode_table(spark, idx)
    want = {r["vec_id"] for r in
            full.filter(F.col("cluster").isin(probes)).collect()}
    assert got == want and got  # exact membership, non-empty


def test_extend_and_tag_pin_versions(spark, emb, tmp_path):
    """extend_ann_index appends postings for NEW vectors only (no
    rebuild); a tag cut before the extend keeps answering with the
    old postings set even after the index grows and history beyond the
    tag is expired."""
    from sparkcodec import engine
    from sparkcodec.ann import (
        ann_index_params,
        ann_topk,
        build_ann_index,
        extend_ann_index,
    )

    idx = str(tmp_path / "idx")
    old = emb.filter("vec_id < 300")
    build_ann_index(spark, old, idx, k=8, seed_base=100, tag="v1")
    n_old = engine.decode_table(spark, idx).count()
    assert n_old == old.count()

    extend_ann_index(spark, emb.filter("vec_id >= 300"), idx)
    assert engine.decode_table(spark, idx).count() == emb.count()
    assert len(engine.snapshots(idx)) == 2  # append, not rebuild
    assert ann_index_params(idx) == ann_index_params(idx, ref="v1")

    pinned = [(r["vec_id"], r["cos"]) for r in
              ann_topk(spark, emb, idx, query_id=0, ref="v1").collect()]
    tip = [(r["vec_id"], r["cos"]) for r in
           ann_topk(spark, emb, idx, query_id=0).collect()]
    assert all(v < 300 for v, _ in pinned)
    assert {v for v, _ in tip} - {v for v, _ in pinned}  # tip sees new ids

    # tagged version survives retention (dataset-versioning posture)
    engine.expire_snapshots(idx, keep_last=1)
    again = [(r["vec_id"], r["cos"]) for r in
             ann_topk(spark, emb, idx, query_id=0, ref="v1").collect()]
    assert again == pinned


def test_params_required(spark, emb, tmp_path):
    """A plain table is refused as an index — the probe path never
    guesses centroid parameters."""
    from sparkcodec import engine
    from sparkcodec.ann import ann_index_params

    out = str(tmp_path / "plain")
    engine.encode_table(
        spark, emb.select("vec_id"), out, cluster_by=["vec_id"],
        salt_by=["vec_id"], num_parts=2, resume=False,
    )
    with pytest.raises(ValueError, match="ann"):
        ann_index_params(out)
