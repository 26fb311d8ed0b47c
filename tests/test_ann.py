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


def test_trained_quantizer_recall_gate(spark, emb, tmp_path):
    """build_ann_index(trained=True): sampled spherical k-means
    centroids persist in the ann snapshot block, the whole lifecycle
    (extend, probe) runs through the same code, and — the point of
    training — on CLUSTERED data (deterministic gaussian blobs; the
    regime real embeddings live in) recall@10 against the brute-force
    cosine top-10 beats the untrained LCG planes at the same probe
    budget."""
    import numpy as np

    from sparkcodec.ann import ann_index_params, ann_topk, build_ann_index

    rng = np.random.default_rng(7)
    k, dim, per = 8, 16, 250
    means = rng.normal(size=(k, dim)) * 4.0
    x = np.concatenate([
        means[j] + rng.normal(size=(per, dim)) for j in range(k)
    ])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    truth = set(
        np.argsort(-(xn @ xn[0]))[1:11].tolist()
    )  # brute-force cosine top-10 of vec 0 (excluding itself)
    blobs = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )

    def recall(idx_dir):
        got = {r["vec_id"] for r in
               ann_topk(spark, blobs, idx_dir, query_id=0, nprobe=2).collect()}
        return len(got & truth) / len(truth)

    lcg_idx, km_idx = str(tmp_path / "lcg"), str(tmp_path / "km")
    build_ann_index(spark, blobs, lcg_idx, k=k, seed_base=100)
    build_ann_index(spark, blobs, km_idx, k=k, seed_base=100, trained=True,
                    sample_rows=1024, iters=10)
    params = ann_index_params(km_idx)
    assert params["kind"] == "ivf_kmeans"
    assert len(params["centroids"]) == k
    r_lcg, r_km = recall(lcg_idx), recall(km_idx)
    assert r_km >= r_lcg, (r_km, r_lcg)
    assert r_km >= 0.9  # trained cells isolate the query's true blob

    # the trained index extends like any other: same centroids, append
    from sparkcodec.ann import extend_ann_index

    more = blobs.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    extend_ann_index(spark, more, km_idx)
    assert ann_index_params(km_idx)["centroids"] == params["centroids"]


def test_train_centroids_degenerate_sample(spark):
    """All-identical vectors must train (uniform seeding fallback), not
    crash k-means++ with a probability vector that does not sum to 1."""
    from pyspark.sql import functions as F

    from sparkcodec.ann import train_centroids

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0) for _ in range(4)]).alias("embedding"),
    )
    cents = train_centroids(spark, emb, 4, sample_rows=64)
    assert len(cents) == 4 and all(len(c) == 4 for c in cents)
