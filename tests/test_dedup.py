"""Dedup pipeline tests with planted exact and near duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcodec.dedup import (
    connected_components,
    exact_dedup,
    jaccard_verify,
    minhash_candidates,
    near_dedup,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        "def encode(values):\n    return [v * 2 for v in values]\n" * 8,
        "class Reader:\n    def __init__(self, path):\n        self.path = path\n" * 8,
        "import os\nfor f in os.listdir('.'):\n    print(f)\n" * 8,
        "SELECT key, count(*) FROM events GROUP BY key ORDER BY 2 DESC\n" * 8,
    ]
    rows = []
    k = 0
    for i, text in enumerate(base):
        rows.append((k, text)); k += 1                      # original
        rows.append((k, text)); k += 1                      # exact dup
        rows.append((k, text[:-10] + "# changed\n")); k += 1  # near dup
    for j in range(20):  # unrelated unique docs
        rows.append((k, f"unique document {j} with its own words {j*7} " * 10)); k += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs, "text", "doc_id")
    # 4 exact dups removed
    assert out.count() == docs.count() - 4
    # survivors are the smallest doc_id of each dup pair
    kept = {r["doc_id"] for r in out.collect()}
    assert 0 in kept and 1 not in kept


def test_minhash_candidates_find_planted_pairs(docs):
    cands = minhash_candidates(docs, "text", "doc_id")
    pairs = {(r["key_a"], r["key_b"]) for r in cands.collect()}
    for base_id in (0, 3, 6, 9):
        assert (base_id, base_id + 1) in pairs  # exact dup pair
        assert (base_id, base_id + 2) in pairs or (base_id + 1, base_id + 2) in pairs


def test_jaccard_verify(docs):
    cands = minhash_candidates(docs, "text", "doc_id")
    ver = jaccard_verify(docs, cands, "text", "doc_id", threshold=0.8)
    rows = {(r["key_a"], r["key_b"]): r["jaccard"] for r in ver.collect()}
    assert rows[(0, 1)] == pytest.approx(1.0)  # exact dup
    # near dup scores high but below 1
    near = [v for (a, b), v in rows.items() if b - a == 2 or b - a == 1]
    assert all(v >= 0.8 for v in rows.values())


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "key_a long, key_b long",
    )
    comps = {r["key"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[10] == comps[11] == 10
    assert comps[20] == comps[21] == comps[22] == comps[23] == 20


def test_near_dedup_end_to_end(docs):
    out = near_dedup(docs, "text", "doc_id", threshold=0.8)
    kept = {r["doc_id"] for r in out.collect()}
    # each planted triple collapses to its smallest id
    for base_id in (0, 3, 6, 9):
        assert base_id in kept
        assert base_id + 1 not in kept
        assert base_id + 2 not in kept
    # all unique docs survive
    assert out.count() == 4 + 20


def test_minhash_bucket_cap_prevents_pair_explosion(spark):
    """LSH hygiene: 1000 identical docs land in one bucket per band; the
    max_bucket cap must drop the mega-bucket instead of emitting ~500k
    candidate pairs (VERDICT: degenerate-signature O(C^2) guard)."""
    rows = [(i, "exactly the same boilerplate text repeated " * 20) for i in range(1000)]
    rows += [(1000 + j, f"distinct filler number {j} " * 30) for j in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_candidates(df, "text", "doc_id")  # default max_bucket=256
    n = capped.count()
    assert n < 5000, f"pair explosion: {n} candidates"
    # with the cap disabled the mega-bucket would alone contribute 1000*999/2
    uncapped_bucket_pairs = 1000 * 999 // 2
    assert n < uncapped_bucket_pairs / 50


def test_minhash_cap_keeps_small_clusters(docs):
    """The cap must not disturb normal-sized near-dup clusters."""
    capped = minhash_candidates(docs, "text", "doc_id", max_bucket=256)
    uncapped = minhash_candidates(docs, "text", "doc_id", max_bucket=None)
    assert {tuple(r) for r in capped.collect()} == {tuple(r) for r in uncapped.collect()}


def test_shingles_bounded_on_huge_document(spark):
    """A multi-MB document must not materialize an unbounded in-row
    shingle array: shingling reads a capped prefix (SHINGLE_MAX_CHARS),
    so the per-row array stays bounded regardless of document size."""
    from sparkcodec.dedup import SHINGLE_MAX_CHARS, _shingles, minhash_candidates

    big = "x y z " * 900_000  # ~5.4 MB
    df = spark.createDataFrame(
        [(1, big), (2, big[: len(big) // 2] + " tail"), (3, "tiny doc")],
        "doc_id long, text string",
    )
    sh = _shingles(df, "text", "doc_id", 9)
    per_doc = {r["key"]: r["n"] for r in
               sh.groupBy("key").count().withColumnRenamed("count", "n").collect()}
    # distinct shingles of a capped prefix can never exceed the cap
    assert all(n <= SHINGLE_MAX_CHARS for n in per_doc.values()), per_doc
    # the full candidate pipeline completes and still pairs the near-dups
    pairs = minhash_candidates(df, "text", "doc_id").collect()
    assert (1, 2) in {(r["key_a"], r["key_b"]) for r in pairs}
