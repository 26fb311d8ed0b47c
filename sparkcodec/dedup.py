"""Document deduplication pipelines for training-data curation.

Batch ops sized for 10^12-row tables — every stage is joins/aggregations
Catalyst can plan, no driver-side materialization:

- :func:`exact_dedup` — hash-groupBy survivor selection (one shuffle).
- :func:`minhash_candidates` — shingles → minhashes → LSH bands →
  bucket self-join (the classic candidate generator; shuffle on band
  signatures, skew-safe because buckets are capped by band width).
- :func:`jaccard_verify` — exact shingle-set Jaccard on candidate pairs
  only (semi-joined shingle lists, never all-pairs).
- :func:`near_dedup` — candidate pairs → connected components via
  iterative min-label propagation (converges in O(log component
  diameter) joins; components here are tiny clusters of near-dups) →
  keep the smallest key per component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Keep one row (smallest key) per exact text value; sha2 groups so
    the wide text column itself never rides the shuffle."""
    h = F.sha2(F.col(text_col).cast("binary"), 256)
    keep = (
        df.select(F.col(key_col).alias("__k"), h.alias("__h"))
        .groupBy("__h")
        .agg(F.min("__k").alias(key_col))
        .select(key_col)
    )
    return df.join(keep, on=key_col, how="left_semi")


# shingle memory bound: the k-gram transform materializes ALL of a doc's
# shingles as ONE in-row array before explode, so a 100 MB document would
# become a ~GB single row in the JVM. Near-dup signals saturate long
# before this length (minhashes over the first 64 KiB identify the same
# near-duplicates; a doc pair differing only beyond it is >99.99%
# identical in the prefix too), so shingling reads a capped prefix.
SHINGLE_MAX_CHARS = 65536


def _shingles(
    df: DataFrame,
    text_col: str,
    key_col: str,
    k: int,
    max_chars: int = SHINGLE_MAX_CHARS,
) -> DataFrame:
    # project the capped text ONCE: embedding the substr in the transform
    # lambda would re-slice the full document per shingle position (HOF
    # lambdas are interpreted with no loop-invariant hoisting — O(cap^2)
    # bytes copied for a cap-length doc)
    capped = df.select(
        F.col(key_col).alias("key"),
        F.col(text_col).substr(F.lit(1), F.lit(max_chars)).alias("__txt"),
    )
    txt = F.col("__txt")
    return capped.select(
        "key",
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(txt) - (k - 1), F.lit(1))),
                    lambda i: txt.substr(i, F.lit(k)),
                )
            )
        ).alias("shingle"),
    ).filter(F.length("shingle") == k)


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n_hashes: int = 24,
    n_bands: int = 8,
    shingle_k: int = 9,
    max_bucket: int | None = 256,
) -> DataFrame:
    """LSH candidate pairs (key_a < key_b). n_hashes/n_bands set the
    similarity threshold curve; per-band signatures are xxhash64 of the
    band's minhashes, so the join key is a single long.

    Threshold curve (b bands of r rows, P(candidate) = 1-(1-J^r)^b):
    the defaults b=8, r=3 catch a true-Jaccard-0.8 pair with
    p = 1-(1-0.512)^8 ≈ 0.9972 and a 0.9 pair with ≈ 0.99998, while a
    background pair at J=0.1 slips through a band with p=0.001 — the
    shingle width k=9 is what creates that gap on natural text (5-gram
    background Jaccard runs ~0.2, 9-gram falls below 0.1), so the
    exact-Jaccard verify stage sees every real near-dup and only a
    sliver of noise.

    ``max_bucket`` is LSH hygiene at scale: a degenerate signature (many
    identical/boilerplate docs) would otherwise blow the bucket
    self-join up to O(C²) pairs. Buckets above the cap are dropped —
    identical-document mega-clusters are exact duplicates and belong to
    :func:`exact_dedup`, which handles them in one shuffle."""
    per_band = n_hashes // n_bands
    sh = _shingles(df, text_col, key_col, shingle_k)
    hashed = sh.select(
        "key", *[F.xxhash64("shingle", F.lit(s)).alias(f"h{s}") for s in range(n_hashes)]
    )
    mins = hashed.groupBy("key").agg(*[F.min(f"h{s}").alias(f"m{s}") for s in range(n_hashes)])
    bands = mins.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[f"m{b * per_band + j}" for j in range(per_band)]).alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("key", "bs.band", "bs.sig")
    if max_bucket is not None:
        small = (
            bands.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") <= max_bucket)
            .drop("__c")
        )
        bands = bands.join(small, ["band", "sig"], "left_semi")
    return (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "sig"])
        .filter(F.col("a.key") < F.col("b.key"))
        .select(F.col("a.key").alias("key_a"), F.col("b.key").alias("key_b"))
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str,
    key_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle Jaccard, computed only for candidate pairs."""
    keys = candidates.select(F.col("key_a").alias("key")).union(
        candidates.select(F.col("key_b").alias("key"))
    ).distinct()
    sh = _shingles(df.join(keys.withColumnRenamed("key", key_col), key_col, "left_semi"),
                   text_col, key_col, shingle_k)
    sizes = sh.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    # prune to candidate pairs BEFORE the count aggregation: a boilerplate
    # shingle shared by C keys would otherwise materialize O(C^2) pair
    # groups; the semi-join keeps the aggregated stream bounded by the
    # LSH candidate set
    shared = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.key") < F.col("y.key"))
        .select(F.col("x.key").alias("key_a"), F.col("y.key").alias("key_b"))
        .join(candidates, ["key_a", "key_b"], "left_semi")
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("key", "key_a").withColumnRenamed("n", "na"), "key_a")
        .join(sizes.withColumnRenamed("key", "key_b").withColumnRenamed("n", "nb"), "key_b")
        .select(
            "key_a",
            "key_b",
            (F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(key, component) via min-label propagation over undirected pairs.

    Converges in O(diameter) rounds (near-dup components are tiny); each
    round's labels are materialized with localCheckpoint so the lineage —
    and therefore each round's cost — stays flat instead of replaying all
    prior rounds. Raises if max_iter rounds don't converge (silently
    returning partial components would merge/keep the wrong documents).
    """
    edges = pairs.select(
        F.col("key_a").alias("src"), F.col("key_b").alias("dst")
    ).union(pairs.select(F.col("key_b").alias("src"), F.col("key_a").alias("dst")))
    edges = edges.cache()
    labels = (
        edges.select(F.col("src").alias("key"))
        .distinct()
        .withColumn("component", F.col("key"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.key)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.key == neighbor_min.src, "left")
            .select(
                "key",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "key")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (component diameter exceeds it)"
        )
    return labels


def near_dedup(
    df: DataFrame,
    text_col: str,
    key_col: str,
    threshold: float = 0.8,
    n_hashes: int = 24,
    n_bands: int = 8,
    shingle_k: int = 9,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Full near-dup removal: LSH candidates → exact-Jaccard verify →
    components → keep the smallest key per component."""
    cands = minhash_candidates(
        df, text_col, key_col, n_hashes, n_bands, shingle_k, max_bucket
    )
    verified = jaccard_verify(df, cands, text_col, key_col, threshold, shingle_k)
    comps = connected_components(verified)
    drop = (
        comps.groupBy("component")
        .agg(F.min("key").alias("__keep"))
        .join(comps, "component")
        .filter(F.col("key") != F.col("__keep"))
        .select(F.col("key").alias(key_col))
    )
    return df.join(drop, on=key_col, how="left_anti")
