"""Persisted ANN index: IVF coarse clustering materialized as a
sparkcodec postings table.

The in-plan ANN queries (:func:`sparkcodec.queries.q_ann_ivf_topk`,
``q_ann_lsh_topk``) re-derive their index structure inside every query
plan — correct, but at production scale the assignment pass is a full
scan per query. :func:`build_ann_index` materializes the IVF assignment
ONCE as a postings table ``(vec_id, cluster)`` clustered by ``cluster``:
probing ``nprobe`` of ``k`` coarse cells is then a PRUNED decode — the
exact-value-set refutation drops every part holding none of the probed
cluster ids before any task runs (O(1) metadata via snapshot
manifests), and only the surviving parts' files open. Vectors stay in
the data table; the probe joins the (tiny) pruned posting ids back to
it — the classic inverted-file shape, where the index carries ids, not
payloads.

The index is itself a snapshot-logged sparkcodec table, which buys the
production lifecycle for free: rebuilds append new snapshots, tags pin
a reproducible index version alongside the data (the dataset-versioning
posture — ``ann_topk(..., ref="v1")`` probes the exact postings that
existed when ``v1`` was cut, regardless of rebuilds or retention), and
the centroid derivation parameters ride the snapshot entry so a reader
probes with exactly the planes its index version was built with.

Default centroids are deterministic LCG hyperplane seeds (the same
integer recurrence as ``queries._lcg_plane``): determinism is what lets
the DuckDB oracle verify the probed result end to end.
``build_ann_index(trained=True)`` replaces them with a sampled
spherical k-means (:func:`train_centroids`) whose centroids PERSIST in
the index's ``ann`` snapshot block — recall on real embeddings comes
from the trained path, oracle verification from the LCG path, and the
lifecycle (build / extend / tags / pruned probe) is byte-for-byte the
same code for both (``_assign_expr_from_params`` is the single
dispatch point).

Reference parity note: the reference has no ANN surface — this module
is part of the beyond-reference LLM-pipeline operator set; its storage
layer cites the reference's sidecar-directory posture via engine.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .engine import (
    _tip_entry,
    decode_table,
    encode_table,
    resolve_ref,
    snapshots,
    tag_snapshot,
)

_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31: division below is by a power of two => exact


def _plane(seed: int, i: int) -> float:
    """Python mirror of ``queries._lcg_plane``: deterministic
    pseudo-random hyperplane coefficient in [-0.5, 0.5). Pure integer
    recurrence + power-of-two division, so Python, Spark, and DuckDB
    all evaluate it bit-identically."""
    x = (_LCG_A * (seed * 1024 + i) + _LCG_C) % _LCG_M
    return x / float(_LCG_M) - 0.5


def _plane_expr(seed: int, i):
    """Column form of :func:`_plane` (``i`` is a 0-based element index
    Column, as supplied by ``F.transform``'s second lambda arg)."""
    x = (
        F.lit(_LCG_A).cast("long") * (F.lit(seed * 1024).cast("long") + i.cast("long"))
        + F.lit(_LCG_C)
    ) % F.lit(_LCG_M).cast("long")
    return x / F.lit(float(_LCG_M)) - F.lit(0.5)


def centroid_dots_expr(k: int, seed_base: int, col: str = "embedding"):
    """Array Column of the k centroid inner products for ``col`` —
    entirely plan-side (higher-order functions), no driver data."""

    def dot(c):
        def lam(x, i):
            return x * _plane_expr(seed_base + c, i)

        return F.aggregate(
            F.transform(col, lam), F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    return F.array(*[dot(c) for c in range(k)])


def assign_cluster_expr(k: int, seed_base: int, col: str = "embedding"):
    """Column: 0-based id of the max-inner-product centroid (first-max
    on ties, matching ``array_position(ds, array_max(ds)) - 1``)."""
    ds = centroid_dots_expr(k, seed_base, col)
    return (F.array_position(ds, F.array_max(ds)) - 1).cast("long")


def query_clusters(vec, k: int, seed_base: int, nprobe: int = 2) -> list[int]:
    """The query vector's ``nprobe`` best centroids, computed
    driver-side for decode-time part pruning (the ONE place the probe
    path touches Python — a single vector, not data). The fold is a
    sequential left-to-right sum over the same doubles Spark's
    ``F.aggregate`` folds, so the chosen clusters are bit-identical to
    the in-plan assignment; ties resolve first-max, like
    ``array_position``. Masked-argmax iteration mirrors the in-plan
    second-best derivation exactly."""
    ds = []
    for c in range(k):
        acc = 0.0
        for i, x in enumerate(vec):
            acc += float(x) * _plane(seed_base + c, i)
        ds.append(acc)
    probes: list[int] = []
    masked = list(ds)
    for _ in range(min(nprobe, k)):
        best = masked.index(max(masked))
        probes.append(best)
        masked[best] = -1e18
    return probes


def train_centroids(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_rows: int = 65536,
    iters: int = 8,
    seed: int = 42,
) -> list[list[float]]:
    """Sampled k-means (the trained quantizer the LCG planes stub for):
    a DETERMINISTIC hash-sample of at most ``sample_rows`` vectors is
    collected (bounded driver memory — at 64-dim floats the default cap
    is ~16 MB regardless of table size; the sample filter runs
    distributed and Catalyst prunes to two columns), then Lloyd
    iterations with a k-means++-style seeded init run on the sample in
    numpy. Vectors and centroids are L2-normalized, so assignment by
    max inner product (the exact shape :func:`centroid_dots_expr`
    already uses) IS spherical k-means — the right quantizer for cosine
    ANN. Deterministic for a fixed (table, k, seed): the sample is
    hash-selected and id-ordered, never TABLESAMPLE."""
    import numpy as np

    n = emb.count()
    mod = max(1, n // sample_rows)
    rows = (
        emb.select(id_col, vec_col)
        .where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .orderBy(id_col)
        .limit(sample_rows)
        .collect()
    )
    x = np.array([r[1] for r in rows], dtype=np.float64)
    if len(x) < k:
        raise ValueError(f"sample of {len(x)} vectors cannot seed k={k}")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    # k-means++ seeding on the sample
    cents = [x[rng.integers(len(x))]]
    for _ in range(1, k):
        d2 = np.min(
            [np.sum((x - c) ** 2, axis=1) for c in cents], axis=0
        )
        tot = float(d2.sum())
        if tot <= 1e-12:
            # degenerate sample (all vectors ~identical): every remaining
            # seed is equivalent — fall back to uniform instead of handing
            # rng.choice a distribution that does not sum to 1
            cents.append(x[rng.integers(len(x))])
            continue
        cents.append(x[rng.choice(len(x), p=d2 / tot)])
    c = np.stack(cents)
    for _ in range(iters):
        # spherical Lloyd: assign by max dot, re-center, re-normalize
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            m = x[assign == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return [[round(float(v), 8) for v in row] for row in c]


def trained_dots_expr(centroids: list[list[float]], col: str = "embedding"):
    """Array Column of inner products against TRAINED centroids (plan
    literals — k*dim doubles ride the plan, no driver data at run
    time); the trained twin of :func:`centroid_dots_expr`."""

    def dot(cvec):
        carr = F.array(*[F.lit(float(v)) for v in cvec])
        return F.aggregate(
            F.zip_with(col, carr, lambda x, y: x * y),
            F.lit(0.0).cast("double"), lambda acc, x: acc + x,
        )

    return F.array(*[dot(cv) for cv in centroids])


def _assign_expr_from_params(params: dict, col: str):
    """Cluster-assignment Column for an index's parameter block —
    trained centroids when present, LCG planes otherwise (the one
    dispatch point; build/extend/probe all route through it)."""
    if params.get("centroids"):
        ds = trained_dots_expr(params["centroids"], col)
        return (F.array_position(ds, F.array_max(ds)) - 1).cast("long")
    return assign_cluster_expr(params["k"], params["seed_base"], col)


def _query_clusters_from_params(vec, params: dict, nprobe: int) -> list[int]:
    """Driver-side probe selection matching :func:`_assign_expr_from_params`."""
    if params.get("centroids"):
        ds = []
        for cvec in params["centroids"]:
            acc = 0.0
            for xi, ci in zip(vec, cvec):
                acc += float(xi) * float(ci)
            ds.append(acc)
        probes: list[int] = []
        masked = list(ds)
        for _ in range(min(nprobe, len(ds))):
            best = masked.index(max(masked))
            probes.append(best)
            masked[best] = -1e18
        return probes
    return query_clusters(vec, params["k"], params["seed_base"], nprobe=nprobe)


def build_ann_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    seed_base: int = 100,
    num_parts: int | None = None,
    tag: str | None = None,
    trained: bool = False,
    sample_rows: int = 65536,
    iters: int = 8,
) -> dict:
    """Materialize the IVF postings table at ``index_dir`` (a NEW
    snapshot-logged sparkcodec table; a re-BUILD is a fresh root that
    erases prior index history and tags — version an index with
    :func:`extend_ann_index` + ``tag`` instead, and rebuild only to
    change ``k``/``seed_base``). One Spark job: the assignment pass is a single
    projection over ``emb`` (no shuffle beyond the index table's own
    clustered exchange). The postings cluster by ``cluster`` with the
    id as sort tiebreak, so each coarse cell's ids are contiguous runs
    — dict/RLE-friendly — and a probe prunes to the parts whose exact
    value sets contain a probed cluster id. Index parameters ride the
    snapshot entry (``ann`` key) for self-describing probes.

    ``trained=True`` fits a sampled spherical k-means first
    (:func:`train_centroids`) and persists the centroids IN the ``ann``
    parameter block, so every later extend/probe of this index version
    assigns with exactly the planes it was built with; the LCG path
    stays the default (bit-identical to the DuckDB oracle). Lifecycle
    (extend / tags / pruned probe) is identical either way."""
    params = {"kind": "ivf", "k": int(k), "seed_base": int(seed_base),
              "id_col": id_col, "vec_col": vec_col}
    if trained:
        params["kind"] = "ivf_kmeans"
        params["centroids"] = train_centroids(
            spark, emb, k, id_col=id_col, vec_col=vec_col,
            sample_rows=sample_rows, iters=iters, seed=seed_base,
        )
    postings = emb.select(
        F.col(id_col).alias("vec_id"),
        _assign_expr_from_params(params, vec_col).alias("cluster"),
    )
    m = encode_table(
        spark, postings, index_dir,
        cluster_by=["cluster"], salt_by=["vec_id"],
        sort_by=["cluster", "vec_id"],
        num_parts=num_parts or k, resume=False,
        snapshot_extra={"ann": params},
    )
    if tag is not None:
        tag_snapshot(index_dir, tag)
    return dict(m, ann=params)


def extend_ann_index(
    spark: SparkSession,
    new_emb: DataFrame,
    index_dir: str,
    *,
    tag: str | None = None,
) -> dict:
    """Incremental index maintenance — the reason appending data never
    forces an index rebuild at scale: assign ONLY the new vectors with
    the SAME centroid parameters the index was built with (read from
    the tip snapshot) and append their postings as a new snapshot. The
    parameters ride the new entry too, so the tip stays
    self-describing; earlier tags keep answering with their own
    postings sets (a ``ref`` probe after an extend sees only the
    vectors that existed when the tag was cut)."""
    params = ann_index_params(index_dir)
    postings = new_emb.select(
        F.col(params["id_col"]).alias("vec_id"),
        _assign_expr_from_params(params, params["vec_col"]).alias("cluster"),
    )
    m = encode_table(
        spark, postings, index_dir,
        cluster_by=["cluster"], salt_by=["vec_id"],
        sort_by=["cluster", "vec_id"],
        num_parts=params["k"], append=True, resume=False,
        snapshot_extra={"ann": params},
    )
    if tag is not None:
        tag_snapshot(index_dir, tag)
    return dict(m, ann=params)


def ann_index_params(index_dir: str, ref: str | None = None) -> dict:
    """The ``ann`` parameter block governing the index version ``ref``
    pins (or the tip): the newest entry at or before the resolved
    snapshot that carries one — builds and extends both stamp it, so
    this is normally the resolved entry itself. Raises if no entry in
    range does (not an ANN index)."""
    snaps = snapshots(index_dir)
    if not snaps:
        raise ValueError(
            f"no snapshot log at {index_dir} — not built by build_ann_index"
        )
    sid = resolve_ref(index_dir, ref) if ref is not None else _tip_entry(snaps)["id"]
    for s in reversed(snaps):
        if s["id"] <= sid and s.get("ann"):
            return s["ann"]
    raise ValueError(
        f"no snapshot at or before {sid} at {index_dir} carries 'ann' "
        f"parameters — not built by build_ann_index"
    )


def probe_postings(
    spark: SparkSession,
    index_dir: str,
    probes: list[int],
    ref: str | None = None,
) -> DataFrame:
    """DataFrame of the posting ids in the probed coarse cells — a
    pruned decode (IN-list predicate: exact value sets refute every
    part holding none of the probed clusters) followed by the exact
    row filter pruning is documented to need."""
    posts = decode_table(
        spark, index_dir, columns=["vec_id", "cluster"],
        where=("cluster", [int(c) for c in probes]), ref=ref,
    )
    return posts.filter(F.col("cluster").isin([int(c) for c in probes])).select(
        "vec_id"
    )


def ann_topk(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    *,
    query_id: int = 0,
    nprobe: int = 2,
    topk: int = 10,
    ref: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors of ``emb``'s row ``query_id`` answered
    THROUGH the persisted index: probe-cluster selection is one
    driver-side vector fold, candidate selection is a pruned postings
    decode semi-joined back to the data table, and scoring/top-k is the
    same plan shape as the in-plan IVF query (TakeOrderedAndProject —
    per-partition heaps, only ``topk`` rows reach the rank window).
    Returns ``(vec_id, cos, rnk)`` — identical to ``q_ann_ivf_topk``'s
    schema, so the same DuckDB oracle verifies both paths."""
    params = ann_index_params(index_dir, ref=ref)
    id_col, vec_col = params["id_col"], params["vec_col"]
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).head()
    if qrow is None:
        raise ValueError(f"query id {query_id} not present in the data table")
    probes = _query_clusters_from_params(qrow[0], params, nprobe)
    posts = probe_postings(spark, index_dir, probes, ref=ref)
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qv")
    )
    cands = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        .join(posts, "vec_id")
        .filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
    )
    dot = F.aggregate(
        F.zip_with(vec_col, "qv", lambda x, y: x * y),
        F.lit(0.0).cast("double"), lambda acc, x: acc + x,
    )

    def nrm(c):
        return F.sqrt(
            F.aggregate(F.col(c), F.lit(0.0).cast("double"),
                        lambda acc, x: acc + x * x)
        )

    scored = cands.select(
        "vec_id", F.round(dot / (nrm(vec_col) * nrm("qv")), 4).alias("cos")
    )
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(topk)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rnk", F.row_number().over(w))
