"""Driver-contract query suite: each entry is a Spark implementation of an
operator from SURVEY.md §2 (or a training-pipeline op), paired with an
ANSI-SQL oracle that DuckDB runs on the same parquet tables.

Conventions (driver compare: row count + schema + order-insensitive
value hash):
- every computed column is aliased identically in Spark and SQL;
- float outputs are rounded to fixed decimals on BOTH sides;
- no timestamp outputs (session-TZ pitfalls).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .index import csr_offsets, edge_ranges
from .pipeline import unpack_branch_type, with_synapse_id


def _workdir(sf_dir: str, name: str) -> str:
    """Scratch table path for a query: deterministic WITHIN a process
    (content md5 of sf_dir — with PYTHONHASHSEED unset the builtin
    hash() would vary run to run), isolated ACROSS processes (pid
    suffix — each query starts with rmtree, so two concurrent harness
    runs sharing one name would delete each other's half-built table
    mid-job)."""
    import hashlib

    return os.path.join(
        tempfile.gettempdir(),
        f"sparkcodec_{name}_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}_{os.getpid()}",
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# profiling / byte accounting (SURVEY §2.3 A1-A7, profile stage of the
# codec selector expressed as an auditable aggregation)


def q_profile_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("text").alias("n_distinct_texts"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


SQL_PROFILE_DOCUMENTS = """
SELECT lang,
       count(*) AS n_docs,
       count(DISTINCT source) AS n_sources,
       count(DISTINCT text) AS n_distinct_texts,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang
"""


def q_byte_accounting(spark, sf_dir):
    """A7: per-group byte accounting (the blocks-table metric, auditable)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.sum(F.length("text")).alias("total_bytes"),
        F.count(F.lit(1)).alias("n_docs"),
    )


SQL_BYTE_ACCOUNTING = """
SELECT lang, source, cast(sum(length(text)) AS BIGINT) AS total_bytes, count(*) AS n_docs
FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# run-length / CSR index operators (SURVEY §2.4 R1-R5)


def q_run_length_lineitem(spark, sf_dir):
    """R1: run-length grouping of l_returnflag over the natural sort order —
    the vectorized _groupNodeRanges (index.cpp:114-137), fully distributed
    via edge_ranges (range shuffle + local runs + boundary merge); no
    global single-task window."""
    li = _t(spark, sf_dir, "lineitem")
    runs = edge_ranges(li, "l_returnflag", ["l_orderkey", "l_linenumber"])
    return (
        runs.select(
            F.col("node_id").alias("l_returnflag"),
            (F.col("range_end") - F.col("range_start")).alias("run_len"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("run_len").alias("n_rows"),
            F.max("run_len").alias("max_run"),
        )
    )


SQL_RUN_LENGTH_LINEITEM = """
WITH ordered AS (
  SELECT l_returnflag,
         row_number() OVER w AS rn,
         CASE WHEN lag(l_returnflag) OVER w IS DISTINCT FROM l_returnflag THEN 1 ELSE 0 END AS new_run
  FROM lineitem WINDOW w AS (ORDER BY l_orderkey, l_linenumber)
), runs AS (
  SELECT l_returnflag, sum(new_run) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ordered
), grouped AS (
  SELECT run_id, l_returnflag, count(*) AS run_len FROM runs GROUP BY run_id, l_returnflag
)
SELECT l_returnflag, count(*) AS n_runs, cast(sum(run_len) AS BIGINT) AS n_rows, max(run_len) AS max_run
FROM grouped GROUP BY l_returnflag
"""


def q_csr_ranges(spark, sf_dir):
    """R1/R2: level-2 CSR ranges over orders keyed by customer."""
    o = _t(spark, sf_dir, "orders")
    return edge_ranges(o, "o_custkey", ["o_orderkey"])


SQL_CSR_RANGES = """
WITH pos AS (
  SELECT o_custkey AS node_id,
         row_number() OVER (ORDER BY o_orderkey) - 1 AS p,
         CASE WHEN lag(o_custkey) OVER (ORDER BY o_orderkey) IS DISTINCT FROM o_custkey
              THEN 1 ELSE 0 END AS new_run
  FROM orders
), runs AS (
  SELECT node_id, p, sum(new_run) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS run_id FROM pos
)
SELECT node_id, min(p) AS range_start, max(p) + 1 AS range_end
FROM runs GROUP BY run_id, node_id
"""


def q_csr_offsets(spark, sf_dir):
    """R5: level-1 CSR offsets (cumulative range counts per node)."""
    o = _t(spark, sf_dir, "orders")
    return csr_offsets(edge_ranges(o, "o_custkey", ["o_orderkey"]))


SQL_CSR_OFFSETS = """
WITH pos AS (
  SELECT o_custkey AS node_id,
         row_number() OVER (ORDER BY o_orderkey) - 1 AS p,
         CASE WHEN lag(o_custkey) OVER (ORDER BY o_orderkey) IS DISTINCT FROM o_custkey
              THEN 1 ELSE 0 END AS new_run
  FROM orders
), runs AS (
  SELECT node_id, p, sum(new_run) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS run_id FROM pos
), ranges AS (
  SELECT node_id, min(p) AS range_start FROM runs GROUP BY run_id, node_id
), per_node AS (
  SELECT node_id, count(*) AS n_ranges FROM ranges GROUP BY node_id
)
SELECT node_id,
       CAST(coalesce(sum(n_ranges) OVER (ORDER BY node_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset_start,
       CAST(coalesce(sum(n_ranges) OVER (ORDER BY node_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_ranges AS BIGINT) AS offset_end
FROM per_node
"""


# ---------------------------------------------------------------------------
# derived columns (SURVEY §2.2 P3-P4)


def q_synapse_ids(spark, sf_dir):
    """P3: (gid << 24) + per-gid sequence over lineitem."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    return with_synapse_id(li, "l_orderkey", ["l_linenumber"])


SQL_SYNAPSE_IDS = """
SELECT l_orderkey, l_linenumber,
       l_orderkey * 16777216 + (row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1) AS synapse_id
FROM lineitem
"""


def q_bitfield_unpack(spark, sf_dir):
    """P4: nibble unpack of a packed byte (p_size % 256 as stand-in)."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_size") % 256).cast("int").alias("branch_type")
    )
    return unpack_branch_type(p).select(
        "p_partkey",
        F.col("efferent_section_type").cast("int").alias("pre_type"),
        F.col("afferent_section_type").cast("int").alias("post_type"),
    )


SQL_BITFIELD_UNPACK = """
SELECT p_partkey,
       ((p_size % 256) // 16) % 16 + 1 AS pre_type,
       (p_size % 16) + 1 AS post_type
FROM part
"""


def q_dict_codes(spark, sf_dir):
    """P8: the '@library' dictionary — sorted distinct values get dense codes."""
    d = _t(spark, sf_dir, "documents").select("lang").distinct()
    return d.select(
        "lang", (F.dense_rank().over(Window.orderBy("lang")) - 1).alias("code")
    )


SQL_DICT_CODES = """
SELECT lang, dense_rank() OVER (ORDER BY lang) - 1 AS code
FROM (SELECT DISTINCT lang FROM documents) t
"""


# ---------------------------------------------------------------------------
# training-pipeline ops: dedup / text analysis / similarity


def q_exact_dedup(spark, sf_dir):
    """Exact dedup via content hash groupBy (scale path: sha2 over text)."""
    d = _t(spark, sf_dir, "documents")
    groups = d.groupBy(F.sha2(F.col("text").cast("binary"), 256).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("n").alias("n_docs"),
        F.sum(F.col("n") - 1).alias("n_duplicates"),
        F.max("n").alias("max_group"),
    )


SQL_EXACT_DEDUP = """
WITH g AS (SELECT text, count(*) AS n FROM documents GROUP BY text)
SELECT count(*) AS n_distinct, cast(sum(n) AS BIGINT) AS n_docs, cast(sum(n - 1) AS BIGINT) AS n_duplicates, max(n) AS max_group
FROM g
"""


def q_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer) per lang."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("lang").agg(
        F.sum(toks).alias("total_tokens"),
        F.max(toks).alias("max_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
    )


SQL_TOKEN_STATS = """
SELECT lang,
       cast(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       max(len(regexp_split_to_array(trim(text), '\\s+'))) AS max_tokens,
       round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_tokens
FROM documents GROUP BY lang
"""


def q_quality_scores(spark, sf_dir):
    """Quality scoring: length + whitespace-ratio buckets per source."""
    d = _t(spark, sf_dir, "documents")
    ws_ratio = (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))) / F.nullif(
        F.length("text"), F.lit(0)
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_chars") < 100).cast("long")).alias("n_short"),
        F.round(F.avg(ws_ratio), 4).alias("avg_ws_ratio"),
    )


SQL_QUALITY_SCORES = """
SELECT source,
       count(*) AS n_docs,
       cast(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       round(avg((length(text) - length(replace(text, ' ', ''))) * 1.0 / nullif(length(text), 0)), 4) AS avg_ws_ratio
FROM documents GROUP BY source
"""


def q_top_docs_per_lang(spark, sf_dir):
    """Top-3 longest docs per lang (window top-k)."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "doc_id", "n_chars", "rnk")
    )


SQL_TOP_DOCS_PER_LANG = """
SELECT lang, doc_id, n_chars, rnk FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM documents
) t WHERE rnk <= 3
"""


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 query vector.

    Spark-side dot/norm via array ops (no Python in the hot path);
    scores rounded before ranking so both engines agree at float ulp.
    """
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    joined = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    scored = joined.select(
        "vec_id", F.round(dot / (norm("embedding") * norm("qv")), 4).alias("cos")
    )
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge), so only 10 rows ever reach the
    # rank window — never a global single-task WindowExec over all scores
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rnk", F.row_number().over(w))


SQL_ANN_COSINE_TOPK = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(list_dot_product(e.embedding, q.qv) /
               (sqrt(list_dot_product(e.embedding, e.embedding)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, cos, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rnk
FROM scored QUALIFY rnk <= 10
"""


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword containment) — counts per verdict."""
    d = _t(spark, sf_dir, "documents")
    verdict = (
        F.when(F.col("text").contains(" the "), F.lit("en_like"))
        .when(F.col("text").contains(" der "), F.lit("de_like"))
        .otherwise(F.lit("other"))
    )
    return d.groupBy(verdict.alias("verdict")).agg(F.count(F.lit(1)).alias("n_docs"))


SQL_LANG_ID = """
SELECT CASE WHEN text LIKE '% the %' THEN 'en_like'
            WHEN text LIKE '% der %' THEN 'de_like'
            ELSE 'other' END AS verdict,
       count(*) AS n_docs
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# aggregation parity ops (SURVEY §2.3) on TPC-H-ish tables


def q_global_counts(spark, sf_dir):
    """A1/A4: global reductions (count, max-key) the reference does with
    MPI_Allreduce (parquet2hdf5.cpp:89-95, index.cpp:208-213)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_orderkey").alias("max_key"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
    )


SQL_GLOBAL_COUNTS = """
SELECT count(*) AS n_rows, max(l_orderkey) AS max_key,
       count(DISTINCT l_partkey) AS n_parts, sum(l_quantity) AS sum_qty
FROM lineitem
"""


def q_prefix_offsets(spark, sf_dir):
    """A3/A6: gather→scan→scatter offset choreography as a window cumsum:
    per-group counts become each group's global write offset."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("o_orderpriority").rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        "o_orderpriority",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("write_offset"),
    )


SQL_PREFIX_OFFSETS = """
WITH c AS (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority)
SELECT o_orderpriority, cnt,
       CAST(coalesce(sum(cnt) OVER (ORDER BY o_orderpriority ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS write_offset
FROM c
"""


# ---------------------------------------------------------------------------
# flagship: the codec engine itself in the correctness gate


def q_encode_roundtrip_stats(spark, sf_dir):
    """Encode documents with the real engine, decode, aggregate — the
    oracle aggregates the source directly, so any encode/decode
    corruption breaks the match."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "rt")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark,
        d,
        out,
        cluster_by=["lang"],
        salt_by=["doc_id"],
        sort_by=["lang", "doc_id"],
        num_parts=8,
        resume=False,
    )
    dec = decode_table(spark, out)
    return dec.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_text_chars"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_ENCODE_ROUNDTRIP_STATS = """
SELECT lang, count(*) AS n_docs, cast(sum(length(text)) AS BIGINT) AS total_text_chars,
       cast(sum(n_chars) AS BIGINT) AS total_chars, count(DISTINCT source) AS n_sources,
       max(doc_id) AS max_doc_id
FROM documents GROUP BY lang
"""


def q_encode_roundtrip_lineitem(spark, sf_dir):
    """Engine round-trip over a mixed-type table: decimal floats route to
    ALP, wide-range keys to delta/FoR, low-card flags to dict, plus a
    timestamp column. Float sums are compared in exact integer cents /
    basis points so the check is order-independent and ulp-proof."""
    from .engine import decode_table, encode_table

    cols = [
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ]
    li = _t(spark, sf_dir, "lineitem").select(*cols)
    out = _workdir(sf_dir, "rtli")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark,
        li,
        out,
        cluster_by=["l_returnflag"],
        salt_by=["l_orderkey"],
        sort_by=["l_returnflag", "l_orderkey", "l_linenumber"],
        num_parts=8,
        resume=False,
    )
    dec = decode_table(spark, out)
    return dec.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_cents"),
        F.sum(F.round(F.col("l_discount") * 10000).cast("long")).alias("disc_bps"),
        F.sum(F.round(F.col("l_tax") * 10000).cast("long")).alias("tax_bps"),
        F.countDistinct("l_shipdate").alias("n_ship_ts"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.max("l_linenumber").alias("max_linenumber"),
    )


SQL_ENCODE_ROUNDTRIP_LINEITEM = """
SELECT l_returnflag,
       count(*) AS n_rows,
       cast(sum(cast(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
       cast(sum(cast(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS disc_bps,
       cast(sum(cast(round(l_tax * 10000) AS BIGINT)) AS BIGINT) AS tax_bps,
       count(DISTINCT l_shipdate) AS n_ship_ts,
       max(l_orderkey) AS max_orderkey,
       max(l_linenumber) AS max_linenumber
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# MinHash LSH + SimHash dedup — expressed with PORTABLE hashes
# (sha256-derived, computable identically in Spark and DuckDB) so full
# value oracles exist. The production fast path (sparkcodec/dedup.py)
# uses JVM xxhash64 — same algorithm, cheaper hash; these queries verify
# the algorithmic choreography end-to-end against SQL.

_MH_HASHES = 8  # portable-oracle demo curve: 2 bands of 4
_MH_BANDS = 2

# shingle memory bound (mirrors dedup.SHINGLE_MAX_CHARS): the k-gram
# transform builds one in-row array of all shingles before explode, so
# shingling reads a capped prefix — near-dup signals saturate long before
# 64 KiB. BOTH sides cap identically (Spark substring / SQL substr), so
# the oracles stay value-exact at any document length.
_SH_CAP = 65536


def _capped_text(d):
    return d.select("doc_id", F.substring("text", 1, _SH_CAP).alias("text"))


def _portable_hash(col, seed: int):
    """63-bit integer hash both engines compute identically:
    first 15 hex chars of sha256(value || '#' || seed)."""
    return F.conv(
        F.substring(F.sha2(F.concat(col, F.lit(f"#{seed}")).cast("binary"), 256), 1, 15),
        16,
        10,
    ).cast("long")


def q_minhash_buckets(spark, sf_dir):
    """MinHash+LSH near-dup candidates: distinct 5-gram shingles → 8
    minhashes → 2 bands → bucket join, with portable sha256-derived
    hashes so DuckDB computes the exact same buckets (full oracle)."""
    d = _capped_text(_t(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("text") - 4, F.lit(1))),
                    lambda i: F.col("text").substr(i, F.lit(5)),
                )
            )
        ).alias("shingle"),
    ).filter(F.length("shingle") == 5)
    hashes = sh.select(
        "doc_id",
        *[_portable_hash(F.col("shingle"), s).alias(f"h{s}") for s in range(_MH_HASHES)],
    )
    mins = hashes.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"m{s}") for s in range(_MH_HASHES)]
    )
    per_band = _MH_HASHES // _MH_BANDS
    band_sigs = [
        F.sha2(
            F.concat_ws(
                "#", *[F.col(f"m{b * per_band + j}").cast("string") for j in range(per_band)]
            ).cast("binary"),
            256,
        ).alias(f"band{b}")
        for b in range(_MH_BANDS)
    ]
    bands = mins.select("doc_id", *band_sigs)
    b = bands.selectExpr(
        "doc_id",
        f"stack({_MH_BANDS}, "
        + ", ".join(f"{i}, band{i}" for i in range(_MH_BANDS))
        + ") as (band, sig)",
    )
    pairs = (
        b.alias("a")
        .join(b.alias("b"), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def _sql_minhash_grams(k: int = 5) -> str:
    return f"""
grams AS (
  SELECT DISTINCT doc_id, substr(text, i, {k}) AS shingle
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - {k - 1}, 1) + 1)) AS i
        FROM (SELECT doc_id, substr(text, 1, {_SH_CAP}) AS text FROM documents)) src
  WHERE length(substr(text, i, {k})) = {k}
)"""


def _sql_portable_hash(expr: str, seed: int) -> str:
    return f"('0x' || substr(sha256({expr} || '#{seed}'), 1, 15))::BIGINT"


SQL_MINHASH_BUCKETS = (
    "WITH "
    + _sql_minhash_grams(5)
    + ", mins AS (\n  SELECT doc_id, "
    + ", ".join(
        f"min({_sql_portable_hash('shingle', s)}) AS m{s}" for s in range(_MH_HASHES)
    )
    + "\n  FROM grams GROUP BY doc_id\n), bands AS (\n"
    + "  UNION ALL\n".join(
        "  SELECT doc_id, "
        + f"{b} AS band, sha256("
        + " || '#' || ".join(
            f"m{b * (_MH_HASHES // _MH_BANDS) + j}::VARCHAR"
            for j in range(_MH_HASHES // _MH_BANDS)
        )
        + ") AS sig FROM mins\n"
        for b in range(_MH_BANDS)
    )
    + ")\nSELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
    "FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig\n"
    "WHERE a.doc_id < b.doc_id"
)


def q_simhash(spark, sf_dir):
    """Full-width 64-bit SimHash per doc from portable token hashes.

    Token hash = two 32-bit words from sha256 hex; per-bit vote sums;
    output as two 32-bit halves (hi, lo) so no int64 sign overflow —
    DuckDB computes the identical values (full oracle)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
    hx = F.sha2(F.col("t").cast("binary"), 256)
    th = tok.select(
        "doc_id",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("c_hi"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("c_lo"),
    )
    def votes(col, b):
        return F.sum(
            F.when(F.shiftrightunsigned(F.col(col), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        )
    agg = th.groupBy("doc_id").agg(
        *[votes("c_hi", b).alias(f"vh{b}") for b in range(32)],
        *[votes("c_lo", b).alias(f"vl{b}") for b in range(32)],
    )
    return agg.select(
        "doc_id",
        sum(
            (F.when(F.col(f"vh{b}") > 0, 1).otherwise(0) * (1 << b)) for b in range(32)
        ).alias("simhash_hi"),
        sum(
            (F.when(F.col(f"vl{b}") > 0, 1).otherwise(0) * (1 << b)) for b in range(32)
        ).alias("simhash_lo"),
    )


SQL_SIMHASH = (
    """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t FROM documents
), th AS (
  SELECT doc_id,
         ('0x' || substr(sha256(t), 1, 8))::BIGINT AS c_hi,
         ('0x' || substr(sha256(t), 9, 8))::BIGINT AS c_lo
  FROM tok
), agg AS (
  SELECT doc_id, """
    + ", ".join(
        f"sum(CASE WHEN (c_hi >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS vh{b}"
        for b in range(32)
    )
    + ", "
    + ", ".join(
        f"sum(CASE WHEN (c_lo >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS vl{b}"
        for b in range(32)
    )
    + """
  FROM th GROUP BY doc_id
)
SELECT doc_id,
       CAST("""
    + " + ".join(f"(CASE WHEN vh{b} > 0 THEN 1 ELSE 0 END) * {1 << b}" for b in range(32))
    + """ AS BIGINT) AS simhash_hi,
       CAST("""
    + " + ".join(f"(CASE WHEN vl{b} > 0 THEN 1 ELSE 0 END) * {1 << b}" for b in range(32))
    + """ AS BIGINT) AS simhash_lo
FROM agg
"""
)


# ---------------------------------------------------------------------------

QUERIES = {
    "profile_documents": q_profile_documents,
    "byte_accounting": q_byte_accounting,
    "run_length_lineitem": q_run_length_lineitem,
    "csr_ranges": q_csr_ranges,
    "csr_offsets": q_csr_offsets,
    "synapse_ids": q_synapse_ids,
    "bitfield_unpack": q_bitfield_unpack,
    "dict_codes": q_dict_codes,
    "exact_dedup": q_exact_dedup,
    "token_stats": q_token_stats,
    "quality_scores": q_quality_scores,
    "top_docs_per_lang": q_top_docs_per_lang,
    "ann_cosine_topk": q_ann_cosine_topk,
    "lang_id": q_lang_id,
    "global_counts": q_global_counts,
    "prefix_offsets": q_prefix_offsets,
    "encode_roundtrip_stats": q_encode_roundtrip_stats,
    "encode_roundtrip_lineitem": q_encode_roundtrip_lineitem,
    "minhash_buckets": q_minhash_buckets,
    "simhash": q_simhash,
}

ORACLES = {
    "profile_documents": SQL_PROFILE_DOCUMENTS,
    "byte_accounting": SQL_BYTE_ACCOUNTING,
    "run_length_lineitem": SQL_RUN_LENGTH_LINEITEM,
    "csr_ranges": SQL_CSR_RANGES,
    "csr_offsets": SQL_CSR_OFFSETS,
    "synapse_ids": SQL_SYNAPSE_IDS,
    "bitfield_unpack": SQL_BITFIELD_UNPACK,
    "dict_codes": SQL_DICT_CODES,
    "exact_dedup": SQL_EXACT_DEDUP,
    "token_stats": SQL_TOKEN_STATS,
    "quality_scores": SQL_QUALITY_SCORES,
    "top_docs_per_lang": SQL_TOP_DOCS_PER_LANG,
    "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
    "lang_id": SQL_LANG_ID,
    "global_counts": SQL_GLOBAL_COUNTS,
    "prefix_offsets": SQL_PREFIX_OFFSETS,
    "encode_roundtrip_stats": SQL_ENCODE_ROUNDTRIP_STATS,
    "encode_roundtrip_lineitem": SQL_ENCODE_ROUNDTRIP_LINEITEM,
    "minhash_buckets": SQL_MINHASH_BUCKETS,
    "simhash": SQL_SIMHASH,
}


# ---------------------------------------------------------------------------
# similarity search & near-dup detection (training-pipeline ops, batch 2)


_WIN_K, _WIN_W = 8, 4  # k-gram size, winnow window (guarantee length k+w-1)


def q_winnow_fingerprints(spark, sf_dir):
    """Document fingerprinting by winnowing (Schleimer et al., SIGMOD
    2003 — the MOSS scheme): hash every k-gram, slide a w-window over
    the hash sequence, keep each window's minimum; the distinct selected
    hashes are the document's fingerprints. Any shared substring of
    length >= k+w-1 between two docs is guaranteed to share a
    fingerprint. Pure JVM-side array expressions (transform / slice /
    array_min — no Python in the path); the portable sha256-derived gram
    hash gives a full DuckDB oracle. At 10^12 scale fingerprints feed
    the same bucket-join choreography as the MinHash bands."""
    return _winnow_fps(_capped_text(_t(spark, sf_dir, "documents")), "doc_id")


SQL_WINNOW_FINGERPRINTS = f"""
WITH capped AS (
  SELECT doc_id, substr(text, 1, {_SH_CAP}) AS text FROM documents
), hs AS (
  SELECT doc_id,
         [('0x' || substr(sha256(substr(text, i, {_WIN_K}) || '#977'), 1, 15))::BIGINT
          FOR i IN range(1, length(text) - {_WIN_K} + 2)] AS hs
  FROM capped WHERE length(text) >= {_WIN_K + _WIN_W - 1}
), fps AS (
  SELECT doc_id,
         unnest([list_min(hs[p:p + {_WIN_W - 1}])
                 FOR p IN range(1, len(hs) - {_WIN_W} + 2)]) AS fp
  FROM hs
)
SELECT DISTINCT doc_id, fp FROM fps
"""


def q_cosine_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (threshold 0.35 — chosen from
    the test corpus's cosine distribution so the check is non-trivial;
    rounded before compare). Brute-force all-pairs is the correctness
    baseline; the LSH variant below is the 10^12-scale path."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    nrm = lambda side: F.sqrt(
        F.aggregate(
            F.col(f"{side}.embedding"), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x
        )
    )
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (nrm("a") * nrm("b")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= 0.35)
    )
    return pairs


SQL_COSINE_NEARDUP_PAIRS = """
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.embedding, b.embedding) /
               (sqrt(list_dot_product(a.embedding, a.embedding)) *
                sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cos
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
) t WHERE cos >= 0.35
"""


def q_ngram_jaccard_candidates(spark, sf_dir):
    """Character-3-gram Jaccard near-dup candidates (>= 0.9) over the
    documents table: explode distinct shingles, equi-join on shingle,
    jaccard = |shared| / (|a| + |b| - |shared|)."""
    d = _capped_text(_t(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1))),
                    lambda i: F.col("text").substr(i, F.lit(3)),
                )
            )
        ).alias("g"),
    ).filter(F.length("g") == 3)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        grams.alias("x")
        .join(grams.alias("y"), "g")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.9)
    )
    return out


SQL_NGRAM_JACCARD_CANDIDATES = f"""
WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, i, 3) AS g
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 2, 1) + 1)) AS i
        FROM (SELECT doc_id, substr(text, 1, {_SH_CAP}) AS text FROM documents)) src
  WHERE length(substr(text, i, 3)) = 3
), sizes AS (
  SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
), shared AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS shared
  FROM grams x JOIN grams y USING (g)
  WHERE x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b,
       round(shared * 1.0 / (sa.n_grams + sb.n_grams - shared), 4) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / (sa.n_grams + sb.n_grams - shared) >= 0.9
"""


_LSH_BITS = 8  # 256 buckets, multiprobe at Hamming distance <=1 (9 probes)


def _lcg_plane(b: int, i):
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    a plain integer LCG both engines evaluate bit-identically (the
    division is by a power of two, so the double is exact)."""
    x = (
        F.lit(1103515245).cast("long") * (F.lit(b * 1024).cast("long") + i.cast("long"))
        + F.lit(12345)
    ) % F.lit(2147483648).cast("long")
    return x / F.lit(2147483648.0) - F.lit(0.5)


def q_ann_lsh_topk(spark, sf_dir):
    """Scale-path ANN: random-hyperplane LSH buckets + multiprobe cosine.

    8 signed projections -> one of 256 buckets per vector; the query
    (vec_id 0) probes its own bucket plus every bucket at Hamming
    distance 1 (classic multiprobe LSH: flipping the least-confident
    bits costs one extra probe each instead of duplicating the index).
    Hyperplanes come from a deterministic integer LCG evaluated inside
    the plan (no driver-side action, no numpy broadcast), so DuckDB
    computes identical buckets — full oracle. At 10^12 scale the probe
    set stays a broadcast-join fan-out of 1+bits tiny rows against the
    bucket-partitioned index; no shuffle of the big side. The exact
    counterpart is q_ann_cosine_topk."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _proj(b):
        def lam(x, i):
            return x * _lcg_plane(b, i)

        return F.aggregate(
            F.transform("embedding", lam),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    proj = [_proj(b) for b in range(_LSH_BITS)]
    bucket = sum(
        (p > 0).cast("long") * F.lit(1 << b) for b, p in enumerate(proj)
    ).alias("bucket")
    with_b = e.select("vec_id", "embedding", bucket)
    q = with_b.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qb"), F.col("embedding").alias("qv")
    )
    masks = [0] + [1 << b for b in range(_LSH_BITS)]
    probes = q.select(
        F.explode(
            F.array(*[F.col("qb").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("pb"),
        "qv",
    )
    cands = with_b.join(F.broadcast(probes), F.col("bucket") == F.col("pb")).filter(
        F.col("vec_id") != 0
    )
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    scored = cands.select("vec_id", F.round(dot / (nrm("embedding") * nrm("qv")), 4).alias("cos"))
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge), so only 10 rows ever reach the
    # rank window — never a global single-task WindowExec over all scores
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rnk", F.row_number().over(w))


_IVF_K = 8  # coarse centroids; nprobe=2
_IVF_SEED_BASE = 100  # keep centroid LCG streams disjoint from LSH planes


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN (the scale path next to LSH): deterministic LCG
    coarse centroids, every vector assigned to its max-inner-product
    centroid, the query probes its top-2 centroids, exact cosine top-10
    inside the probed cells. All arithmetic is plan-side and identical
    in DuckDB — full oracle. At 10^12 scale the assignment pass is one
    projection and the probe prunes the scan to nprobe/K of the data."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def centroid_dot(k):
        def lam(x, i):
            return x * _lcg_plane(_IVF_SEED_BASE + k, i)

        return F.aggregate(
            F.transform("embedding", lam),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )

    ds = F.array(*[centroid_dot(k) for k in range(_IVF_K)])
    c1 = F.array_position(ds, F.array_max(ds)) - 1
    withc = e.select("vec_id", "embedding", ds.alias("ds"), c1.alias("cluster"))
    qrow = withc.filter(F.col("vec_id") == 0)
    # query's second-best centroid: mask the best, argmax again
    def second(dscol, best):
        masked = F.transform(
            dscol, lambda x, i: F.when(i == best, F.lit(-1e18)).otherwise(x)
        )
        return F.array_position(dscol, F.array_max(masked)) - 1

    q = qrow.select(
        F.col("embedding").alias("qv"),
        F.col("cluster").alias("qc1"),
        second(F.col("ds"), F.col("cluster")).alias("qc2"),
    )
    cands = withc.crossJoin(F.broadcast(q)).filter(
        (F.col("vec_id") != 0)
        & ((F.col("cluster") == F.col("qc1")) | (F.col("cluster") == F.col("qc2")))
    )
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(F.col(c), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )
    scored = cands.select("vec_id", F.round(dot / (nrm("embedding") * nrm("qv")), 4).alias("cos"))
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge), so only 10 rows ever reach the
    # rank window — never a global single-task WindowExec over all scores
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.withColumn("rnk", F.row_number().over(w))


def _sql_ivf() -> str:
    dots = ", ".join(
        "list_sum(list_transform(embedding, (x, i) -> x * "
        f"(((1103515245 * ({(_IVF_SEED_BASE + k) * 1024} + (i - 1)) + 12345) % 2147483648)"
        " / 2147483648.0 - 0.5)))"
        for k in range(_IVF_K)
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding, [{dots}] AS ds FROM embeddings
), withc AS (
  SELECT vec_id, embedding, ds, list_indexof(ds, list_max(ds)) - 1 AS cluster FROM base
), q AS (
  SELECT embedding AS qv, cluster AS qc1,
         list_indexof(ds, list_max(
           list_transform(ds, (x, i) -> CASE WHEN i - 1 = cluster THEN -1e18 ELSE x END)
         )) - 1 AS qc2
  FROM withc WHERE vec_id = 0
), scored AS (
  SELECT w.vec_id,
         round(list_dot_product(w.embedding, q.qv) /
               (sqrt(list_dot_product(w.embedding, w.embedding)) *
                sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos
  FROM withc w, q
  WHERE w.vec_id <> 0 AND (w.cluster = q.qc1 OR w.cluster = q.qc2)
)
SELECT vec_id, cos, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rnk
FROM scored QUALIFY rnk <= 10
"""


SQL_ANN_IVF_TOPK = _sql_ivf()


def _sql_lsh_bucket() -> str:
    """DuckDB bucket expression mirroring _lcg_plane (i is 1-based in
    DuckDB list lambdas, hence i-1)."""
    bits = []
    for b in range(_LSH_BITS):
        dot = (
            "list_sum(list_transform(embedding, (x, i) -> x * "
            f"(((1103515245 * ({b * 1024} + (i - 1)) + 12345) % 2147483648)"
            " / 2147483648.0 - 0.5)))"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END) * {1 << b}")
    return " + ".join(bits)


SQL_ANN_LSH_TOPK = f"""
WITH b AS (
  SELECT vec_id, embedding, {_sql_lsh_bucket()} AS bucket FROM embeddings
), q AS (
  SELECT bucket AS qb, embedding AS qv FROM b WHERE vec_id = 0
), probes AS (
  SELECT xor(qb, m.mask) AS pb, qv
  FROM q, (VALUES {", ".join(f"({m})" for m in [0] + [1 << b for b in range(_LSH_BITS)])}) m(mask)
), scored AS (
  SELECT b.vec_id,
         round(list_dot_product(b.embedding, p.qv) /
               (sqrt(list_dot_product(b.embedding, b.embedding)) *
                sqrt(list_dot_product(p.qv, p.qv))), 4) AS cos
  FROM b, probes p WHERE b.bucket = p.pb AND b.vec_id <> 0
)
SELECT vec_id, cos, row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rnk
FROM scored QUALIFY rnk <= 10
"""


QUERIES.update(
    {
        "cosine_neardup_pairs": q_cosine_neardup_pairs,
        "ngram_jaccard_candidates": q_ngram_jaccard_candidates,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
    }
)
ORACLES.update(
    {
        "cosine_neardup_pairs": SQL_COSINE_NEARDUP_PAIRS,
        "ngram_jaccard_candidates": SQL_NGRAM_JACCARD_CANDIDATES,
        "ann_lsh_topk": SQL_ANN_LSH_TOPK,
        "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    }
)


def q_near_dedup_stats(spark, sf_dir):
    """Full near-dedup pipeline over documents (LSH -> exact-Jaccard
    verify -> components -> survivor selection).

    The oracle computes the ground truth directly: every exact
    9-gram-Jaccard >= 0.8 pair, connected components via a recursive
    CTE, survivors = one doc per component. The two agree iff the LSH
    candidate stage has 100% recall on the fixture's true pairs (the
    b=8/r=3/k=9 curve catches a 0.8-Jaccard pair w.p. 0.9972; verified
    empirically at sf0.01 and sf0.1) AND the verify/component/survivor
    stages are correct — a full-pipeline value check, not rows-only."""
    from .dedup import near_dedup

    d = _t(spark, sf_dir, "documents")
    out = near_dedup(d, "text", "doc_id", threshold=0.8)
    return spark.createDataFrame(
        [(d.count(), out.count())], "n_before long, n_after long"
    ).withColumn("n_removed", F.col("n_before") - F.col("n_after"))


SQL_NEAR_DEDUP_STATS = f"""
WITH RECURSIVE grams AS (
  SELECT DISTINCT doc_id, substr(text, i, 9) AS g
  FROM (SELECT doc_id, text,
               unnest(range(1, greatest(length(text) - 8, 1) + 1)) AS i
        FROM (SELECT doc_id, substr(text, 1, {_SH_CAP}) AS text FROM documents)) src
  WHERE length(substr(text, i, 9)) = 9
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), shared AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS sh
  FROM grams x JOIN grams y USING (g)
  WHERE x.doc_id < y.doc_id GROUP BY 1, 2
), pairs AS (
  SELECT a, b FROM shared
  JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
  WHERE sh * 1.0 / (sa.n + sb.n - sh) >= 0.8
), edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), lbl AS (
  SELECT u AS node, least(u, min(v)) AS lbl FROM reach GROUP BY u
), stats AS (
  SELECT count(*) AS nodes, count(DISTINCT lbl) AS comps FROM lbl
)
SELECT (SELECT count(*) FROM documents) AS n_before,
       (SELECT count(*) FROM documents) - (nodes - comps) AS n_after,
       (nodes - comps) AS n_removed
FROM stats
"""


QUERIES["near_dedup_stats"] = q_near_dedup_stats
ORACLES["near_dedup_stats"] = SQL_NEAR_DEDUP_STATS


# ---------------------------------------------------------------------------
# OLAP extensions beyond the reference (grouping sets, pivot, sessions)


def q_rollup_orders(spark, sf_dir):
    """Rollup aggregation (grouping-sets family; absent in the reference,
    SURVEY §2.6 — provided as engine surface)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


SQL_ROLLUP_ORDERS = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_pivot_lineitem(spark, sf_dir):
    """Pivot l_linestatus into columns (portable oracle via CASE sums)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )


SQL_PIVOT_LINEITEM = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


def q_sessionize_batch(spark, sf_dir):
    """Batch sessionization: lag + cumulative gap counter per user (the
    batch twin of streaming.sessionize); 30-minute gap."""
    e = _t(spark, sf_dir, "events").withColumn("tse", F.unix_timestamp(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    gap = F.col("tse") - F.lag("tse").over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess_id = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = e.select("user_id", sess_id.alias("sess")).groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("n_events"),
    )


SQL_SESSIONIZE_BATCH = """
WITH e AS (
  SELECT user_id, event_id, epoch(ts) AS tse FROM events
), flagged AS (
  SELECT user_id, tse,
         CASE WHEN lag(tse) OVER w IS NULL OR tse - lag(tse) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess,
         row_number() OVER w AS rn
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tse, event_id)
), sess AS (
  SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id ORDER BY rn ROWS UNBOUNDED PRECEDING) AS sess
  FROM flagged
), grouped AS (
  SELECT user_id, sess, count(*) AS n_events FROM sess GROUP BY user_id, sess
)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
       cast(sum(n_events) AS BIGINT) AS n_events
FROM grouped GROUP BY user_id
"""


def _records_fixture() -> str:
    """Deterministic binary-record fixture + parquet twin at a fixed
    path (written once): three files (v1 git-hash, v2 big-endian, v3)
    so the query exercises version inference, byteswap, and sub-file
    splitting; the parquet twin is what the DuckDB oracle reads."""
    import numpy as np

    from .binsource import synthesize_records, write_record_file

    base = os.path.join(tempfile.gettempdir(), "sparkcodec_records_fixture")
    if not os.path.isdir(base):
        # build in a unique dir, then atomic rename: concurrent creators
        # (e.g. driver oracle vs Spark query) race harmlessly
        import pandas as _pd
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        stage = tempfile.mkdtemp(prefix="sparkcodec_records_stage_")
        specs = [
            ("r_v1.bin", 1, "cafed00d", False, 11),
            ("r_v2.bin", 2, "5.1", True, 12),
            ("r_v3.bin", 3, "6.0", False, 13),
        ]
        frames = []
        for name, v, vs, be, seed in specs:
            recs = synthesize_records(700, version=v, seed=seed)
            write_record_file(os.path.join(stage, name), recs, version_string=vs, big_endian=be)
            pdf = _pd.DataFrame({n: recs[n] for n in recs.dtype.names if not n.startswith("_")})
            pdf["version"] = np.int32(v)
            frames.append(pdf)
        allpdf = _pd.concat(frames, ignore_index=True)
        _pq.write_table(_pa.Table.from_pandas(allpdf), os.path.join(stage, "twin.parquet"))
        try:
            os.rename(stage, base)
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)  # lost the race: use winner's
    return base


RECORDS_TWIN = os.path.join(
    tempfile.gettempdir(), "sparkcodec_records_fixture", "twin.parquet"
)


def q_record_source_roundtrip(spark, sf_dir):
    """S1-S3 + sub-file splitting end-to-end: read the binary record
    fixture in many small slices (forcing multi-task per file), then
    aggregate per (version, pre_gid); the oracle aggregates the parquet
    twin of the same records."""
    from .binsource import read_records

    base = _records_fixture()
    df = read_records(spark, os.path.join(base, "*.bin"), rows_per_slice=97)
    return df.groupBy("version", "pre_gid").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("post_gid").cast("long")).alias("sum_post"),
        F.round(F.sum("distance_soma").cast("double"), 3).alias("sum_dist"),
        F.max("pre_section").cast("int").alias("max_pre_section"),
    )


SQL_RECORD_SOURCE_ROUNDTRIP = f"""
SELECT version, pre_gid, count(*) AS n_rows,
       cast(sum(post_gid) AS BIGINT) AS sum_post,
       round(cast(sum(cast(distance_soma AS DOUBLE)) AS DOUBLE), 3) AS sum_dist,
       cast(max(pre_section) AS INTEGER) AS max_pre_section
FROM read_parquet('{RECORDS_TWIN}')
GROUP BY version, pre_gid
"""


def q_conversion_pipeline(spark, sf_dir):
    """The reference's full conversion chain as ONE oracled query,
    closing the seven §2 surfaces that had only pytest coverage:
    S1–S3 binary fixture scan; R7 deterministic file ordering (per-file
    provenance survives to the output groups); P5 validation predicate;
    P1 rename projection; P2 column drop; S10 record-limit export
    (deterministic: total order first, the reference's rank-0-first
    semantics); P7 field-metadata routing through a real encode/decode
    round-trip; T5 progress monitoring (rows_done / completion fraction
    in the result). Reference analog: the fixture chain
    tests/CMakeLists.txt:13–19 + .ci/test_circuit1k_touches.sh
    (touch2parquet → parquet2hdf5 with --exclude / exportN flags)."""
    import shutil

    from .binsource import read_records
    from .engine import decode_table, encode_progress, encode_table
    from .pipeline import drop_columns, export_n, rename_touch_columns, validate_section_range

    base = _records_fixture()
    raw = read_records(spark, os.path.join(base, "*.bin"), rows_per_slice=131)
    val = validate_section_range(raw, "pre_section")                    # P5
    ren = rename_touch_columns(val, version=3,
                               keep=["version", "source_file"])         # P1
    drp = drop_columns(
        ren, ["spine_length", "efferent_section_type",
              "afferent_section_type", "branch_order"]
    )                                                                   # P2
    sort_cols = [
        "version", "source_node_id", "target_node_id",
        "efferent_section_id", "efferent_segment_id",
        "efferent_segment_offset", "afferent_segment_offset",
        "distance_soma",
    ]
    capped = export_n(drp.orderBy(*sort_cols), 1500)                    # S10
    capped = capped.withColumn(
        "src_file", F.element_at(F.split(F.col("source_file"), "/"), -1)
    ).drop("source_file")                                               # R7
    capped = capped.withMetadata("distance_soma", {"units": "um"})      # P7 in
    out = _workdir(sf_dir, "convpipe")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, capped, out,
        cluster_by=["version"], salt_by=["source_node_id"],
        sort_by=["version", "source_node_id"],
        num_parts=4, resume=False,
    )
    prog = encode_progress(out)                                         # T5
    from .engine import snapshot_parts

    # progress must agree with the committed snapshot: every live part
    # reported done (empty hash partitions never materialize a part, so
    # the raw done/num_parts fraction is not the completion signal)
    prog_ok = prog["parts_done"] == len(snapshot_parts(out) or [])
    dec = decode_table(spark, out)
    units = dec.schema["distance_soma"].metadata.get("units", "LOST")   # P7 out
    return (
        dec.groupBy("version", "src_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("source_node_id").cast("long")).alias("sum_src"),
            F.max("target_node_id").alias("max_tgt"),
            F.round(F.sum(F.col("distance_soma").cast("double")), 3).alias("sum_dist"),
        )
        .withColumn("units", F.lit(units))
        .withColumn("rows_done", F.lit(int(prog["rows_done"])).cast("long"))
        .withColumn("progress_consistent", F.lit(bool(prog_ok)))
    )


SQL_CONVERSION_PIPELINE = f"""
WITH son AS (
  SELECT version,
         'r_v' || CAST(version AS VARCHAR) || '.bin' AS src_file,
         pre_gid  AS source_node_id,
         post_gid AS target_node_id,
         pre_section AS efferent_section_id,
         pre_segment AS efferent_segment_id,
         pre_offset  AS efferent_segment_offset,
         post_offset AS afferent_segment_offset,
         distance_soma
  FROM read_parquet('{RECORDS_TWIN}')
  WHERE pre_section <= 32767
), capped AS (
  SELECT * FROM son
  ORDER BY version, source_node_id, target_node_id, efferent_section_id,
           efferent_segment_id, efferent_segment_offset,
           afferent_segment_offset, distance_soma
  LIMIT 1500
)
SELECT version, src_file,
       count(*) AS n_rows,
       cast(sum(source_node_id) AS BIGINT) AS sum_src,
       max(target_node_id) AS max_tgt,
       round(cast(sum(cast(distance_soma AS DOUBLE)) AS DOUBLE), 3) AS sum_dist,
       'um' AS units,
       cast(1500 AS BIGINT) AS rows_done,
       TRUE AS progress_consistent
FROM capped GROUP BY version, src_file
"""


def q_field_id_reread(spark, sf_dir):
    """Field-id column identity (Iceberg semantics): drop a column, then
    re-add the NAME with different values — the tip must read the old
    parts' column as NULL (the retired field id never resurrects its
    historical bytes), while time travel to the pre-drop snapshot still
    shows the original values. One row of aggregates over both reads:
    sum_tip/nn_tip count ONLY the re-added rows' values (a resurrection
    bug would inflate them with the old n_chars and fail the hash)."""
    import shutil

    from .engine import decode_table, drop_column, encode_table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = _workdir(sf_dir, "fieldid")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(cluster_by=["lang"], salt_by=["doc_id"],
              sort_by=["lang", "doc_id"], num_parts=4)
    m0 = encode_table(spark, d, out, resume=False, **kw)     # pre-drop snapshot
    pre_sid = m0["snapshot_id"]
    drop_column(out, "n_chars")
    re_added = d.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "lang"
    ).withColumn("n_chars", (F.col("doc_id") % 7).cast("long"))
    encode_table(spark, re_added, out, append=True, **kw)
    tip = decode_table(spark, out).agg(
        F.count(F.lit(1)).alias("n_rows_tip"),
        F.sum("n_chars").alias("sum_tip"),
        F.count("n_chars").alias("nn_tip"),
    )
    pre = decode_table(spark, out, snapshot_id=pre_sid).agg(
        F.sum("n_chars").alias("sum_pre"),
        F.count(F.lit(1)).alias("n_pre"),
    )
    return tip.crossJoin(F.broadcast(pre))


SQL_FIELD_ID_REREAD = """
WITH base AS (SELECT doc_id, n_chars FROM documents),
     added AS (SELECT doc_id + 5000000 AS doc_id,
                      (doc_id + 5000000) % 7 AS n_chars
               FROM documents)
SELECT (SELECT count(*) * 2 FROM base) AS n_rows_tip,
       (SELECT cast(sum(n_chars) AS BIGINT) FROM added) AS sum_tip,
       (SELECT count(*) FROM added) AS nn_tip,
       (SELECT cast(sum(n_chars) AS BIGINT) FROM base) AS sum_pre,
       (SELECT count(*) FROM base) AS n_pre
"""


def q_diverged_merge(spark, sf_dir):
    """Row-level rebase (git-rebase semantics for a DIVERGED branch):
    main deletes a doc_id range AFTER the branch forked, the branch
    upserts keys overlapping that range — a part-level merge must
    refuse (both sides rewrote the same parts), so merge_branch replays
    the branch's recorded upsert on the post-delete tip and then
    fast-forwards. Final state = main's delete AND the branch's upsert
    both applied: docs 100–199 gone except the multiples of 10 the
    upsert re-inserted with n_chars = -1."""
    import shutil

    from .engine import (
        create_branch,
        decode_table,
        delete_rows,
        encode_table,
        merge_branch,
        upsert_rows,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = _workdir(sf_dir, "divmerge")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(cluster_by=["lang"], salt_by=["doc_id"],
              sort_by=["lang", "doc_id"], num_parts=4)
    encode_table(spark, d, out, resume=False, **kw)
    create_branch(out, "fix")
    up = d.where(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.lit(-1).cast("long")
    )
    upsert_rows(spark, up, out, "doc_id", branch="fix", **kw)
    delete_rows(spark, out, ("doc_id", 100, 199))  # main moves: diverged
    merge_branch(out, "fix", spark=spark)          # replay + fast-forward
    return decode_table(spark, out).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.when(F.col("n_chars") == -1, 1).otherwise(0)).alias("n_upserted"),
    )


SQL_DIVERGED_MERGE = """
WITH up AS (SELECT doc_id, lang, CAST(-1 AS BIGINT) AS n_chars
            FROM documents WHERE doc_id % 10 = 0),
     kept AS (SELECT doc_id, lang, n_chars FROM documents
              WHERE doc_id % 10 <> 0
                AND NOT (doc_id BETWEEN 100 AND 199)),
     final AS (SELECT * FROM kept UNION ALL SELECT * FROM up)
SELECT lang, count(*) AS n_rows,
       cast(sum(n_chars) AS BIGINT) AS sum_chars,
       cast(sum(CASE WHEN n_chars = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_upserted
FROM final GROUP BY lang
"""


def q_rename_column_read(spark, sf_dir):
    """RENAME COLUMN as metadata only (field-id identity): rename
    n_chars -> length, append new rows under the NEW name, then read
    everything back through the renamed schema WITH a pushdown
    predicate on the renamed column — old parts resolve the new name to
    their old block files via per-part field ids (no rewrite, no data
    movement), and block pruning follows the same alias."""
    import shutil

    from .engine import decode_table, encode_table, rename_column

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = _workdir(sf_dir, "rencol")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(cluster_by=["lang"], salt_by=["doc_id"],
              sort_by=["lang", "doc_id"], num_parts=4)
    encode_table(spark, d, out, resume=False, **kw)
    rename_column(out, "n_chars", "length")
    more = d.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "lang",
        (F.col("n_chars") + 1).alias("length"),
    )
    encode_table(spark, more, out, append=True, **kw)
    dec = decode_table(spark, out, where=("length", 100, None))
    return (
        dec.where("length >= 100")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("length").alias("sum_len"),
            F.max("doc_id").alias("max_doc"),
        )
    )


SQL_RENAME_COLUMN_READ = """
WITH unioned AS (
  SELECT doc_id, lang, n_chars AS length FROM documents
  UNION ALL
  SELECT doc_id + 5000000, lang, n_chars + 1 FROM documents
)
SELECT lang, count(*) AS n_rows,
       cast(sum(length) AS BIGINT) AS sum_len,
       max(doc_id) AS max_doc
FROM unioned WHERE length >= 100 GROUP BY lang
"""


QUERIES.update(
    {
        "rollup_orders": q_rollup_orders,
        "pivot_lineitem": q_pivot_lineitem,
        "sessionize_batch": q_sessionize_batch,
        "record_source_roundtrip": q_record_source_roundtrip,
        "conversion_pipeline": q_conversion_pipeline,
        "field_id_reread": q_field_id_reread,
        "diverged_merge": q_diverged_merge,
        "rename_column_read": q_rename_column_read,
    }
)
def q_repetition_stats(spark, sf_dir):
    """Repetition-based quality filter (the classic degenerate-text
    screen in training-data pipelines): per-document word-repetition
    ratio = 1 - distinct_words/words, fully JVM-side (split +
    array_distinct — no UDF), aggregated per lang with the count of
    documents over the usual 0.2 rejection threshold. At 100 TB this is
    a pure map-side projection + one small agg — the text never
    shuffles."""
    d = _t(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.col("text")), "\\s+"), lambda w: w != ""
    )
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    rep = F.when(
        n_words > 0, 1.0 - n_distinct.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    return d.select("lang", rep.alias("rep")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("rep"), 4).alias("avg_rep"),
        F.sum((F.col("rep") > 0.2).cast("long")).alias("n_repetitive"),
    )


SQL_REPETITION_STATS = """
WITH w AS (
  SELECT lang,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS words
  FROM documents
), r AS (
  SELECT lang,
         CASE WHEN len(words) > 0
              THEN 1.0 - len(list_distinct(words)) * 1.0 / len(words)
              ELSE 0.0 END AS rep
  FROM w
)
SELECT lang, count(*) AS n_docs, round(avg(rep), 4) AS avg_rep,
       cast(sum(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
FROM r GROUP BY lang
"""


def q_add_column_default(spark, sf_dir):
    """ADD COLUMN with an Iceberg initial DEFAULT: pre-add rows read the
    default, post-add rows keep stored values including stored NULLs
    (the distinction a DataFrame-level coalesce cannot make), and a
    pruned read on the defaulted column must still return the default
    rows (predicates on defaulted columns skip pruning)."""
    import shutil

    from .engine import add_column, decode_table, encode_table

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = _workdir(sf_dir, "addcol")
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(cluster_by=["lang"], salt_by=["doc_id"],
              sort_by=["lang", "doc_id"], num_parts=4)
    encode_table(spark, d, out, resume=False, **kw)
    add_column(out, "score", "i64", default=7)
    more = d.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "lang")
    more = more.withColumn(
        "score",
        F.when(F.col("doc_id") % 11 == 0, None)
        .otherwise(F.col("doc_id") % 5).cast("long"),
    )
    encode_table(spark, more, out, append=True, **kw)
    dec = decode_table(spark, out, where=("score", 5, None))
    return (
        dec.where("score >= 5")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("score").alias("sum_score"),
        )
    )


SQL_ADD_COLUMN_DEFAULT = """
WITH unioned AS (
  SELECT doc_id, lang, 7 AS score FROM documents
  UNION ALL
  SELECT doc_id + 5000000, lang,
         CASE WHEN (doc_id + 5000000) % 11 = 0 THEN NULL
              ELSE (doc_id + 5000000) % 5 END
  FROM documents
)
SELECT lang, count(*) AS n_rows, cast(sum(score) AS BIGINT) AS sum_score
FROM unioned WHERE score >= 5 GROUP BY lang
"""


QUERIES["repetition_stats"] = q_repetition_stats
ORACLES["repetition_stats"] = SQL_REPETITION_STATS
QUERIES["add_column_default"] = q_add_column_default
ORACLES["add_column_default"] = SQL_ADD_COLUMN_DEFAULT
ORACLES["field_id_reread"] = SQL_FIELD_ID_REREAD
ORACLES["diverged_merge"] = SQL_DIVERGED_MERGE
ORACLES["rename_column_read"] = SQL_RENAME_COLUMN_READ
ORACLES["record_source_roundtrip"] = SQL_RECORD_SOURCE_ROUNDTRIP
ORACLES["conversion_pipeline"] = SQL_CONVERSION_PIPELINE
ORACLES.update(
    {
        "rollup_orders": SQL_ROLLUP_ORDERS,
        "pivot_lineitem": SQL_PIVOT_LINEITEM,
        "sessionize_batch": SQL_SESSIONIZE_BATCH,
    }
)
QUERIES["winnow_fingerprints"] = q_winnow_fingerprints
ORACLES["winnow_fingerprints"] = SQL_WINNOW_FINGERPRINTS


def q_pruned_decode(spark, sf_dir):
    """Zone-map predicate pushdown into the encoded format: encode
    documents clustered by lang, then decode with where=('lang','de','de')
    — parts whose lineage [min,max] bounds exclude 'de' are never read
    (the engine's analog of parquet row-group pruning; at 10^12 scale a
    cluster-key predicate skips all but a handful of parts). Pruning is
    conservative, so the exact filter composes on top; the oracle
    aggregates the filtered source directly."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "prune")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    dec = decode_table(spark, out, where=("lang", "de", "de"))
    return (
        dec.filter(F.col("lang") == "de")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_text_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_PRUNED_DECODE = """
SELECT lang, count(*) AS n_docs,
       cast(sum(length(text)) AS BIGINT) AS total_text_chars,
       max(doc_id) AS max_doc_id
FROM documents WHERE lang = 'de' GROUP BY lang
"""

QUERIES["pruned_decode"] = q_pruned_decode
ORACLES["pruned_decode"] = SQL_PRUNED_DECODE


def q_datasource_pruned_read(spark, sf_dir):
    """The plain-Spark read surface end-to-end: encode documents
    clustered by lang, read back via ``spark.read.format("sparkcodec")``
    with a column projection (``columns`` option — only the named
    columns' block files are opened) and a Catalyst filter whose pushed
    bounds drive zone-map part/block pruning, then aggregate. The oracle
    aggregates the filtered source parquet directly, so any pruning
    wrongness (dropped matching blocks) or decode corruption breaks the
    match."""
    from .datasource import SparkcodecDataSource
    from .engine import encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "dsread")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    try:
        spark.dataSource.register(SparkcodecDataSource)
    except Exception:
        pass  # already registered in this session
    try:
        # dynamic conf; needed for pushFilters to be consulted (pruning
        # only — results are exact either way, Spark re-applies filters)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    ds = (
        spark.read.format("sparkcodec")
        .option("columns", "doc_id,lang,n_chars")
        .load(out)
    )
    return (
        ds.filter(F.col("lang") == "de")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_DATASOURCE_PRUNED_READ = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents WHERE lang = 'de' GROUP BY lang
"""

QUERIES["datasource_pruned_read"] = q_datasource_pruned_read
ORACLES["datasource_pruned_read"] = SQL_DATASOURCE_PRUNED_READ


def q_delete_rows_stats(spark, sf_dir):
    """Row-level DELETE end-to-end: encode documents, delete the 'de'
    rows as a copy-on-write snapshot (zone maps bound the rewrite to the
    parts whose [min,max] can hold 'de'), decode the latest snapshot and
    aggregate. The oracle aggregates the source minus the deleted range,
    so a delete that drops too much, too little, or corrupts surviving
    rows breaks the match."""
    from .engine import decode_table, delete_rows, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "delete")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    delete_rows(spark, out, ("lang", "de", "de"))
    dec = decode_table(spark, out)
    return dec.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_text_chars"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_DELETE_ROWS_STATS = """
SELECT lang, count(*) AS n_docs,
       cast(sum(length(text)) AS BIGINT) AS total_text_chars,
       max(doc_id) AS max_doc_id
FROM documents WHERE lang <> 'de' GROUP BY lang
"""

QUERIES["delete_rows_stats"] = q_delete_rows_stats
ORACLES["delete_rows_stats"] = SQL_DELETE_ROWS_STATS


def q_multi_pred_prune(spark, sf_dir):
    """Conjunctive predicate pushdown into the encoded format: encode
    documents clustered by lang and sorted by (lang, doc_id), then decode
    with where=[('lang','de','de'), ('doc_id', 50, 300)] — each predicate
    prunes parts (zone map + value set + bloom for the point predicate)
    and blocks independently, and the surviving block row ranges
    INTERSECT, so the scan reads strictly fewer bytes than either
    predicate alone (asserted with I/O counters in
    tests/test_engine.py). Pruning stays conservative; the exact filter
    composes on top and the oracle aggregates the filtered source."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "mpred")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    dec = decode_table(
        spark, out, where=[("lang", "de", "de"), ("doc_id", 50, 300)]
    )
    return (
        dec.filter((F.col("lang") == "de") & F.col("doc_id").between(50, 300))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_text_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_MULTI_PRED_PRUNE = """
SELECT lang, count(*) AS n_docs,
       cast(sum(length(text)) AS BIGINT) AS total_text_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents WHERE lang = 'de' AND doc_id BETWEEN 50 AND 300 GROUP BY lang
"""

QUERIES["multi_pred_prune"] = q_multi_pred_prune
ORACLES["multi_pred_prune"] = SQL_MULTI_PRED_PRUNE


def q_merge_upsert_stats(spark, sf_dir):
    """Atomic key-MERGE end-to-end: encode documents, upsert a batch that
    REPLACES every 'de' row (same doc_id, new lang/text) and INSERTS new
    doc_ids above the existing range, then decode the latest snapshot and
    aggregate. One combined snapshot carries the rewrites and the appends
    (engine.upsert_rows), so a merge that loses replacements, duplicates
    keys, or corrupts survivors breaks the oracle match — the oracle
    computes the same post-merge table relationally (anti-join ∪ updates
    ∪ inserts)."""
    from .engine import decode_table, encode_table, upsert_rows

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "merge")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    updates = d.filter(F.col("lang") == "de").select(
        "doc_id",
        F.concat(F.lit("merged-"), F.col("doc_id")).alias("text"),
        F.lit("xx").alias("lang"),
        F.col("source"),
        F.length(F.concat(F.lit("merged-"), F.col("doc_id"))).cast("long").alias("n_chars"),
    )
    inserts = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.concat(F.lit("new-"), F.col("doc_id")).alias("text"),
        F.lit("zz").alias("lang"),
        F.col("source"),
        F.length(F.concat(F.lit("new-"), F.col("doc_id"))).cast("long").alias("n_chars"),
    )
    batch = updates.unionByName(inserts).select(*d.columns)
    upsert_rows(
        spark, batch, out, "doc_id",
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=2,
    )
    dec = decode_table(spark, out)
    return dec.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_MERGE_UPSERT_STATS = """
WITH merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents WHERE lang <> 'de'
  UNION ALL
  SELECT doc_id, 'merged-' || doc_id AS text, 'xx' AS lang, source,
         length('merged-' || doc_id) AS n_chars
  FROM documents WHERE lang = 'de'
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'new-' || doc_id AS text, 'zz' AS lang,
         source, length('new-' || doc_id) AS n_chars
  FROM documents WHERE doc_id < 20
)
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM merged GROUP BY lang
"""

QUERIES["merge_upsert_stats"] = q_merge_upsert_stats
ORACLES["merge_upsert_stats"] = SQL_MERGE_UPSERT_STATS


def q_in_list_prune(spark, sf_dir):
    """IN-list predicate pushdown into the encoded format: decode with
    where=('lang', ['de', 'fr']) — parts are refuted through zone-map
    span, exact value sets, and bloom filters probing ALL list values at
    once; blocks survive only when some probe value falls inside their
    [min, max]. Conservative as always; the exact isin filter composes
    and the oracle aggregates the filtered source."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "inlist")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    dec = decode_table(spark, out, where=("lang", ["de", "fr"]))
    return (
        dec.filter(F.col("lang").isin("de", "fr"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_IN_LIST_PRUNE = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents WHERE lang IN ('de', 'fr') GROUP BY lang
"""

QUERIES["in_list_prune"] = q_in_list_prune
ORACLES["in_list_prune"] = SQL_IN_LIST_PRUNE


def q_metadata_stats(spark, sf_dir):
    """Metadata-only table statistics (the Iceberg table-stats idiom):
    after encoding, per-column EXACT min/max/null-count/row-count come
    from one O(#parts) checkpoint read — zero payload decode, zero Spark
    jobs (engine.table_column_stats). The oracle recomputes the same
    numbers relationally over the source, so a zone map that ever
    recorded a wrong bound (or a null count that drifted) breaks the
    hash match."""
    from .engine import encode_table, table_column_stats

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "mstats")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    st = table_column_stats(out)
    rows = [
        (c, str(st[c]["min"]), str(st[c]["max"]), st[c]["nulls"], st[c]["rows"])
        for c in ("doc_id", "n_chars", "lang")
    ]
    return spark.createDataFrame(
        rows, "col string, mn string, mx string, nulls long, n_rows long"
    )


SQL_METADATA_STATS = """
SELECT 'doc_id' AS col, cast(min(doc_id) AS VARCHAR) AS mn,
       cast(max(doc_id) AS VARCHAR) AS mx,
       cast(count(*) - count(doc_id) AS BIGINT) AS nulls,
       count(*) AS n_rows FROM documents
UNION ALL
SELECT 'n_chars', cast(min(n_chars) AS VARCHAR), cast(max(n_chars) AS VARCHAR),
       cast(count(*) - count(n_chars) AS BIGINT), count(*) FROM documents
UNION ALL
SELECT 'lang', cast(min(lang) AS VARCHAR), cast(max(lang) AS VARCHAR),
       cast(count(*) - count(lang) AS BIGINT), count(*) FROM documents
"""

QUERIES["metadata_stats"] = q_metadata_stats
ORACLES["metadata_stats"] = SQL_METADATA_STATS


def q_zorder_prune(spark, sf_dir):
    """Z-order multidimensional clustering end-to-end: encode documents
    sorted by the interleaved Morton value of (doc_id, n_chars) — parts
    are contiguous z-ranges — then decode under a conjunctive predicate
    on BOTH dimensions. Each dimension's zone maps prune parts and
    blocks (a lexicographic sort only serves its leading column;
    measured 2.6x fewer bytes read for a 2-D square probe at 100k rows).
    Pruning stays conservative; the exact filter composes and the oracle
    aggregates the filtered source."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "zorder")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=None, zorder_by=["doc_id", "n_chars"],
        num_parts=8, resume=False,
    )
    dec = decode_table(
        spark, out, where=[("doc_id", 100, 300), ("n_chars", 200, 2000)]
    )
    return (
        dec.filter(
            F.col("doc_id").between(100, 300)
            & F.col("n_chars").between(200, 2000)
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_ZORDER_PRUNE = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents
WHERE doc_id BETWEEN 100 AND 300 AND n_chars BETWEEN 200 AND 2000
GROUP BY lang
"""

QUERIES["zorder_prune"] = q_zorder_prune
ORACLES["zorder_prune"] = SQL_ZORDER_PRUNE


def q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 embedding quantization — the 4x storage shrink a
    training pipeline applies before ANN indexing: per-vector max-abs
    scale, q = floor(x / scale * 127 + 0.5) clamped to [-127, 127]
    (floor(+0.5) rather than round: both engines floor identically, so
    no HALF_UP-vs-banker's drift). Pure Catalyst HOFs (transform /
    aggregate) — no Python in the row path. The result checksums the
    quantized values and measures reconstruction error, so a wrong
    scale, clamp, or rounding breaks the oracle match."""
    e = _t(spark, sf_dir, "embeddings")
    absmax = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    scale = F.when(absmax > 0, absmax).otherwise(F.lit(1.0)).cast("double")
    q = F.transform(
        "embedding",
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x.cast("double") / scale * 127 + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    with_q = e.select(
        "vec_id",
        scale.alias("scale_raw"),  # UNROUNDED: quantize and mse share it
        q.alias("q"),
    )
    recon_err = F.aggregate(
        F.zip_with(
            "q",
            "orig",
            lambda qi, x: (
                qi.cast("double") * F.col("scale_raw") / 127 - x.cast("double")
            ) ** 2,
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    out = (
        e.select("vec_id", F.col("embedding").alias("orig"))
        .join(with_q, "vec_id")
        .select(
            "vec_id",
            F.round(F.col("scale_raw"), 6).alias("scale"),
            F.aggregate(
                "q", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("q_sum"),
            F.round(recon_err, 6).alias("mse6"),
        )
    )
    return out.orderBy("vec_id")


SQL_EMBEDDING_QUANTIZE = """
WITH base AS (
  SELECT vec_id, embedding,
         CASE WHEN list_max(list_transform(embedding, x -> abs(x))) > 0
              THEN cast(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
              ELSE 1.0 END AS scale
  FROM embeddings
), qd AS (
  SELECT vec_id, embedding, scale,
         list_transform(
           embedding,
           x -> greatest(-127, least(127,
                cast(floor(cast(x AS DOUBLE) / scale * 127 + 0.5) AS INTEGER)))
         ) AS q
  FROM base
)
SELECT vec_id, round(scale, 6) AS scale,
       cast(list_sum(q) AS BIGINT) AS q_sum,
       round(list_sum(list_transform(
         list_zip(q, embedding),
         p -> pow(cast(p[1] AS DOUBLE) * scale / 127 - cast(p[2] AS DOUBLE), 2)
       )), 6) AS mse6
FROM qd ORDER BY vec_id
"""

QUERIES["embedding_quantize"] = q_embedding_quantize
ORACLES["embedding_quantize"] = SQL_EMBEDDING_QUANTIZE


def q_dnf_prune(spark, sf_dir):
    """Disjunctive predicate pushdown (OR of conjunctions) into the
    encoded format: decode with where_any=[lang='de', doc_id BETWEEN 50
    AND 80] — each disjunct prunes parts and blocks independently, the
    survivors UNION (a row matching any disjunct must be read).
    Conservative as always; the exact OR filter composes and the oracle
    aggregates the filtered source."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "dnf")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    dec = decode_table(
        spark, out, where_any=[("lang", "de", "de"), ("doc_id", 50, 80)]
    )
    return (
        dec.filter((F.col("lang") == "de") | F.col("doc_id").between(50, 80))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_DNF_PRUNE = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents
WHERE lang = 'de' OR doc_id BETWEEN 50 AND 80
GROUP BY lang
"""

QUERIES["dnf_prune"] = q_dnf_prune
ORACLES["dnf_prune"] = SQL_DNF_PRUNE

def q_zorder_string_prune(spark, sf_dir):
    """Z-order with a STRING dimension: encode documents clustered on
    the Morton interleave of (lang, doc_id) — lang buckets by exact
    rank dictionary (broadcast-joined; byte-prefix proxy above the
    cap), so the string dimension gets real block/part locality, not
    just the numeric one. Decode under a conjunctive predicate on both
    dimensions: lang's ordinary [min,max] zone maps and doc_id's ranges
    both prune. Exact filter composes; the oracle aggregates the
    filtered source."""
    from .engine import decode_table, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "zstr")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=None, zorder_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    dec = decode_table(
        spark, out, where=[("lang", "de", "fr"), ("doc_id", 100, 400)]
    )
    return (
        dec.filter(
            F.col("lang").between("de", "fr") & F.col("doc_id").between(100, 400)
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_ZORDER_STRING_PRUNE = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
WHERE lang BETWEEN 'de' AND 'fr' AND doc_id BETWEEN 100 AND 400
GROUP BY lang
"""

QUERIES["zorder_string_prune"] = q_zorder_string_prune
ORACLES["zorder_string_prune"] = SQL_ZORDER_STRING_PRUNE

def q_optimize_rewrite_stats(spark, sf_dir):
    """OPTIMIZE as data: encode documents hash-clustered, append a
    second slice, then optimize_table re-clusters the WHOLE live set
    z-ordered (doc_id, n_chars) in one atomic snapshot. The result
    aggregates the post-optimize table under a conjunctive pruned
    predicate AND checks invariants the oracle can see: total rows and
    per-lang counts must equal the plain source aggregate — any row
    lost or duplicated by the rewrite breaks the hash match."""
    from .engine import decode_table, encode_table, optimize_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "optim")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    half = F.col("doc_id") % 2 == 0
    encode_table(
        spark, d.filter(half), out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=4, resume=False,
    )
    encode_table(
        spark, d.filter(~half), out, append=True,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=4, resume=False,
    )
    optimize_table(spark, out, zorder_by=["doc_id", "n_chars"])
    dec = decode_table(
        spark, out, where=[("doc_id", 200, 800), ("n_chars", 100, 3000)]
    )
    return (
        dec.filter(
            F.col("doc_id").between(200, 800) & F.col("n_chars").between(100, 3000)
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


SQL_OPTIMIZE_REWRITE_STATS = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents
WHERE doc_id BETWEEN 200 AND 800 AND n_chars BETWEEN 100 AND 3000
GROUP BY lang
"""

QUERIES["optimize_rewrite_stats"] = q_optimize_rewrite_stats
ORACLES["optimize_rewrite_stats"] = SQL_OPTIMIZE_REWRITE_STATS

def q_train_split_stats(spark, sf_dir):
    """Deterministic train/valid/test assignment — the split every
    training pipeline needs to be STABLE across runs, machines, and
    engines: bucket = first 24 bits of md5(doc_id) mod 100, 80/10/10.
    Content-independent (ids, not text) so editing a document never
    migrates it across splits, and hash-based (not modulo-id) so
    correlated id ranges don't bias a split. Pure Catalyst; the oracle
    recomputes the same md5 buckets in DuckDB, so any hash or boundary
    drift breaks the value match."""
    d = _t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    bucket = h % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


SQL_TRAIN_SPLIT_STATS = """
SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END
           AS split,
       count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id
FROM (
    SELECT (('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 6))::BIGINT) % 100
               AS b,
           n_chars, doc_id
    FROM documents
) t
GROUP BY 1
"""

QUERIES["train_split_stats"] = q_train_split_stats
ORACLES["train_split_stats"] = SQL_TRAIN_SPLIT_STATS

def q_tagged_snapshot_read(spark, sf_dir):
    """Dataset versioning end-to-end: encode the even-doc_id half, pin
    tag 'v1', append the odd half, EXPIRE all untagged history, then
    read back through the tag. The ref read must reproduce exactly the
    even half — if expire reclaimed a tagged part, the materialized
    tag_only root mis-resolved, or ref routing read the tip, the counts
    and sums diverge from the oracle's doc_id % 2 = 0 aggregate."""
    from .engine import (
        decode_table,
        encode_table,
        expire_snapshots,
        tag_snapshot,
    )

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "tagread")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    even = F.col("doc_id") % 2 == 0
    encode_table(
        spark, d.filter(even), out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=4, resume=False,
    )
    tag_snapshot(out, "v1")
    encode_table(
        spark, d.filter(~even), out, append=True,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=4, resume=False,
    )
    expire_snapshots(out, keep_last=1)
    dec = decode_table(spark, out, ref="v1")
    return dec.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_TAGGED_SNAPSHOT_READ = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents
WHERE doc_id % 2 = 0
GROUP BY lang
"""

QUERIES["tagged_snapshot_read"] = q_tagged_snapshot_read
ORACLES["tagged_snapshot_read"] = SQL_TAGGED_SNAPSHOT_READ


def q_cdc_changes(spark, sf_dir):
    """CDC end-to-end: encode all documents (snapshot 1), DELETE a
    doc_id range (snapshot 2), MERGE an every-10th-doc batch (snapshot
    3), then read the change events through engine.table_changes — the
    Delta-CDF-style view whose delete events the append-only changefeed
    cannot express. Deletes are the exact per-key multiset diff of
    removed parts vs rewrite survivors, computed as a distributed
    aggregation over the KEY COLUMN only. The oracle recomputes each
    (snapshot, op) group's key count, row sum, and key span from the
    source table: snapshot 2 deletes exactly the range; snapshot 3
    deletes exactly the still-live merged keys (the range-deleted ones
    are inserts only) and inserts the whole batch."""
    from .engine import delete_rows, encode_table, table_changes, upsert_rows

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "cdc")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    kw = dict(cluster_by=["lang"], salt_by=["doc_id"],
              sort_by=["lang", "doc_id"])
    encode_table(spark, d, out, num_parts=4, resume=False, **kw)
    delete_rows(spark, out, ("doc_id", 100, 199))
    batch = d.filter(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1
    )
    upsert_rows(spark, batch, out, "doc_id", num_parts=2, **kw)
    ch = table_changes(spark, out, "doc_id")
    return ch.groupBy("snapshot_id", "op").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.min("doc_id").alias("min_key"),
        F.max("doc_id").alias("max_key"),
    )


SQL_CDC_CHANGES = """
SELECT * FROM (
    SELECT 1 AS snapshot_id, 'insert' AS op, count(*) AS n_keys,
           count(*) AS n_rows, min(doc_id) AS min_key, max(doc_id) AS max_key
    FROM documents
    UNION ALL
    SELECT 2, 'delete', count(*), count(*), min(doc_id), max(doc_id)
    FROM documents WHERE doc_id BETWEEN 100 AND 199
    UNION ALL
    SELECT 3, 'insert', count(*), count(*), min(doc_id), max(doc_id)
    FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT 3, 'delete', count(*), count(*), min(doc_id), max(doc_id)
    FROM documents WHERE doc_id % 10 = 0 AND doc_id NOT BETWEEN 100 AND 199
) t WHERE n_keys > 0
"""

QUERIES["cdc_changes"] = q_cdc_changes
ORACLES["cdc_changes"] = SQL_CDC_CHANGES


def q_ann_ivf_persisted_topk(spark, sf_dir):
    """ANN through the PERSISTED index (sparkcodec.ann): build the IVF
    postings table once (same deterministic LCG centroids as
    q_ann_ivf_topk, so the same DuckDB oracle verifies this path),
    then answer the query by probing it — driver-side probe-cluster
    selection from ONE vector, pruned postings decode (exact value
    sets refute non-probed parts before any task runs), semi-join back
    to the data table, cosine top-10. At 10^12 scale this replaces the
    per-query assignment scan of the in-plan IVF with an O(nprobe)
    pruned read of a prebuilt index that versions with the data (tags;
    see extend_ann_index for appends without rebuilds)."""
    from .ann import ann_topk, build_ann_index

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = _workdir(sf_dir, "annivf")
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    build_ann_index(spark, e, idx, k=8, seed_base=100)
    return ann_topk(spark, e, idx, query_id=0, nprobe=2, topk=10)


QUERIES["ann_ivf_persisted_topk"] = q_ann_ivf_persisted_topk
ORACLES["ann_ivf_persisted_topk"] = SQL_ANN_IVF_TOPK


# --- benchmark decontamination (n-gram fingerprint overlap vs an eval set)

_DECON_MOD = 31      # every 31st doc contributes a benchmark passage
_DECON_OFF = 20      # passage start (1-based, like SQL substr)
_DECON_LEN = 200     # passage length
_DECON_MIN = 3       # shared fingerprints to flag contamination


def _winnow_fps(d, idcol: str):
    """(id, fp) winnowing fingerprints of ``d``'s ``text`` column — the
    derivation q_winnow_fingerprints documents, factored so corpus and
    benchmark sides compute the identical scheme. Pure JVM array
    expressions; fp set-distinct per document."""
    K, W = _WIN_K, _WIN_W
    d = d.filter(F.length("text") >= K + W - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - (K - 1)),
        lambda i: F.col("text").substr(i, F.lit(K)),
    )
    hs = F.transform(grams, lambda g: _portable_hash(g, 977))
    d2 = d.select(idcol, hs.alias("hs"))
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - (W - 1)),
            lambda p: F.array_min(F.slice(F.col("hs"), p, F.lit(W))),
        )
    )
    return d2.select(idcol, F.explode(sel).alias("fp"))


def q_benchmark_decontaminate(spark, sf_dir):
    """Benchmark decontamination — the LLM-pipeline op that drops
    training docs overlapping an evaluation set: fingerprint the corpus
    AND the benchmark with the same winnowing scheme (any shared
    substring >= k+w-1 chars shares a fingerprint), join on
    fingerprint, and flag (doc, bench item) pairs sharing >=
    _DECON_MIN fingerprints. The benchmark is synthesized
    deterministically from the corpus itself (every _DECON_MODth doc
    contributes one 200-char passage), so source docs MUST flag — a
    built-in positive control the oracle verifies.

    100 TB posture: the benchmark side is tiny by construction (eval
    suites are thousands of items, not billions), so its fingerprints
    BROADCAST — the corpus-side fingerprint stream never shuffles; the
    only exchange is the grouped aggregation over matched pairs, which
    is bounded by actual contamination, not corpus size. Never
    all-pairs."""
    d = _capped_text(_t(spark, sf_dir, "documents"))
    corpus = _winnow_fps(d, "doc_id")
    bench_src = d.filter(F.col("doc_id") % _DECON_MOD == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.col("text").substr(F.lit(_DECON_OFF), F.lit(_DECON_LEN)).alias("text"),
    )
    bfps = _winnow_fps(bench_src, "bench_id")
    pairs = (
        corpus.join(F.broadcast(bfps), "fp")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= _DECON_MIN)
    )
    return pairs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.sum("shared_fps").alias("total_shared"),
        F.min("bench_id").alias("first_bench_id"),
    )


def _sql_winnow_fps(src_sql: str, idcol: str) -> str:
    """DuckDB mirror of _winnow_fps over an arbitrary (id, text) source."""
    return f"""
  SELECT DISTINCT {idcol}, fp FROM (
    SELECT {idcol},
           unnest([list_min(hs[p:p + {_WIN_W - 1}])
                   FOR p IN range(1, len(hs) - {_WIN_W} + 2)]) AS fp
    FROM (
      SELECT {idcol},
             [('0x' || substr(sha256(substr(text, i, {_WIN_K}) || '#977'), 1, 15))::BIGINT
              FOR i IN range(1, length(text) - {_WIN_K} + 2)] AS hs
      FROM ({src_sql}) WHERE length(text) >= {_WIN_K + _WIN_W - 1}
    )
  )"""


SQL_BENCHMARK_DECONTAMINATE = f"""
WITH capped AS (
  SELECT doc_id, substr(text, 1, {_SH_CAP}) AS text FROM documents
), corpus AS ({_sql_winnow_fps("SELECT doc_id, text FROM capped", "doc_id")}
), bench AS ({_sql_winnow_fps(
    f"SELECT doc_id AS bench_id, substr(text, {_DECON_OFF}, {_DECON_LEN}) AS text "
    f"FROM capped WHERE doc_id % {_DECON_MOD} = 0", "bench_id")}
), pairs AS (
  SELECT c.doc_id, b.bench_id, count(*) AS shared_fps
  FROM corpus c JOIN bench b USING (fp)
  GROUP BY 1, 2 HAVING count(*) >= {_DECON_MIN}
)
SELECT doc_id, count(*) AS n_bench_hits,
       cast(sum(shared_fps) AS BIGINT) AS total_shared,
       min(bench_id) AS first_bench_id
FROM pairs GROUP BY doc_id
"""

QUERIES["benchmark_decontaminate"] = q_benchmark_decontaminate
ORACLES["benchmark_decontaminate"] = SQL_BENCHMARK_DECONTAMINATE


# ---------------------------------------------------------------------------
# branches: writable refs + fast-forward merge (engine.create_branch /
# fast_forward — Iceberg branch semantics over the shared snapshot log;
# the reference has no refs, its outputs are write-once directories)


def q_branch_merge_read(spark, sf_dir):
    """Branch workflow end-to-end: encode documents, branch 'fix', and ON
    THE BRANCH delete every 'de' row, then upsert a batch that replaces
    doc_id < 50 and inserts new ids above 2M. Main is read BEFORE the
    fast-forward (must be the untouched original — branch commits are
    invisible bystanders) and AFTER (must be exactly the branch's net
    state, adopted as one atomic snapshot). Both reads aggregate per
    lang under a phase label; the oracle computes both phases
    relationally from the source table, so isolation leaks, a wrong
    fast-forward diff, or double-applied branch commits all break the
    hash."""
    from .engine import (
        create_branch,
        decode_table,
        delete_rows,
        encode_table,
        fast_forward,
        upsert_rows,
    )

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "branch")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=8, resume=False,
    )
    create_branch(out, "fix")
    delete_rows(spark, out, ("lang", "de", "de"), branch="fix")
    upd = d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.concat(F.lit("fix-"), F.col("doc_id")).alias("text"),
        F.lit("bb").alias("lang"),
        F.col("source"),
        F.length(F.concat(F.lit("fix-"), F.col("doc_id"))).cast("long").alias("n_chars"),
    )
    ins = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat(F.lit("new-"), F.col("doc_id")).alias("text"),
        F.lit("nn").alias("lang"),
        F.col("source"),
        F.length(F.concat(F.lit("new-"), F.col("doc_id"))).cast("long").alias("n_chars"),
    )
    batch = upd.unionByName(ins).select(*d.columns)
    upsert_rows(
        spark, batch, out, "doc_id", branch="fix",
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=2,
    )

    def agg(df, phase):
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("doc_id").alias("max_doc_id"),
        ).withColumn("phase", F.lit(phase))

    # decode plans its part list eagerly, so this frame keeps reading
    # main's pre-ff state even after the fast-forward below (copy-on-
    # write: the old parts still exist until expire)
    pre = agg(decode_table(spark, out), "pre_ff")
    ff = fast_forward(out, "fix")
    assert ff["fast_forwarded"] is True
    post = agg(decode_table(spark, out), "post_ff")
    return pre.unionByName(post).select(
        "phase", "lang", "n_docs", "total_chars", "max_doc_id"
    )


SQL_BRANCH_MERGE_READ = """
WITH post AS (
  SELECT doc_id, lang, n_chars FROM documents
  WHERE lang <> 'de' AND doc_id >= 50
  UNION ALL
  SELECT doc_id, 'bb' AS lang, length('fix-' || doc_id) AS n_chars
  FROM documents WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, 'nn' AS lang,
         length('new-' || doc_id) AS n_chars
  FROM documents WHERE doc_id < 30
)
SELECT 'pre_ff' AS phase, lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM documents GROUP BY lang
UNION ALL
SELECT 'post_ff' AS phase, lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       max(doc_id) AS max_doc_id
FROM post GROUP BY lang
"""

QUERIES["branch_merge_read"] = q_branch_merge_read
ORACLES["branch_merge_read"] = SQL_BRANCH_MERGE_READ


# ---------------------------------------------------------------------------
# sequence packing: concat-and-chunk training batches (the GPT-style
# pack: documents in doc_id order are concatenated into one token stream
# and cut every _PACK_CTX tokens). The global running offset is a
# TWO-LEVEL prefix sum — an intra-bucket window (parallel across
# buckets) plus a window over the tiny per-bucket totals broadcast back
# — so no stage ever sees a single global-ordering partition: the same
# gather→scan→scatter choreography as q_prefix_offsets, applied per-row.

_PACK_CTX = 2048
_PACK_BUCKET = 512  # docs per prefix-sum bucket


def q_sequence_packing(spark, sf_dir):
    """Pack documents into fixed-size context windows and audit the
    packs: per pack, how many docs touch it, its token fill (== ctx for
    all but the last pack), and how many docs START in it. A wrong
    offset anywhere shifts every downstream pack boundary, so the
    oracle (a single-window cumsum in DuckDB) catches any error in the
    distributed two-level prefix sum."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    t = d.select("doc_id", toks.alias("n_tok")).withColumn(
        "b", (F.col("doc_id") / _PACK_BUCKET).cast("long")
    )
    w_in = (
        Window.partitionBy("b").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn("local_off", F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)))
    bt = t.groupBy("b").agg(F.sum("n_tok").alias("btot"))
    w_b = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    boff = bt.select(
        "b", F.coalesce(F.sum("btot").over(w_b), F.lit(0)).alias("b_off")
    )
    t = t.join(F.broadcast(boff), "b")
    start = F.col("b_off") + F.col("local_off")
    end = start + F.col("n_tok")
    spans = t.select(
        "doc_id", "n_tok", start.alias("start"), end.alias("end"),
        F.floor(start / _PACK_CTX).alias("p0"),
        F.floor((end - 1) / _PACK_CTX).alias("p1"),
    )
    ex = spans.select(
        "start", "end", F.explode(F.sequence("p0", "p1")).alias("pack_id")
    )
    in_pack = (
        F.least(F.col("end"), (F.col("pack_id") + 1) * _PACK_CTX)
        - F.greatest(F.col("start"), F.col("pack_id") * _PACK_CTX)
    )
    starts_here = (F.col("start") >= F.col("pack_id") * _PACK_CTX).cast("long")
    return ex.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(in_pack).alias("pack_tokens"),
        F.sum(starts_here).alias("n_doc_starts"),
    )


SQL_SEQUENCE_PACKING = f"""
WITH tok AS (
  SELECT doc_id,
         cast(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok
  FROM documents
), cum AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM tok
), spans AS (
  SELECT doc_id, n_tok, s, s + n_tok AS e,
         cast(s // {_PACK_CTX} AS BIGINT) AS p0,
         cast((s + n_tok - 1) // {_PACK_CTX} AS BIGINT) AS p1
  FROM cum
), ex AS (
  SELECT s, e, unnest(range(p0, p1 + 1)) AS pack_id FROM spans
)
SELECT pack_id, count(*) AS n_docs,
       cast(sum(least(e, (pack_id + 1) * {_PACK_CTX})
                - greatest(s, pack_id * {_PACK_CTX})) AS BIGINT) AS pack_tokens,
       cast(sum(CASE WHEN s >= pack_id * {_PACK_CTX} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_doc_starts
FROM ex GROUP BY pack_id
"""

QUERIES["sequence_packing"] = q_sequence_packing
ORACLES["sequence_packing"] = SQL_SEQUENCE_PACKING


def q_mixture_weights(spark, sf_dir):
    """Data-mixture reweighting: temperature-scaled per-source sampling
    weights (w_s ∝ n_s^0.5 — the multilingual-training upsampling rule
    at T=2), computed from exact per-source token counts. sqrt is used
    instead of pow(x, 0.5) deliberately: IEEE-754 sqrt is correctly
    rounded in both engines, so the oracle's doubles match bit-for-bit
    before the 6-digit round. The normalizing total rides a broadcast
    of the tiny per-source aggregate — the wide text never reshuffles."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum(F.sqrt(F.col("n_tokens"))).alias("z")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_tokens",
        F.round(F.sqrt(F.col("n_tokens")) / F.col("z"), 6).alias("weight"),
    )


SQL_MIXTURE_WEIGHTS = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), tot AS (SELECT sum(sqrt(n_tokens)) AS z FROM per)
SELECT source, n_docs, n_tokens,
       round(sqrt(n_tokens) / z, 6) AS weight
FROM per, tot
"""

QUERIES["mixture_weights"] = q_mixture_weights
ORACLES["mixture_weights"] = SQL_MIXTURE_WEIGHTS


# GPT-2-style pretokenizer, engine-portable subset: contraction suffixes,
# space-glued letter runs, digit runs, punctuation runs, residual
# whitespace. (The original's trailing-space lookahead is dropped — RE2,
# DuckDB's engine, has no lookahead; Java and RE2 agree on this subset.)
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def q_bpe_token_stats(spark, sf_dir):
    """Token counting with a BPE-ish pretokenizer regex (the GPT-2
    pattern family) next to the plain whitespace count — the ratio is
    the fertility proxy a data pipeline uses to budget training tokens
    from raw text. Pure Catalyst (regexp_extract_all is JVM-side); the
    oracle runs the SAME regex through DuckDB's RE2."""
    d = _t(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0)))
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("lang").agg(
        F.sum(bpe.cast("long")).alias("total_bpe_tokens"),
        F.max(bpe).alias("max_bpe_tokens"),
        F.round(F.sum(bpe.cast("long")) / F.sum(ws.cast("long")), 4)
        .alias("fertility_vs_ws"),
    )


_BPE_RE_SQL = _BPE_RE.replace("'", "''")  # escape for the SQL literal

SQL_BPE_TOKEN_STATS = f"""
SELECT lang,
       cast(sum(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))) AS BIGINT)
         AS total_bpe_tokens,
       max(len(regexp_extract_all(text, '{_BPE_RE_SQL}'))) AS max_bpe_tokens,
       round(sum(len(regexp_extract_all(text, '{_BPE_RE_SQL}')))
             / sum(len(regexp_split_to_array(trim(text), '\\s+'))), 4)
         AS fertility_vs_ws
FROM documents GROUP BY lang
"""

QUERIES["bpe_token_stats"] = q_bpe_token_stats
ORACLES["bpe_token_stats"] = SQL_BPE_TOKEN_STATS


def q_drop_column_read(spark, sf_dir):
    """DROP COLUMN end-to-end: encode documents, drop ``source``
    (metadata-only snapshot), read the tip WITHOUT the column and the
    pre-drop snapshot WITH it. Both reads aggregate under a phase label;
    the oracle computes both from the source table — a drop that
    rewrites data, leaks the column into tip reads, or breaks pre-drop
    time travel diverges."""
    from .engine import decode_table, drop_column, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "dropcol")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=4, resume=False,
    )
    drop_column(out, "source")
    tip = decode_table(spark, out)
    assert "source" not in tip.columns
    post = tip.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.lit(0).cast("long").alias("n_sources"),
    ).withColumn("phase", F.lit("post_drop"))
    pre = decode_table(spark, out, snapshot_id=1).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    ).withColumn("phase", F.lit("pre_drop"))
    return pre.unionByName(post).select(
        "phase", "lang", "n_docs", "total_chars", "n_sources"
    )


SQL_DROP_COLUMN_READ = """
SELECT 'pre_drop' AS phase, lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       cast(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents GROUP BY lang
UNION ALL
SELECT 'post_drop' AS phase, lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       cast(0 AS BIGINT) AS n_sources
FROM documents GROUP BY lang
"""

QUERIES["drop_column_read"] = q_drop_column_read
ORACLES["drop_column_read"] = SQL_DROP_COLUMN_READ


def q_delete_conj_in_stats(spark, sf_dir):
    """Multi-predicate DELETE: one copy-on-write snapshot removes rows
    matching ``lang IN ('de','fr') AND doc_id BETWEEN 100 AND 5000`` —
    the same predicate algebra decode_table takes, pruned through zone
    maps + value sets + blooms before any rewrite task runs. The oracle
    anti-applies the same conjunction relationally; a delete that
    over- or under-matches (wrong AND, IN treated as range, NULL
    mishandling) diverges."""
    from .engine import decode_table, delete_rows, encode_table

    d = _t(spark, sf_dir, "documents")
    out = _workdir(sf_dir, "delconj")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    encode_table(
        spark, d, out,
        cluster_by=["lang"], salt_by=["doc_id"], sort_by=["lang", "doc_id"],
        num_parts=4, resume=False,
    )
    delete_rows(spark, out, [("lang", ["de", "fr"]), ("doc_id", 100, 5000)])
    dec = decode_table(spark, out)
    return dec.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


SQL_DELETE_CONJ_IN_STATS = """
SELECT lang, count(*) AS n_docs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents
WHERE NOT (lang IN ('de', 'fr') AND doc_id BETWEEN 100 AND 5000)
GROUP BY lang
"""

QUERIES["delete_conj_in_stats"] = q_delete_conj_in_stats
ORACLES["delete_conj_in_stats"] = SQL_DELETE_CONJ_IN_STATS
