"""Reference-parity column transforms (SURVEY §2.2 P1-P6).

These reproduce, as Catalyst expressions, the derived-column arithmetic
the reference bakes into its converters — the point is parity of
semantics, not of mechanism (it does these row-by-row in C++ structs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# P1: touch struct fields -> SONATA column names
# (src/touches/parquet_writer.cpp:21-102: pre_* -> efferent_*, post_* -> afferent_*)
TOUCH_RENAME = {
    "pre_neuron_id": "source_node_id",
    "post_neuron_id": "target_node_id",
    "pre_section": "efferent_section_id",
    "pre_segment": "efferent_segment_id",
    "post_section": "afferent_section_id",
    "post_segment": "afferent_segment_id",
    "pre_offset": "efferent_segment_offset",
    "post_offset": "afferent_segment_offset",
    "distance_soma": "distance_soma",
    "branch_order": "branch_order",
}


def rename_touch_columns(df: DataFrame) -> DataFrame:
    return df.select(*[F.col(a).alias(b) for a, b in TOUCH_RENAME.items() if a in df.columns])


def with_synapse_id(
    df: DataFrame, gid_col: str, order_cols: list[str], out_col: str = "synapse_id"
) -> DataFrame:
    """P3: synapse_id = (gid << 24) + per-gid sequence; the reference hard-errors
    when any gid has >= 2^24 rows (src/touches/touch_reader.cpp:275-285) — the
    guard here is the equivalent max-count assertion, fused into the plan."""
    w = Window.partitionBy(gid_col).orderBy(*order_cols)
    seq = F.row_number().over(w) - 1
    guarded = F.when(seq >= F.lit(1 << 24), F.raise_error(F.lit("gid exceeds 2^24 rows"))).otherwise(seq)
    return df.withColumn(out_col, F.shiftleft(F.col(gid_col).cast("long"), 24) + guarded)


def unpack_branch_type(df: DataFrame, col: str = "branch_type") -> DataFrame:
    """P4: packed nibble byte -> (pre, post) section types, MorphIO +1 offset
    (src/touches/parquet_writer.h:64-70)."""
    b = F.col(col)
    return df.withColumn(
        "efferent_section_type", (F.shiftrightunsigned(b.cast("int"), 4).bitwiseAND(0xF) + 1).cast("tinyint")
    ).withColumn(
        "afferent_section_type", (b.cast("int").bitwiseAND(0xF) + 1).cast("tinyint")
    )


def validate_section_range(df: DataFrame, col: str = "efferent_section_id") -> DataFrame:
    """P5: reject values > 0x7fff before INT16 narrowing
    (src/touches/parquet_writer.cpp:207-219)."""
    return df.filter(F.col(col) <= 0x7FFF)


# P6: the reference's parquet->HDF5 narrowing matrix
# (src/circuit/sonata_writer.cpp:159-194); unsigned -> next wider signed.
NARROWING = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "long",
    "float": "float",
    "double": "double",
}


def narrow_types(df: DataFrame, spec: dict[str, str]) -> DataFrame:
    """Apply the cast matrix: spec maps column -> logical type key."""
    out = df
    for c, t in spec.items():
        out = out.withColumn(c, F.col(c).cast(NARROWING[t]))
    return out


def export_n(df: DataFrame, n: int | None) -> DataFrame:
    """S10: record-limit export — the reference's exportN cap that stops
    conversion after the first N records across ranks
    (src/touch2parquet.cpp:47,111-115). ``None``/negative means all."""
    if n is None or n < 0:
        return df
    return df.limit(n)


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """P2: explicit column-drop surface (the converters' --exclude flag);
    unknown names are ignored like df.drop does."""
    return df.drop(*cols)
