"""Reference-parity column transforms (SURVEY §2.2 P1-P6).

These reproduce, as Catalyst expressions, the derived-column arithmetic
the reference bakes into its converters — the point is parity of
semantics, not of mechanism (it does these row-by-row in C++ structs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# P1: touch struct fields -> SONATA column names, per schema version
# (src/touches/parquet_writer.cpp:20-102 setupSchema + 189-244 transpose:
# pre_* -> efferent_*, post_* -> afferent_*). V1 is the base set; V2 adds
# section fractions, 3-D surface/center positions, spine_length and the
# unpacked section types; V3 adds the opposite-side position triples.
# Keys cover BOTH the reference's struct names (touch_defs.h:17-62) and
# the binsource record column names (pre_gid/pre_center_x/...).
TOUCH_RENAME = {
    "pre_neuron_id": "source_node_id",
    "post_neuron_id": "target_node_id",
    "pre_gid": "source_node_id",
    "post_gid": "target_node_id",
    "pre_section": "efferent_section_id",
    "pre_segment": "efferent_segment_id",
    "post_section": "afferent_section_id",
    "post_segment": "afferent_segment_id",
    "pre_offset": "efferent_segment_offset",
    "post_offset": "afferent_segment_offset",
    "distance_soma": "distance_soma",
    "branch_order": "branch_order",
}

TOUCH_RENAME_V2 = {
    # parquet_writer.cpp:55-63 (V2 schema) + :228-233 (transpose):
    # pre_position -> efferent_surface_*, post_position -> afferent_center_*
    "pre_section_fraction": "efferent_section_pos",
    "post_section_fraction": "afferent_section_pos",
    "pre_position_x": "efferent_surface_x",
    "pre_position_y": "efferent_surface_y",
    "pre_position_z": "efferent_surface_z",
    "post_position_x": "afferent_center_x",
    "post_position_y": "afferent_center_y",
    "post_position_z": "afferent_center_z",
    "spine_length": "spine_length",
    "pre_branch_type": "efferent_section_type",
    "post_branch_type": "afferent_section_type",
}

TOUCH_RENAME_V3 = {
    # parquet_writer.cpp:84-96 (V3 schema) + :236-243:
    # pre_position_center -> efferent_center_*, post_position_surface ->
    # afferent_surface_* (binsource stores them as pre_center_*/post_surface_*)
    "pre_center_x": "efferent_center_x",
    "pre_center_y": "efferent_center_y",
    "pre_center_z": "efferent_center_z",
    "post_surface_x": "afferent_surface_x",
    "post_surface_y": "afferent_surface_y",
    "post_surface_z": "afferent_surface_z",
    "pre_position_center_x": "efferent_center_x",
    "pre_position_center_y": "efferent_center_y",
    "pre_position_center_z": "efferent_center_z",
    "post_position_surface_x": "afferent_surface_x",
    "post_position_surface_y": "afferent_surface_y",
    "post_position_surface_z": "afferent_surface_z",
}


def touch_rename_map(version: int = 3) -> dict[str, str]:
    """Raw-name -> SONATA-name map for a schema version (V1 base, V2/V3
    cumulative, mirroring the reference's setupSchema version gates)."""
    m = dict(TOUCH_RENAME)
    if version >= 2:
        m.update(TOUCH_RENAME_V2)
    if version >= 3:
        m.update(TOUCH_RENAME_V3)
    return m


def rename_touch_columns(
    df: DataFrame, version: int = 3, keep: list[str] | None = None
) -> DataFrame:
    """Project the SONATA columns present in ``df`` under their SONATA
    names (P1); absent fields are skipped, so V1 data through a V3 map
    yields the V1 column set. ``keep`` names extra passthrough columns
    (provenance like source_file, partition keys) carried unrenamed."""
    m = touch_rename_map(version)
    out_of = {}  # SONATA name -> first matching raw column present
    for raw, son in m.items():
        if raw in df.columns and son not in out_of:
            out_of[son] = raw
    extra = [F.col(c) for c in (keep or []) if c in df.columns]
    return df.select(
        *[F.col(raw).alias(son) for son, raw in out_of.items()], *extra
    )


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


# SONATA output types per parquet_writer.cpp:20-96 (physical INT32 with
# converted INT_16/INT_8 narrows to the converted width here; Spark has
# no converted-type distinction, so the narrow IS the type)
SONATA_TYPES = {
    "synapse_id": "int64",
    "source_node_id": "int32",
    "target_node_id": "int32",
    "efferent_section_id": "int16",
    "efferent_segment_id": "int16",
    "afferent_section_id": "int16",
    "afferent_segment_id": "int16",
    "efferent_segment_offset": "float",
    "afferent_segment_offset": "float",
    "distance_soma": "float",
    "branch_order": "int8",
    # V2
    "efferent_section_pos": "float",
    "afferent_section_pos": "float",
    "efferent_surface_x": "float",
    "efferent_surface_y": "float",
    "efferent_surface_z": "float",
    "afferent_center_x": "float",
    "afferent_center_y": "float",
    "afferent_center_z": "float",
    "spine_length": "float",
    "efferent_section_type": "int8",
    "afferent_section_type": "int8",
    # V3
    "efferent_center_x": "float",
    "efferent_center_y": "float",
    "efferent_center_z": "float",
    "afferent_surface_x": "float",
    "afferent_surface_y": "float",
    "afferent_surface_z": "float",
}


def to_sonata(df: DataFrame, version: int = 3) -> DataFrame:
    """Full P1+P4+P6 surface: unpack the packed branch_type nibble into
    the two section types (V2+), rename every present raw column to its
    SONATA name, and apply the reference's narrowing matrix — the Spark
    twin of TouchWriterParquet's transpose+schema
    (parquet_writer.cpp:189-244)."""
    if version >= 2 and "branch_type" in df.columns and "pre_branch_type" not in df.columns:
        df = unpack_branch_type(df).withColumnRenamed(
            "efferent_section_type", "pre_branch_type"
        ).withColumnRenamed("afferent_section_type", "post_branch_type")
    out = rename_touch_columns(df, version)
    spec = {c: SONATA_TYPES[c] for c in out.columns if c in SONATA_TYPES}
    return narrow_types(out, spec)


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
