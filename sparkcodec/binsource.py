"""Fixed-width binary record source — Spark-first parity for the
reference's touch2parquet input path (SURVEY §2.1 S1-S3, §3.1).

The reference reads TouchDetector's proprietary row-oriented binary
records: a SIDECAR index file (data filename minus "Data",
touch_reader.cpp:79-88) carries an architecture tag (endianness), a
version string, and a per-neuron (id, count, offset) directory enabling
seeks (touch_reader.cpp:118-145, getOffsets/seek :147-219); the data
file holds raw fixed-width structs, record_count = file_len/record_size
(touch_reader.cpp:66-71); records are byteswapped when the writer's
architecture differs (:14-37); each rank converts its own slice of one
file's records (touch2parquet.cpp:110-115).

Capability re-expressed for Spark (not a byte-level clone of the
proprietary format — the *format* here is our own, the *operators* are
the parity):

- sidecar ``<file>.idx``: magic, arch tag, version string, per-key
  (id, count, byte_offset) directory (S2);
- schema chain V1 ⊂ V2 ⊂ V3 (touch_defs.h:17,33,50) inferred from the
  dotted version string with the git-hash → V1 fallback
  (touch_reader.cpp:95-117);
- :func:`read_records` fans each file out as (file, offset, count)
  slices — one 100 GB record file becomes many tasks, the Spark twin of
  the reference's per-rank work_unit split (touch2parquet.cpp:110-115);
- :func:`read_records_for_keys` seeks straight to requested keys via
  the directory (touch_reader.cpp:147-219);
- decode is one vectorized ``numpy.frombuffer`` + optional
  ``byteswap`` per slice — no per-row Python.

The derived ``synapse_id`` (gid<<24 | seq, touch_reader.cpp:275-285) is
applied downstream via :func:`sparkcodec.pipeline.with_synapse_id`.
"""

from __future__ import annotations

import glob as globmod
import os
import struct

import numpy as np
import pandas as pd

SIDECAR_MAGIC = b"SCBI"
SIDECAR_SUFFIX = ".idx"
ARCH_LITTLE = 1001  # cf. the reference's 1.001 architecture identity tag
ARCH_BIG = 2002

# schema evolution chain (struct inheritance in the reference,
# touch_defs.h:17-62); numpy structured dtypes, little-endian
V1_DTYPE = np.dtype(
    [
        ("pre_gid", "<i4"),
        ("post_gid", "<i4"),
        ("pre_section", "<i2"),
        ("pre_segment", "<i2"),
        ("post_section", "<i2"),
        ("post_segment", "<i2"),
        ("pre_offset", "<f4"),
        ("post_offset", "<f4"),
        ("distance_soma", "<f4"),
        ("branch_order", "i1"),
        ("_pad", "V3"),
    ]
)
V2_DTYPE = np.dtype(
    V1_DTYPE.descr[:-1] + [("branch_type", "i1"), ("spine_length", "<f4"), ("_pad", "V2")]
)
# V3 appends position triples (touch_defs.h:50-61: pre_position_center,
# post_position_surface)
V3_DTYPE = np.dtype(
    V2_DTYPE.descr[:-1]
    + [
        ("pre_center_x", "<f4"), ("pre_center_y", "<f4"), ("pre_center_z", "<f4"),
        ("post_surface_x", "<f4"), ("post_surface_y", "<f4"), ("post_surface_z", "<f4"),
        ("_pad", "V2"),
    ]
)

VERSIONS = {1: V1_DTYPE, 2: V2_DTYPE, 3: V3_DTYPE}
V2_ONLY = ("branch_type", "spine_length")
V3_ONLY = (
    "pre_center_x", "pre_center_y", "pre_center_z",
    "post_surface_x", "post_surface_y", "post_surface_z",
)


def infer_version(version_string: str) -> int:
    """Schema version from a dotted version string — the reference's
    inference chain verbatim (touch_reader.cpp:95-117): >=6 or >=5.4 ->
    V3; >=5 or >=4.99 -> V2; unparseable (early builds stamped a git
    hash) -> V1."""
    try:
        vs = [int(s) for s in version_string.split(".")]
    except ValueError:
        return 1  # git-hash fallback
    if not vs:
        return 1
    if vs[0] >= 6 or (len(vs) >= 2 and vs[0] >= 5 and vs[1] >= 4):
        return 3
    if vs[0] >= 5 or (len(vs) >= 2 and vs[0] >= 4 and vs[1] >= 99):
        return 2
    return 1


_SIDECAR_FIXED = struct.Struct("<4sIH")  # magic, arch, version_string_len
_DIR_ENTRY = struct.Struct("<qqq")  # key id, record count, byte offset


def sidecar_path(data_path: str) -> str:
    return data_path + SIDECAR_SUFFIX


def write_record_file(
    path: str,
    records: np.ndarray,
    version: int | None = None,
    big_endian: bool = False,
    version_string: str | None = None,
    key_col: str = "pre_gid",
) -> None:
    """Fixture writer: raw record data file + sidecar with the per-key
    (id, count, offset) directory, optionally foreign-endian to exercise
    the byteswap path. ``version_string`` wins over ``version``."""
    if version_string is None:
        version_string = {1: "4.0", 2: "5.0.1", 3: "6.1"}[version or 1]
    v = infer_version(version_string)
    dt = VERSIONS[v]
    arr = records.astype(dt, copy=True)
    arch = ARCH_LITTLE
    # per-key directory over the (grouped) key column, before any swap
    keys = arr[key_col].astype(np.int64)
    if len(keys):
        bounds = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(keys)]])
    else:
        starts = ends = np.zeros(0, dtype=np.int64)
    entries = [
        (int(keys[s]), int(e - s), int(s) * dt.itemsize) for s, e in zip(starts, ends)
    ]
    if big_endian:
        arr = arr.byteswap()
        arch = ARCH_BIG
    with open(path, "wb") as fh:
        fh.write(arr.tobytes())
    vs_bytes = version_string.encode()
    dir_blob = b"".join(_DIR_ENTRY.pack(*e) for e in entries)
    n_blob = struct.pack("<q", len(entries))
    if big_endian:
        # byteswap directory ints like the reference's bswap loop
        # (touch_reader.cpp:121-127)
        dir_blob = (
            np.frombuffer(dir_blob, dtype="<i8").astype(">i8").tobytes()
            if entries
            else b""
        )
        n_blob = struct.pack(">q", len(entries))
    with open(sidecar_path(path), "wb") as fh:
        fh.write(_SIDECAR_FIXED.pack(SIDECAR_MAGIC, arch, len(vs_bytes)))
        fh.write(vs_bytes)
        fh.write(n_blob)
        fh.write(dir_blob)


def parse_sidecar(raw: bytes) -> tuple[int, str, int, list[tuple[int, int, int]]]:
    """(arch, version_string, version, [(key, count, byte_offset), ...])."""
    magic, arch, vs_len = _SIDECAR_FIXED.unpack_from(raw, 0)
    if magic != SIDECAR_MAGIC:
        raise ValueError(f"not a record sidecar (magic {magic!r})")
    pos = _SIDECAR_FIXED.size
    version_string = raw[pos : pos + vs_len].decode()
    pos += vs_len
    swapped = arch != ARCH_LITTLE
    (n_keys,) = struct.unpack_from(">q" if swapped else "<q", raw, pos)
    pos += 8
    ints = np.frombuffer(raw, dtype=">i8" if swapped else "<i8", count=3 * n_keys, offset=pos)
    entries = [tuple(int(x) for x in ints[i * 3 : i * 3 + 3]) for i in range(n_keys)]
    return arch, version_string, infer_version(version_string), entries


def decode_record_bytes(raw: bytes, version: int, arch: int = ARCH_LITTLE) -> pd.DataFrame:
    """Raw record bytes (no header) -> pandas DataFrame (vectorized)."""
    dt = VERSIONS[version]
    arr = np.frombuffer(raw, dtype=dt, count=len(raw) // dt.itemsize)
    if arch != ARCH_LITTLE:
        # foreign byte order (S3): the raw bytes are big-endian; swapping
        # them makes the little-endian dtype interpretation true
        arr = arr.byteswap()
    cols = {n: arr[n] for n in dt.names if not n.startswith("_")}
    df = pd.DataFrame(cols)
    df["version"] = np.int32(version)
    # older files surface the newer columns as nulls (schema evolution)
    if version < 2:
        df["branch_type"] = pd.array([None] * len(df), dtype="Int8")
        df["spine_length"] = np.float32(np.nan)
    if version < 3:
        for c in V3_ONLY:
            df[c] = np.float32(np.nan)
    return df


RECORD_SPARK_SCHEMA = (
    "pre_gid int, post_gid int, pre_section smallint, pre_segment smallint, "
    "post_section smallint, post_segment smallint, pre_offset float, "
    "post_offset float, distance_soma float, branch_order tinyint, "
    "version int, branch_type tinyint, spine_length float, "
    "pre_center_x float, pre_center_y float, pre_center_z float, "
    "post_surface_x float, post_surface_y float, post_surface_z float, "
    "source_file string"
)
_ORDER = [f.split(" ")[0] for f in RECORD_SPARK_SCHEMA.split(", ")]

_SLICE_SCHEMA = "path string, version int, arch int, byte_offset long, n_records long"


def _plan_file_slices(p: str, rows_per_slice: int) -> list[tuple]:
    """Slices of one record file from its sidecar (shared by the driver
    and distributed planners)."""
    with open(sidecar_path(p), "rb") as fh:
        arch, _vs, version, _entries = parse_sidecar(fh.read())
    itemsize = VERSIONS[version].itemsize
    count = os.path.getsize(p) // itemsize  # touch_reader.cpp:66-71
    slices = []
    off = 0
    while off < count or (count == 0 and off == 0):
        take = min(rows_per_slice, count - off)
        slices.append((p, version, arch, off * itemsize, take))
        off += max(take, 1)
        if count == 0:
            break
    return slices


def plan_slices(paths: list[str], rows_per_slice: int) -> list[tuple]:
    """Driver-side slice plan: each file becomes ceil(count/rows_per_slice)
    (path, version, arch, byte_offset, n_records) slices — the Spark twin
    of the reference's per-rank work_unit split (touch2parquet.cpp:
    110-115). Reads only the O(#files) sidecars, never record data."""
    slices = []
    for p in sorted(paths):
        slices.extend(_plan_file_slices(p, rows_per_slice))
    return slices


# above this many files, sidecar reads move off the driver into a Spark
# job: serial driver I/O over a million-file layout would take minutes,
# while the planning job is embarrassingly parallel metadata reads
DISTRIBUTED_PLAN_THRESHOLD = 256


def plan_slices_df(spark, paths: list[str], rows_per_slice: int):
    """Distributed slice planning: paths DataFrame -> per-task sidecar
    reads -> slice rows, never touching the driver. The decode kernel
    consumes the result directly, so the plan is also never collected."""
    import pandas as _pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.extend(_plan_file_slices(str(p), rows_per_slice))
            yield _pd.DataFrame(
                rows, columns=["path", "version", "arch", "byte_offset", "n_records"]
            )

    n = max(1, min(len(paths), 4 * spark.sparkContext.defaultParallelism))
    pdf = spark.createDataFrame([(p,) for p in sorted(paths)], "path string")
    return pdf.repartition(n).mapInPandas(kernel, _SLICE_SCHEMA)


def _decode_slices_kernel(batches):
    for pdf in batches:
        for path, version, arch, byte_offset, n_records in zip(
            pdf["path"], pdf["version"], pdf["arch"], pdf["byte_offset"], pdf["n_records"]
        ):
            itemsize = VERSIONS[int(version)].itemsize
            with open(path, "rb") as fh:
                fh.seek(int(byte_offset))
                raw = fh.read(int(n_records) * itemsize)
            out = decode_record_bytes(raw, int(version), int(arch))
            out["source_file"] = os.path.basename(str(path))
            yield out.reindex(columns=_ORDER)


def read_records(spark, path_glob: str, rows_per_slice: int = 1 << 20):
    """Distributed scan with sub-file splitting: sidecar-driven slice
    plan -> slice DataFrame -> vectorized seek+decode kernel. One huge
    record file fans out across many tasks instead of becoming one (the
    round-1 scale gap). Small listings plan on the driver (O(#files)
    sidecar reads); above DISTRIBUTED_PLAN_THRESHOLD files the plan
    itself runs as a Spark job so a million-file layout never serializes
    through driver I/O."""
    paths = [p for p in globmod.glob(path_glob) if not p.endswith(SIDECAR_SUFFIX)]
    n_par = 4 * spark.sparkContext.defaultParallelism
    if len(paths) > DISTRIBUTED_PLAN_THRESHOLD:
        sl_df = plan_slices_df(spark, paths, rows_per_slice).repartition(n_par)
    else:
        slices = plan_slices(paths, rows_per_slice)
        n_tasks = max(1, min(len(slices), n_par))
        sl_df = spark.createDataFrame(slices, _SLICE_SCHEMA).repartition(n_tasks)
    return sl_df.mapInPandas(_decode_slices_kernel, RECORD_SPARK_SCHEMA)


def read_records_for_keys(spark, path_glob: str, keys: list[int]):
    """Selective read: seek straight to the requested keys' record ranges
    via the sidecar directory — the reference's getOffsets + seek path
    (touch_reader.cpp:147-219). Scans only the matching byte ranges."""
    wanted = set(int(k) for k in keys)
    slices = []
    for p in sorted(q for q in globmod.glob(path_glob) if not q.endswith(SIDECAR_SUFFIX)):
        with open(sidecar_path(p), "rb") as fh:
            arch, _vs, version, entries = parse_sidecar(fh.read())
        for key, count, byte_off in entries:
            if key in wanted:
                slices.append((p, version, arch, byte_off, count))
    if not slices:
        return spark.createDataFrame([], RECORD_SPARK_SCHEMA)
    n_tasks = max(1, min(len(slices), 4 * spark.sparkContext.defaultParallelism))
    sl_df = spark.createDataFrame(slices, _SLICE_SCHEMA).repartition(n_tasks)
    return sl_df.mapInPandas(_decode_slices_kernel, RECORD_SPARK_SCHEMA)


def synthesize_records(n: int, version: int, n_gids: int = 50, seed: int = 42) -> np.ndarray:
    """Deterministic synthetic record array (grouped by pre_gid like the
    reference's per-neuron input order)."""
    rng = np.random.default_rng(seed)
    dt = VERSIONS[version]
    arr = np.zeros(n, dtype=dt)
    arr["pre_gid"] = np.sort(rng.integers(0, n_gids, n)).astype("<i4")
    arr["post_gid"] = rng.integers(0, n_gids, n)
    for f in ("pre_section", "pre_segment", "post_section", "post_segment"):
        arr[f] = rng.integers(0, 0x7FFF, n)
    for f in ("pre_offset", "post_offset", "distance_soma"):
        arr[f] = rng.random(n, dtype=np.float32)
    arr["branch_order"] = rng.integers(0, 16, n)
    if version >= 2:
        arr["branch_type"] = rng.integers(0, 256, n).astype(np.uint8).view(np.int8)
        arr["spine_length"] = rng.random(n, dtype=np.float32)
    if version >= 3:
        for f in V3_ONLY:
            arr[f] = rng.random(n, dtype=np.float32)
    return arr
