"""Fixed-width binary record source — Spark-first parity for the
reference's touch2parquet input path (SURVEY §2.1 S1-S3, §3.1).

The reference reads TouchDetector's proprietary row-oriented binary
records through a buffered C++ reader: a sidecar header gives an
architecture tag (endianness), a version string (schema inference:
src/touches/touch_reader.cpp:95-117) and a per-key record directory;
records are fixed-width structs byteswapped when the writer's
architecture differs (touch_reader.cpp:14-37).

Capability re-expressed for Spark (not a byte-level clone of the
proprietary format — the *format* here is our own, the *operators* are
the parity): `spark.read.format("binaryFile")` lists and reads whole
record files in parallel, and a `mapInPandas` kernel decodes each file
with one vectorized ``numpy.frombuffer`` + optional ``byteswap`` — no
per-row Python. Version-specific schemas form an evolution chain
(V1 ⊂ V2), inferred from the header, mirroring the reference's
``Version`` dispatch. The derived ``synapse_id`` (gid<<24 | seq,
touch_reader.cpp:275-285) is applied downstream via
:func:`sparkcodec.pipeline.with_synapse_id`.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

MAGIC = b"SCBR"
ARCH_LITTLE = 1001  # cf. the reference's 1.001 architecture identity tag

# schema evolution chain: V2 extends V1 (struct inheritance in the
# reference, touch_defs.h); numpy structured dtypes, little-endian
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
V2_DTYPE = np.dtype(V1_DTYPE.descr[:-1] + [("branch_type", "i1"), ("spine_length", "<f4"), ("_pad", "V2")])

VERSIONS = {1: V1_DTYPE, 2: V2_DTYPE}

_HEADER = struct.Struct("<4sIIQ")  # magic, arch, version, record_count


def write_record_file(path: str, records: np.ndarray, version: int, big_endian: bool = False) -> None:
    """Test-fixture writer: header + raw record array (optionally
    foreign-endian, to exercise the byteswap path)."""
    dt = VERSIONS[version]
    arr = records.astype(dt, copy=True)
    arch = ARCH_LITTLE
    if big_endian:
        arr = arr.byteswap()
        arch = 2002
    with open(path, "wb") as fh:
        fh.write(_HEADER.pack(MAGIC, arch, version, len(records)))
        fh.write(arr.tobytes())


def parse_header(raw: bytes) -> tuple[int, int, int]:
    """(arch, version, record_count); raises on bad magic."""
    magic, arch, version, count = _HEADER.unpack_from(raw, 0)
    if magic != MAGIC:
        raise ValueError(f"not a record file (magic {magic!r})")
    if version not in VERSIONS:
        raise ValueError(f"unsupported record version {version}")
    return arch, version, count


def decode_record_bytes(raw: bytes) -> pd.DataFrame:
    """One whole record file -> pandas DataFrame (vectorized)."""
    arch, version, count = parse_header(raw)
    dt = VERSIONS[version]
    arr = np.frombuffer(raw, dtype=dt, count=count, offset=_HEADER.size)
    if arch != ARCH_LITTLE:
        # foreign byte order (S3): the raw bytes are big-endian; swapping
        # them in place makes the little-endian dtype interpretation true
        arr = arr.byteswap()
    cols = {n: arr[n] for n in dt.names if not n.startswith("_")}
    df = pd.DataFrame(cols)
    df["version"] = np.int32(version)
    # V1 files surface the V2 columns as nulls (schema evolution)
    if version == 1:
        df["branch_type"] = pd.array([None] * len(df), dtype="Int8")
        df["spine_length"] = np.float32(np.nan)
    return df


RECORD_SPARK_SCHEMA = (
    "pre_gid int, post_gid int, pre_section smallint, pre_segment smallint, "
    "post_section smallint, post_segment smallint, pre_offset float, "
    "post_offset float, distance_soma float, branch_order tinyint, "
    "version int, branch_type tinyint, spine_length float, "
    "source_file string"
)


def read_records(spark, path_glob: str):
    """Distributed scan: binaryFile source -> vectorized decode kernel.

    One task per record file (the reference splits records *within* a
    file across MPI ranks, touch2parquet.cpp:110-115; files are the
    natural Spark split here and sub-file splitting belongs to the
    scheduler once files exceed maxPartitionBytes)."""
    bin_df = spark.read.format("binaryFile").load(path_glob)

    order = [f.split(" ")[0] for f in RECORD_SPARK_SCHEMA.split(", ")]

    def kernel(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                out = decode_record_bytes(bytes(content))
                out["source_file"] = os.path.basename(path)
                yield out.reindex(columns=order)

    return bin_df.select("path", "content").mapInPandas(kernel, RECORD_SPARK_SCHEMA)


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
    return arr
