"""sparkcodec — a PySpark-native per-column lightweight-compression engine.

Built from scratch with the *capabilities* of
openbraininstitute/parquet-converters (studied read-only at
``/root/reference``; see SURVEY.md) but an idiomatic Spark architecture:
DataFrame plans, Arrow-vectorized kernels inside ``mapInArrow`` /
``applyInPandas``, shuffle/partitioning/skew handled by Catalyst plus
explicit salting — never a translation of the reference's C++/MPI/HDF5
pipelines.

Public surface:

- :mod:`sparkcodec.codecs`   — pure-numpy encode/decode kernels
  (raw, bitpack, frame-of-reference, RLE, dictionary, FSST).
- :mod:`sparkcodec.select`   — vectorized per-column statistics +
  stats-driven + measured codec auto-selection.
- :mod:`sparkcodec.engine`   — ``encode_table`` / ``decode_table`` over a
  blocks table with per-partition checkpoint/lineage rows and resume.
- :mod:`sparkcodec.verify`   — sha256 round-trip + size-gate verification.
- :mod:`sparkcodec.tables`   — deterministic synthetic ``code_files`` input.
- :mod:`sparkcodec.index`    — CSR run-length edge index (reference
  parity: src/index/index.cpp), as a ~30-line DataFrame job.
- :mod:`sparkcodec.pipeline` — reference-parity column transforms
  (projection/rename, derived ids, bit-field unpack, narrowing casts).
"""

__version__ = "0.1.0"
