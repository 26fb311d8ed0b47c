"""Pure-numpy/pyarrow codec kernels (no Spark imports here).

``encode_array(arr, spec)`` / ``decode_array(payload, meta)`` are the only
entry points the engine uses; see api.py for the spec grammar.
"""

from .api import decode_array, encode_array, parse_spec, type_name
from .fsst import SymbolTable, build_table
from .primitives import POST_CODECS

__all__ = [
    "encode_array",
    "decode_array",
    "parse_spec",
    "type_name",
    "SymbolTable",
    "build_table",
    "POST_CODECS",
]
