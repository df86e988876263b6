"""Reference-shaped convenience API.

``geowarp(**options)`` mirrors the reference's single-call signature
(geowarp.js:113-163) so a user of the reference can switch with minimal
edits: same option names (``round``, ``expr``, ``method``, ``cutline``,
``out_resolution``, ``in_no_data``, ...), same result envelope keys
(geowarp.js:970-985).  Under the hood it is the numpy kernel; for
distributed execution use ``geowarp_spark.operators.warp_tiles``.
"""

from __future__ import annotations

from .kernels.warp import warp as _warp

_RENAMES = {
    "round": "round_values",
    "out_array_types": "out_dtype",
}

_IGNORED = {
    # reference-only knobs with no analog in the numpy/Spark engine
    "debug_level",      # logging verbosity (geowarp.js:114)
    "insert_pixel",     # pluggable sink — use the Spark writer instead (S6)
    "insert_sample",
    "out_data",         # caller-allocated output buffer
    "cutline_bbox",     # perf hint for turbo cutline reprojection
    "reproject",        # deprecated alias of inverse (geowarp.js:187)
    "insert",           # deprecated alias of insert_pixel (geowarp.js:190)
}

_TYPED_ARRAY_TO_DTYPE = {
    "Int8Array": "int8", "Uint8Array": "uint8", "Uint8ClampedArray": "uint8",
    "Int16Array": "int16", "Uint16Array": "uint16",
    "Int32Array": "int32", "Uint32Array": "uint32",
    "Float32Array": "float32", "Float64Array": "float64",
    "BigInt64Array": "int64", "BigUint64Array": "uint64",
    "Array": "float64",
}


def geowarp(**options):
    """Single-call warp with the reference's option names."""
    kw = {}
    for k, v in options.items():
        if k in _IGNORED:
            continue
        k = _RENAMES.get(k, k)
        if k == "out_dtype" and isinstance(v, (list, tuple)):
            v = v[-1] if v else None  # innermost constructor decides dtype
        if k == "out_dtype" and isinstance(v, str) and v in _TYPED_ARRAY_TO_DTYPE:
            v = _TYPED_ARRAY_TO_DTYPE[v]
        if k == "reproject":
            k = "inverse"
        kw[k] = v
    return _warp(**kw)
