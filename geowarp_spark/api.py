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
}

_IGNORED = {
    # reference-only knobs with no analog in the numpy/Spark engine
    "debug_level",      # logging verbosity (geowarp.js:114)
    "out_data",         # caller-allocated output buffer
}

_TYPED_ARRAY_TO_DTYPE = {
    "Int8Array": "int8", "Uint8Array": "uint8", "Uint8ClampedArray": "uint8",
    "Int16Array": "int16", "Uint16Array": "uint16",
    "Int32Array": "int32", "Uint32Array": "uint32",
    "Float32Array": "float32", "Float64Array": "float64",
    "BigInt64Array": "int64", "BigUint64Array": "uint64",
    "Array": "float64",
}


def _to_dtype(v):
    if not isinstance(v, str):
        # JS constructor objects have a __name__-ish attr; accept dtypes too
        v = getattr(v, "__name__", str(v))
    return _TYPED_ARRAY_TO_DTYPE.get(v, v)


def geowarp(**options):
    """Single-call warp with the reference's option names.

    ``out_array_types`` (per-band typed-array constructors,
    geowarp.js:477-483 / geowarp.d.ts:18-31) maps to per-band numpy
    dtypes; ``insert_pixel`` / ``insert_sample`` (geowarp.js:157-158,
    README.md:177-193) are pluggable sinks called with VECTORIZED
    (band, rows, cols, values) numpy arrays — see kernels.warp._materialize.
    """
    kw = {}
    for k, v in options.items():
        if k in _IGNORED:
            continue
        k = _RENAMES.get(k, k)
        if k == "out_array_types" and v:
            dts = [_to_dtype(t) for t in (v if isinstance(v, (list, tuple)) else [v])]
            if len(set(dts)) == 1:
                kw["out_dtype"] = dts[0]   # homogeneous: plain dtype path
            else:
                kw["out_array_types"] = dts
            continue
        if k == "out_dtype" and isinstance(v, str):
            v = _to_dtype(v)
        if k == "reproject":   # deprecated alias of inverse (geowarp.js:187)
            k = "inverse"
        if k == "insert":      # deprecated alias of insert_pixel (geowarp.js:190)
            k = "insert_pixel"
        kw[k] = v
    return _warp(**kw)
