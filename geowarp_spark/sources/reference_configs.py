"""Shared config for the reference-executed option-surface oracle.

tools/pin_reference.py runs these variants through the REAL geowarp.js
(node + shimmed deps) and pins the resulting bytes;
__spark_entry__.q_warp_reference_options runs the same variants through
the distributed engine.  Both import THIS list so the two sides can
never drift.

Each variant: (tag, method, js_opts) where js_opts uses the reference's
option names (geowarp.js signature).  ``py_opts`` maps them onto the
Python kernel's kwargs (round -> round_values, expr_name -> a named
callable; everything else is name-identical by design).
"""

from __future__ import annotations

# all resampling methods the reference dispatches (geowarp.js:845-868)
REFERENCE_METHODS = ["near", "bilinear", "median", "mode", "min", "max",
                     "mean", "mode-median", "mode-min", "mode-max",
                     "mode-mean"]

OPTIONS_BBOX = [-2.0, -2.0, -0.1, -0.1]  # ~3x3 z9 tiles over rgba_webmerc
OPTIONS_ZOOM = 9
OPTIONS_OUT_SIZE = 64


def options_variants():
    """The option surface pinned against real reference execution:
    cutline both strategies (geowarp.js:151-155, 355-415), sample
    replication (174-179, 506-521), row ranges (144-145), band reorder
    (127), no-data skip (125, 604-609), JS half-up rounding (134, 257),
    expr pipeline (253-287), forward-paint vectorize (613-703)."""
    from .fixtures import strip_cutline

    cut = strip_cutline()
    return [
        ("cut_out", "near", {"cutline": cut, "cutline_srs": 3857,
                             "cutline_strategy": "outside"}),
        ("cut_in", "median", {"cutline": cut, "cutline_srs": 3857,
                              "cutline_strategy": "inside"}),
        ("res_half", "near", {"out_resolution": [0.5, 0.5]}),
        ("res_odd", "median", {"out_resolution": [0.37, 0.61]}),
        ("row_range", "near", {"row_start": 8, "row_end": 56}),
        ("bands", "near", {"out_bands": [2, 0, 1]}),
        # in_no_data=17 hits a narrow band-0 gradient strip, so "any"
        # skips SOME samples of a tile but can never skip a whole tile
        # (a whole-tile skip -> reference returns data: undefined)
        ("nodata_skip", "median", {"in_no_data": 17,
                                   "skip_no_data_strategy": "any"}),
        ("round", "mean", {"round": True}),
        ("expr_swap", "near", {"expr_name": "swap"}),
        ("vectorize", "vectorize", {}),
        ("cut_res", "near", {"cutline": cut, "cutline_srs": 3857,
                             "cutline_strategy": "outside",
                             "out_resolution": [0.5, 0.5]}),
        ("out_nodata", "near", {"out_no_data": 7}),
        ("nodata_all", "median", {"in_no_data": 17,
                                  "skip_no_data_strategy": "all"}),
        ("rows_res", "near", {"row_start": 3, "row_end": 27,
                              "out_resolution": [0.5, 0.5]}),
        ("bilinear_res", "bilinear", {"out_resolution": [0.73, 0.41]}),
        # expr + round exercises the reference's thenable process
        # pipeline (geowarp.js:257: quickResolve(expr(...)).then(round))
        ("expr_round", "near", {"expr_name": "half", "round": True}),
        # layout surface (L3): flat-interleaved and nested physical
        # layouts on BOTH sides of the kernel (test.js:205,288); results
        # compare on the canonical (band,row,column) block either way
        ("layout_flat", "near", {"in_layout": "[row,column,band]",
                                 "out_layout": "[row,column,band]"}),
        ("layout_rcb", "median", {"out_layout": "[row][column][band]"}),
        ("layout_brc", "near", {"in_layout": "[row][column][band]",
                                "out_layout": "[band][row][column]"}),
        # R6 turbo wiring (geowarp.js:538-547): the approximate
        # inverse-pixel grid fit + Math.round — the proj-turbo shim
        # implements the same step-16 lattice fit as the Python kernel's
        # _turbo_inverse, so this pins WHERE the reference applies turbo
        # (and its rounding), bit-for-bit
        ("turbo_near", "near", {"turbo": True}),
    ]


def py_opts(js_opts):
    """JS option names -> Python kernel kwargs."""
    out = {}
    for k, v in js_opts.items():
        if k == "round":
            out["round_values"] = v
        elif k == "expr_name":
            if v == "swap":
                out["expr"] = lambda vals: vals[[2, 1, 0]]
            elif v == "half":
                out["expr"] = lambda vals: vals / 2.0
            else:
                raise KeyError(v)
        elif k == "out_resolution":
            out["out_resolution"] = tuple(v)
        else:
            out[k] = v
    return out
