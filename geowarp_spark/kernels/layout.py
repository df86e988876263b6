"""xdim-style layout adapters.

The reference stores rasters in one of four physical layouts described by
layout strings (geowarp.js:118 default "[band][row,column]"; the test
matrix exercises "[band][row][column]", "[band][row,column]" and
"[row,column,band]" as out layouts, test.js:205, plus "[row][column][band]"
reads, test.js:288).  Internally our kernels always use a C-order
``(band, row, column)`` ndarray; these adapters convert at the edges.
"""

from __future__ import annotations

import numpy as np

SUPPORTED = (
    "[band][row][column]",
    "[band][row,column]",
    "[row][column][band]",
    "[row,column,band]",
    "[row,column][band]",
    "[band,row,column]",
)


def _axes(layout):
    """layout string -> flat axis order tuple like ('band','row','column')."""
    parts = layout.replace("][", ",").strip("[]").split(",")
    parts = [p.strip() for p in parts]
    if sorted(parts) != ["band", "column", "row"]:
        raise ValueError(f"unsupported layout: {layout!r}")
    return tuple(parts)


def to_brc(data, layout, bands, height, width, dtype=None):
    """Any supported nested/flat layout -> contiguous (B,H,W) ndarray."""
    axes = _axes(layout)
    sizes = {"band": bands, "row": height, "column": width}
    # flatten nested lists/typed arrays into one 1-D array in layout order
    flat = np.asarray(_deep_concat(data), dtype=dtype)
    shaped = flat.reshape([sizes[a] for a in axes])
    perm = [axes.index(a) for a in ("band", "row", "column")]
    return np.ascontiguousarray(np.transpose(shaped, perm))


def from_brc(block, layout):
    """(B,H,W) ndarray -> nesting per layout string.

    The outermost grouping in the layout string becomes a list of numpy
    arrays (mirroring the reference's array-of-typed-array outputs,
    xdim.prepareData in geowarp.js:477-483); a single flat group stays one
    ndarray.
    """
    axes = _axes(layout)
    perm = [("band", "row", "column").index(a) for a in axes]
    arr = np.transpose(block, perm)
    groups = [g.count(",") + 1 for g in layout.strip("[]").split("][")]
    if len(groups) == 1:
        return np.ascontiguousarray(arr).reshape(-1)
    if len(groups) == 2 and groups[0] == 1:
        # e.g. [band][row,column] -> list of flat per-band arrays
        return [np.ascontiguousarray(a).reshape(-1) for a in arr]
    if len(groups) == 2 and groups[0] == 2:
        # [row,column][band]
        flat = np.ascontiguousarray(arr).reshape(-1, arr.shape[-1])
        return [row.copy() for row in flat]
    if len(groups) == 3:
        return [[np.ascontiguousarray(c) for c in b] for b in arr]
    raise ValueError(f"unsupported layout: {layout!r}")


def _deep_concat(data):
    """Flatten arbitrarily nested sequences of arrays into 1-D."""
    if isinstance(data, np.ndarray):
        return data.reshape(-1)
    if isinstance(data, (list, tuple)):
        if len(data) == 0:
            return np.array([])
        if isinstance(data[0], (list, tuple, np.ndarray)):
            return np.concatenate([_deep_concat(d) for d in data])
        return np.asarray(data)
    return np.asarray(data)
