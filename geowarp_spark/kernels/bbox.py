"""Bounding-box math (reference: bbox-fns usage in geowarp.js:1,10).

- ``reproject_bbox``: densified edge-sampled reprojection with the
  reference's nan strategies (geowarp.js:197 density=100;
  geowarp.js:552,586,618 nan_strategy="skip"; geowarp.js:895-899
  nan_strategy="throw"; corner-only default used for the out-srs ->
  image-coords mapping at geowarp.js:647,895).
- ``intersect`` / ``boolean_intersects``: geowarp.js:553,564,643,641,651.
"""

from __future__ import annotations

import numpy as np


class BboxNaNError(ValueError):
    """Raised under nan_strategy='throw' (geowarp.js:900-904 catches this
    to skip sample boxes that cross the projection's valid bounds)."""


def _edge_points(bbox, density):
    """Corner + densified edge points of a bbox.

    density=0 -> 4 corners.  density=d -> d extra points per edge,
    matching bbox-fns/reproject.js's evenly spaced edge sampling.
    """
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    if density <= 0:
        xs = np.array([xmin, xmax, xmin, xmax])
        ys = np.array([ymin, ymin, ymax, ymax])
        return xs, ys
    t = np.linspace(0.0, 1.0, density + 2)  # includes corners
    ex = xmin + t * (xmax - xmin)
    ey = ymin + t * (ymax - ymin)
    xs = np.concatenate([ex, ex, np.full_like(ey, xmin), np.full_like(ey, xmax)])
    ys = np.concatenate([np.full_like(ex, ymin), np.full_like(ex, ymax), ey, ey])
    return xs, ys


def reproject_bbox(bbox, transform, density=0, nan_strategy="skip"):
    """Reproject a bbox through a bulk point ``transform(xs, ys)``.

    Returns [xmin, ymin, xmax, ymax] over the transformed sample points.
    nan_strategy: "skip" drops non-finite points, "throw" raises
    BboxNaNError if any point is non-finite.
    """
    xs, ys = _edge_points(bbox, density)
    tx, ty = transform(xs, ys)
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    ok = np.isfinite(tx) & np.isfinite(ty)
    if not ok.all():
        if nan_strategy == "throw":
            raise BboxNaNError("bbox reprojection produced non-finite points")
        tx, ty = tx[ok], ty[ok]
        if tx.size == 0:
            raise BboxNaNError("bbox reprojection produced no finite points")
    return [float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())]


def intersect(a, b):
    """bbox intersection (None if disjoint) — bbox-fns ``intersect``."""
    xmin = max(a[0], b[0])
    ymin = max(a[1], b[1])
    xmax = min(a[2], b[2])
    ymax = min(a[3], b[3])
    if xmin > xmax or ymin > ymax:
        return None
    return [xmin, ymin, xmax, ymax]


def boolean_intersects(a, b):
    """True if the two bboxes touch/overlap — bbox-fns ``booleanIntersects``."""
    return a[0] <= b[2] and a[2] >= b[0] and a[1] <= b[3] and a[3] >= b[1]
