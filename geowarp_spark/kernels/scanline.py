"""Polygon -> per-row pixel segments (scanline rasterization) + complement.

Re-creates the roles of ``dufour-peyton-intersection`` (geowarp.js:383-394:
rasterize the cutline onto the output grid as per-row [start,end] column
segments; geowarp.js:674-698: rasterize each reprojected input-pixel quad
in the "vectorize" kernel) and ``segflip`` (geowarp.js:395-410: complement
segments for cutline_strategy="inside").

Algorithm: even-odd scanline at pixel-row centers.  A pixel belongs to the
polygon iff its center lies inside (the standard grid-intersection
convention).  Geometry accepts GeoJSON-style Polygon / MultiPolygon
coordinate arrays (rings = [[x, y], ...]).
"""

from __future__ import annotations

import numpy as np


def _rings_of(geometry):
    """GeoJSON geometry dict or raw coordinates -> list of rings."""
    if isinstance(geometry, dict):
        gtype = geometry.get("type")
        coords = geometry.get("coordinates")
        if gtype == "Polygon":
            polys = [coords]
        elif gtype == "MultiPolygon":
            polys = coords
        elif gtype == "Feature":
            return _rings_of(geometry["geometry"])
        elif gtype == "FeatureCollection":
            rings = []
            for f in geometry["features"]:
                rings.extend(_rings_of(f))
            return rings
        else:
            raise ValueError(f"unsupported geometry type {gtype!r}")
    else:
        polys = geometry if _depth(geometry) == 4 else [geometry]
    rings = []
    for poly in polys:
        rings.extend(poly)
    return rings


def _depth(x):
    d = 0
    while isinstance(x, (list, tuple, np.ndarray)):
        if len(x) == 0:
            return d + 1
        x = x[0]
        d += 1
    return d


def rasterize_segments(geometry, raster_bbox, raster_height, raster_width):
    """Polygon -> list (len raster_height) of [col_start, col_end] segments
    (inclusive ints), matching dufour_peyton_intersection.calculate's
    ``rows`` output shape (geowarp.js:383-394).
    """
    xmin, ymin, xmax, ymax = (float(v) for v in raster_bbox)
    pw = (xmax - xmin) / raster_width
    ph = (ymax - ymin) / raster_height

    rings = _rings_of(geometry)
    edges = []  # (y0, y1, x_at_y0, slope) with y0 < y1
    for ring in rings:
        pts = np.asarray(ring, dtype=np.float64)
        x0s, y0s = pts[:-1, 0], pts[:-1, 1]
        x1s, y1s = pts[1:, 0], pts[1:, 1]
        for x0, y0, x1, y1 in zip(x0s, y0s, x1s, y1s):
            if y0 == y1:
                continue  # horizontal edges never cross a scanline strictly
            edges.append((x0, y0, x1, y1))
    segments = [[] for _ in range(raster_height)]
    if not edges:
        return segments
    e = np.asarray(edges, dtype=np.float64)
    ex0, ey0, ex1, ey1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]

    rows = np.arange(raster_height)
    ys = ymax - (rows + 0.5) * ph  # scanline y at each pixel-row center
    # crossing test: half-open [min(y0,y1), max(y0,y1)) avoids double count
    ylo = np.minimum(ey0, ey1)
    yhi = np.maximum(ey0, ey1)
    for r, y in zip(rows, ys):
        hit = (y >= ylo) & (y < yhi)
        if not hit.any():
            continue
        t = (y - ey0[hit]) / (ey1[hit] - ey0[hit])
        xs = np.sort(ex0[hit] + t * (ex1[hit] - ex0[hit]))
        # even-odd pairing
        segs = []
        for i in range(0, xs.size - 1, 2):
            x_in, x_out = xs[i], xs[i + 1]
            # pixels whose center x lies within [x_in, x_out]
            c0 = int(np.ceil((x_in - xmin) / pw - 0.5))
            c1 = int(np.floor((x_out - xmin) / pw - 0.5))
            c0 = max(c0, 0)
            c1 = min(c1, raster_width - 1)
            if c0 <= c1:
                segs.append([c0, c1])
        segments[r] = _merge(segs)
    return segments


def _merge(segs):
    if len(segs) <= 1:
        return segs
    segs.sort()
    out = [segs[0]]
    for s in segs[1:]:
        if s[0] <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], s[1])
        else:
            out.append(s)
    return out


def segflip(segments, lo, hi):
    """Complement of inclusive integer segments within [lo, hi]
    (segflip dep, geowarp.js:402-407)."""
    out = []
    cursor = lo
    for s0, s1 in segments:
        if s0 > cursor:
            out.append([cursor, s0 - 1])
        cursor = max(cursor, s1 + 1)
    if cursor <= hi:
        out.append([cursor, hi])
    return out


def segments_to_mask(segments, width):
    """Per-row segments -> boolean (H, W) keep-mask."""
    h = len(segments)
    mask = np.zeros((h, width), dtype=bool)
    for r, segs in enumerate(segments):
        for s0, s1 in segs:
            mask[r, s0 : s1 + 1] = True
    return mask
