"""GDAL-style 6-parameter geotransform, vectorized.

Reference semantics: geowarp.js:304-309 builds a Geotransform from
``[x0, xres, xskew, y0, yskew, yres]`` (geoaffine/Geotransform.js) whose
``forward`` maps image (col,row) -> srs (x,y) and ``inverse`` maps srs ->
image.  The default (unskewed) transform is
``[in_xmin, in_pixel_width, 0, in_ymax, 0, -in_pixel_height]``
(geowarp.js:304).

forward:  x = x0 + col*xres + row*xskew
          y = y0 + col*yskew + row*yres
inverse:  solve the 2x2 linear system (exact f64, same operation order
          as a direct determinant inversion).
"""

from __future__ import annotations

import numpy as np


class Geotransform:
    """Vectorized forward/inverse affine for a GDAL geotransform."""

    __slots__ = ("gt", "_inv_det", "_x0", "_y0", "_a", "_b", "_c", "_d")

    def __init__(self, gt):
        gt = [float(v) for v in gt]
        if len(gt) != 6:
            raise ValueError("geotransform must have 6 parameters")
        self.gt = gt
        self._x0, self._a, self._b, self._y0, self._c, self._d = gt
        det = self._a * self._d - self._b * self._c
        if det == 0:
            raise ValueError("geotransform is singular")
        self._inv_det = 1.0 / det

    def forward(self, col, row):
        """image (col,row) -> srs (x,y); accepts scalars or ndarrays."""
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        x = self._x0 + col * self._a + row * self._b
        y = self._y0 + col * self._c + row * self._d
        return x, y

    def inverse(self, x, y):
        """srs (x,y) -> image (col,row) as floats (no flooring here)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        dx = x - self._x0
        dy = y - self._y0
        col = (dx * self._d - dy * self._b) * self._inv_det
        row = (dy * self._a - dx * self._c) * self._inv_det
        return col, row

    @classmethod
    def from_bbox(cls, bbox, width, height):
        """Unskewed transform from bbox + pixel dims (geowarp.js:299-304)."""
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        pw = (xmax - xmin) / width
        ph = (ymax - ymin) / height
        return cls([xmin, pw, 0.0, ymax, 0.0, -ph])
