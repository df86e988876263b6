"""Pure-numpy EPSG projection registry (no pyproj in this environment).

The reference is projection-agnostic: callers inject ``forward``/``inverse``
point-mapping closures (geowarp.js:149-150, README.md:20-25).  Our engine
keeps the same pluggable contract — any object with vectorized
``forward(lon, lat) -> (x, y)`` / ``inverse(x, y) -> (lon, lat)`` works —
and ships built-in implementations for the EPSG codes exercised by the
reference test fixtures (test.js: 3857, 4326, 32615, 32617, 26910, 3031).

Implementations use published formulas only:
- EPSG:3857  spherical web mercator,
- UTM zones  transverse mercator via the 6th-order Krueger series
  (Karney 2011, "Transverse Mercator with an accuracy of a few
  nanometers"),
- EPSG:3031  south polar stereographic on the conformal sphere
  (EPSG guidance note 7-2 method 9829, re-expressed through the same
  conformal-latitude helpers).

Everything is vectorized over numpy arrays — these run inside Arrow
pandas UDFs on bulk coordinate grids (BASELINE.json: "inverse affine +
proj transform maps output pixel grids back to source coordinates in
bulk").
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
GRS80_F = 1.0 / 298.257222101  # NAD83 (EPSG:269xx)

_R = WGS84_A  # web-mercator sphere radius
WEB_MERCATOR_EXTENT = np.pi * _R  # 20037508.342789244


def _hyp(x):
    return np.sqrt(1.0 + x * x)


def _taupf(tau, e):
    """tau' = tan(conformal latitude) from tau = tan(latitude)."""
    tau = np.asarray(tau, dtype=np.float64)
    sig = np.sinh(e * np.arctanh(e * tau / _hyp(tau)))
    return tau * _hyp(sig) - sig * _hyp(tau)


def _tauf(taup, e):
    """Inverse of _taupf via Newton iteration (converges to f64 in <=5)."""
    taup = np.asarray(taup, dtype=np.float64)
    e2m = 1.0 - e * e
    tau = taup / e2m
    for _ in range(5):
        taupa = _taupf(tau, e)
        dtau = (taup - taupa) * (1.0 + e2m * tau * tau) / (e2m * _hyp(tau) * _hyp(taupa))
        tau = tau + dtau
    return tau


class Identity:
    epsg = 4326

    def forward(self, lon, lat):
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)

    inverse = forward


class WebMercator:
    """EPSG:3857 — spherical mercator. Latitudes beyond the valid range
    project to +/-inf -> NaN, matching the out-of-projection-bounds
    behavior the reference tests rely on (test.js:864-926 warps the whole
    globe 3857->4326 and skips NaN sample boxes, geowarp.js:894-904)."""

    epsg = 3857

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        x = _R * np.radians(lon)
        with np.errstate(divide="ignore", invalid="ignore"):
            y = _R * np.arctanh(np.sin(np.radians(lat)))
            y = np.where(np.abs(lat) >= 90.0, np.nan, y)
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lon = np.degrees(x / _R)
        lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
        return lon, lat


class TransverseMercator:
    """Krueger-series TM; UTM parameterization."""

    def __init__(self, lon0_deg, k0=0.9996, false_easting=500000.0,
                 false_northing=0.0, a=WGS84_A, f=WGS84_F, epsg=None):
        self.epsg = epsg
        self.lon0 = np.radians(lon0_deg)
        self.k0 = k0
        self.fe = false_easting
        self.fn = false_northing
        self.e = np.sqrt(f * (2.0 - f))
        n = f / (2.0 - f)
        self.A = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0)
        self.alpha = np.array([
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180 - 127 * n**5 / 288 + 7891 * n**6 / 37800,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
            61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880 + 167603 * n**6 / 181440,
            49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
            34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
            212378941 * n**6 / 319334400,
        ])
        self.beta = np.array([
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360 - 81 * n**5 / 512 + 96199 * n**6 / 604800,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105 - 1118711 * n**6 / 3870720,
            17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480 + 5569 * n**6 / 90720,
            4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
            4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
            20648693 * n**6 / 638668800,
        ])
        self._j2 = 2.0 * np.arange(1, 7)

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        dlon = lon - self.lon0
        taup = _taupf(np.tan(lat), self.e)
        xi_p = np.arctan2(taup, np.cos(dlon))
        eta_p = np.arcsinh(np.sin(dlon) / np.hypot(taup, np.cos(dlon)))
        xi2 = np.multiply.outer(xi_p, self._j2)
        eta2 = np.multiply.outer(eta_p, self._j2)
        xi = xi_p + (np.sin(xi2) * np.cosh(eta2)) @ self.alpha
        eta = eta_p + (np.cos(xi2) * np.sinh(eta2)) @ self.alpha
        return self.fe + self.k0 * self.A * eta, self.fn + self.k0 * self.A * xi

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        eta = (x - self.fe) / (self.k0 * self.A)
        xi = (y - self.fn) / (self.k0 * self.A)
        xi2 = np.multiply.outer(xi, self._j2)
        eta2 = np.multiply.outer(eta, self._j2)
        xi_p = xi - (np.sin(xi2) * np.cosh(eta2)) @ self.beta
        eta_p = eta - (np.cos(xi2) * np.sinh(eta2)) @ self.beta
        taup = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
        lat = np.arctan(_tauf(taup, self.e))
        dlon = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.degrees(self.lon0 + dlon), np.degrees(lat)


class PolarStereographicSouth:
    """EPSG:3031-style south polar stereographic (variant B)."""

    def __init__(self, lat_ts_deg=-71.0, lon0_deg=0.0, a=WGS84_A, f=WGS84_F, epsg=3031):
        self.epsg = epsg
        self.lon0 = np.radians(lon0_deg)
        self.a = a
        self.e = np.sqrt(f * (2.0 - f))
        # south aspect: work with flipped latitude so the pole maps to rho=0
        lat_f = np.radians(-lat_ts_deg)
        taup_f = _taupf(np.tan(lat_f), self.e)
        t_f = taup_f + _hyp(taup_f)  # tan(pi/4 + chi_F/2)
        m_f = np.cos(lat_f) / np.sqrt(1.0 - (self.e * np.sin(lat_f)) ** 2)
        self.C = a * m_f * t_f  # rho = C / t(chi)  with t >= 1 toward the pole

    def forward(self, lon, lat):
        lon = np.radians(np.asarray(lon, dtype=np.float64))
        lat = np.radians(np.asarray(lat, dtype=np.float64))
        taup = _taupf(np.tan(-lat), self.e)  # flip to north aspect
        t = taup + _hyp(taup)
        rho = self.C / t
        dlon = lon - self.lon0
        return rho * np.sin(dlon), rho * np.cos(dlon)

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rho = np.hypot(x, y)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = self.C / rho
            taup = (t - 1.0 / t) / 2.0
        lat = -np.degrees(np.arctan(_tauf(taup, self.e)))
        lat = np.where(rho == 0.0, -90.0, lat)
        lon = np.degrees(self.lon0 + np.arctan2(x, y))
        return lon, lat


class PyprojProjection:
    """Auto-fallback for EPSG codes without a built-in pure-numpy
    implementation (VERDICT r3 next #5): used ONLY when the cluster has
    pyproj installed AND the code isn't one of the pinned built-ins
    above — the built-ins stay the default for the reference-parity
    codes so pinned results never depend on the executors' PROJ build.

    Lazily constructed and pickle-safe: only the EPSG code crosses the
    serialization boundary (pyproj Transformer objects historically
    don't pickle); each executor builds its own transformer pair on
    first use."""

    def __init__(self, epsg):
        self.epsg = int(epsg)
        self._fwd = None
        self._inv = None

    def __getstate__(self):
        return {"epsg": self.epsg}

    def __setstate__(self, state):
        self.__init__(state["epsg"])

    def _pair(self):
        if self._fwd is None:
            from pyproj import Transformer as _PT

            self._fwd = _PT.from_crs(4326, self.epsg, always_xy=True)
            self._inv = _PT.from_crs(self.epsg, 4326, always_xy=True)
        return self._fwd, self._inv

    def forward(self, lon, lat):
        fwd, _ = self._pair()
        x, y = fwd.transform(np.asarray(lon, dtype=np.float64),
                             np.asarray(lat, dtype=np.float64))
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)

    def inverse(self, x, y):
        _, inv = self._pair()
        lon, lat = inv.transform(np.asarray(x, dtype=np.float64),
                                 np.asarray(y, dtype=np.float64))
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)


def _has_pyproj():
    try:
        import pyproj  # noqa: F401
        return True
    except ImportError:
        return False


def get_projection(epsg):
    """EPSG code -> projection object with forward/inverse (lon,lat)<->(x,y).
    Unknown codes fall back to pyproj when it is installed; otherwise the
    caller must inject custom closures (the reference's own contract,
    geowarp.js:149-150)."""
    epsg = int(str(epsg).replace("EPSG:", ""))
    if epsg == 4326:
        return Identity()
    if epsg == 3857 or epsg == 900913:
        return WebMercator()
    if epsg == 3031:
        return PolarStereographicSouth()
    if 32601 <= epsg <= 32660:  # WGS84 UTM north
        return TransverseMercator((epsg - 32600) * 6 - 183, epsg=epsg)
    if 32701 <= epsg <= 32760:  # WGS84 UTM south
        return TransverseMercator((epsg - 32700) * 6 - 183, false_northing=1e7, epsg=epsg)
    if 26901 <= epsg <= 26923:  # NAD83 UTM north (GRS80)
        return TransverseMercator((epsg - 26900) * 6 - 183, f=GRS80_F, epsg=epsg)
    if _has_pyproj():
        return PyprojProjection(epsg)
    raise ValueError(
        f"unsupported EPSG:{epsg} — install pyproj for automatic support, "
        "or inject custom forward/inverse closures")


class Transformer:
    """Composed srs->srs point transform, pyproj-Transformer-like.

    ``transform(x, y)`` is vectorized; this is the object injected where
    the reference takes ``forward``/``inverse`` closures.
    """

    def __init__(self, from_epsg, to_epsg):
        self.from_epsg = from_epsg
        self.to_epsg = to_epsg
        self._src = get_projection(from_epsg)
        self._dst = get_projection(to_epsg)

    def transform(self, x, y):
        if self.from_epsg == self.to_epsg:
            return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
        lon, lat = self._src.inverse(x, y)
        return self._dst.forward(lon, lat)

    def __call__(self, x, y):
        return self.transform(x, y)


def transformer(from_epsg, to_epsg):
    return Transformer(from_epsg, to_epsg)
