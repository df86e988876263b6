"""Vectorized window reducers with reference-pinned edge semantics.

Reference: geowarp.js box-statistic branch (geowarp.js:845-968) and its
helpers ``mean`` (geowarp.js:55-63), ``mode`` (geowarp.js:65-86, ties
return ALL modes; plain "mode" takes ``[0]`` at geowarp.js:860 which under
JS integer-key object ordering + stable sort = the SMALLEST tied value),
``mediana.calculate`` (even count -> average of the two middle values),
fast-min/fast-max (short-circuit only; results are plain min/max).

All reducers operate on a gathered window matrix ``values`` of shape
(n_windows, window_size) with a boolean ``valid`` mask of the same shape
(valid = is a number, not NaN, not in in_no_data — geowarp.js:951).
Rows with zero valid values produce NaN (the caller substitutes
``primary_in_no_data`` per geowarp.js:952-953).

The mode family is fully vectorized: sort each window row ascending with
+inf padding for invalid entries, detect runs, then per-row pick among
max-count runs.  Ascending order makes "first tied run" == smallest tied
value, matching the JS object-key ordering for the unsigned-integer pixel
values used by every reference test.
"""

from __future__ import annotations

import numpy as np

SIMPLE_METHODS = ("min", "max", "mean", "median")
MODE_METHODS = ("mode", "mode-min", "mode-max", "mode-mean", "mode-median")


def reduce_windows(values, valid, method):
    """Reduce each row of ``values`` (masked by ``valid``) -> (n,) float64."""
    if callable(method):
        return _reduce_custom(values, valid, method)
    if method in SIMPLE_METHODS:
        return _reduce_simple(values, valid, method)
    if method in MODE_METHODS:
        return _reduce_mode(values, valid, method)
    raise ValueError(f"unknown method {method!r}")


def _reduce_simple(values, valid, method):
    if method == "median":
        # median via sort + middle pick (r8): np.nanmedian degrades to a
        # per-row python path when NaNs are present (measured 15x slower
        # on window batches).  +inf padding is safe — ``valid`` already
        # excludes non-finite values — and (lo + hi) / 2 reproduces
        # nanmedian's even-count average bit-for-bit (odd counts have
        # lo == hi); rows with zero valid values stay NaN.  Verified
        # identical (equal_nan) against np.nanmedian on randomized
        # windows incl. ties, negatives and fractional values.
        s = np.sort(np.where(valid, values, np.inf), axis=1)
        cnt = valid.sum(axis=1)
        out = np.full(values.shape[0], np.nan)
        idx = np.flatnonzero(cnt > 0)
        c = cnt[idx]
        lo = s[idx, (c - 1) // 2]
        hi = s[idx, c // 2]
        out[idx] = (lo + hi) / 2.0
        return out
    v = np.where(valid, values, np.nan)
    with np.errstate(all="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if method == "min":
                return np.nanmin(v, axis=1)
            if method == "max":
                return np.nanmax(v, axis=1)
            if method == "mean":
                return np.nanmean(v, axis=1)


def _reduce_custom(values, valid, fn):
    """Custom reducer (geowarp.js:849-850): called with the window's valid
    values in window scan order, e.g. ``lambda vals: vals[0]`` ("first",
    test.js:248)."""
    n = values.shape[0]
    out = np.full(n, np.nan)
    for i in range(n):
        vv = values[i][valid[i]]
        if vv.size:
            out[i] = fn(vv)
    return out


def _reduce_mode(values, valid, method):
    n, k = values.shape
    if n == 0:
        return np.empty(0, dtype=np.float64)
    s = np.where(valid, values, np.inf).astype(np.float64, copy=False)
    s = np.sort(s, axis=1)

    new = np.ones((n, k), dtype=bool)
    new[:, 1:] = s[:, 1:] != s[:, :-1]
    flat = s.reshape(-1)
    starts = np.flatnonzero(new.reshape(-1))  # global run starts, ascending
    run_val = flat[starts]
    run_len = np.diff(np.append(starts, n * k))
    run_row = starts // k

    keep = np.isfinite(run_val)
    run_val, run_len, run_row = run_val[keep], run_len[keep], run_row[keep]
    out = np.full(n, np.nan)
    if run_val.size == 0:
        return out

    # group boundaries: runs are ordered by (row asc, value asc)
    gstarts = np.flatnonzero(np.concatenate(([True], run_row[1:] != run_row[:-1])))
    grows = run_row[gstarts]
    gid = np.cumsum(np.concatenate(([0], (run_row[1:] != run_row[:-1]).astype(np.int64))))

    lmax = np.maximum.reduceat(run_len, gstarts)
    tied = run_len == lmax[gid]

    if method in ("mode", "mode-min"):
        idx = np.arange(run_val.size)
        first = np.minimum.reduceat(np.where(tied, idx, run_val.size), gstarts)
        out[grows] = run_val[first]
    elif method == "mode-max":
        idx = np.arange(run_val.size)
        last = np.maximum.reduceat(np.where(tied, idx, -1), gstarts)
        out[grows] = run_val[last]
    elif method == "mode-mean":
        ssum = np.add.reduceat(np.where(tied, run_val, 0.0), gstarts)
        scnt = np.add.reduceat(tied.astype(np.int64), gstarts)
        out[grows] = ssum / scnt
    else:  # mode-median: median of the tied values (ascending within group)
        cs = np.cumsum(tied.astype(np.int64))
        base = cs[gstarts] - tied[gstarts]
        rank = cs - base[gid]  # 1-based rank among tied runs, 0 if before first
        m = np.add.reduceat(tied.astype(np.int64), gstarts)
        lo_t = (m - 1) // 2 + 1
        hi_t = m // 2 + 1
        lo_val = np.zeros(len(gstarts))
        hi_val = np.zeros(len(gstarts))
        sel_lo = tied & (rank == lo_t[gid])
        sel_hi = tied & (rank == hi_t[gid])
        lo_val[gid[sel_lo]] = run_val[sel_lo]
        hi_val[gid[sel_hi]] = run_val[sel_hi]
        out[grows] = (lo_val + hi_val) / 2.0
    return out


def quick_histogram(block, grid=(10, 10)):
    """Sampled pixel histogram (A11, quickHistogram geowarp.js:97-111):
    evenly spaced sample points estimate the value distribution without a
    full pass.  Returns (pixel_tuples, counts) sorted by count desc.
    Used to predict the process-cache hit rate (R5, geowarp.js:437-450).
    """
    block = np.asarray(block)
    b, h, w = block.shape
    across, down = grid
    rows = (np.arange(down) * (h / down)).astype(np.int64)
    cols = (np.arange(across) * (w / across)).astype(np.int64)
    sample = block[:, rows][:, :, cols].reshape(b, -1)
    px, counts = np.unique(sample.T, axis=0, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    return px[order], counts[order]


def predicted_cache_hit_rate(block, grid=(10, 10)):
    """hits/total with 1 miss per distinct pixel (geowarp.js:438-446)."""
    _, counts = quick_histogram(block, grid)
    total = counts.sum()
    return float((counts - 1).sum() / total) if total else 0.0


def js_round(x):
    """JS Math.round = half-toward-+inf (floor(x+0.5)), NOT banker's
    rounding (geowarp.js:257,271,279; SURVEY F10).  NaN passes through."""
    return np.floor(np.asarray(x, dtype=np.float64) + 0.5)
