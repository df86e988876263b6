"""Sinks (S4/S2), process cache (R5), quick histogram (A11)."""

import numpy as np

from geowarp_spark.kernels.stats import predicted_cache_hit_rate, quick_histogram
from geowarp_spark.kernels.warp import warp
from geowarp_spark.sources.sinks import write_png, write_ppm


def test_quick_histogram():
    block = np.zeros((1, 100, 100), dtype=np.uint8)
    block[0, 50:, :] = 7
    px, counts = quick_histogram(block)
    assert counts.sum() == 100  # 10x10 samples
    assert set(map(tuple, px.tolist())) == {(0,), (7,)}
    assert predicted_cache_hit_rate(block) == (100 - 2) / 100


def test_cache_process_identical_results():
    block = (np.arange(64 * 64).reshape(1, 64, 64) % 5).astype(np.uint8)
    calls = []

    def expr(v):
        calls.append(v.shape[1])
        return v * 2.0

    common = dict(in_data=block, in_bbox=[0, 0, 64, 64], in_srs=3857,
                  out_srs=3857, in_height=64, in_width=64,
                  out_width=64, out_height=64, method="near")
    a = warp(expr=expr, cache_process=False, **common)
    n_uncached = calls[-1]
    b = warp(expr=expr, cache_process=True, **common)
    n_cached = calls[-1]
    np.testing.assert_array_equal(a["block"], b["block"])
    assert n_cached == 5 and n_uncached == 64 * 64  # memoized over distinct pixels


def test_png_ppm_roundtrippable(tmp_path):
    import struct
    import zlib

    block = np.random.default_rng(1).integers(0, 255, (3, 8, 9)).astype(np.uint8)
    p = write_png(str(tmp_path / "t.png"), block)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", raw[16:24])
    assert (w, h) == (9, 8)
    # decode IDAT to confirm pixel bytes round-trip
    idat_start = raw.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", raw[idat_start - 8 : idat_start - 4])[0]
    scan = zlib.decompress(raw[idat_start : idat_start + idat_len])
    rows = [scan[r * (1 + 9 * 3) + 1 : (r + 1) * (1 + 9 * 3)] for r in range(8)]
    got = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(8, 9, 3)
    np.testing.assert_array_equal(got, np.transpose(block, (1, 2, 0)))

    p2 = write_ppm(str(tmp_path / "t.ppm"), block)
    raw2 = open(p2, "rb").read()
    assert raw2.startswith(b"P6 9 8 255\n")
