"""Reference-shaped API: geowarp(**options) with the reference's names."""

import numpy as np

from geowarp_spark.api import geowarp


def test_reference_option_names():
    data = [np.array([10, 20, 30, 40], dtype=np.uint8)]  # [band][row,column]
    r = geowarp(
        in_data=data,
        in_bbox=[0, 0, 2, 2],
        in_srs=3857,
        out_srs=3857,
        in_width=2,
        in_height=2,
        out_width=2,
        out_height=2,
        method="near",
        round=True,                      # reference name, not round_values
        out_array_types=["Uint8Array"],  # reference constructor names
        debug_level=2,                   # accepted + ignored
        cache_process=False,
        in_no_data=40,
        out_no_data=0,
    )
    assert r["block"].dtype == np.uint8
    np.testing.assert_array_equal(r["block"][0], [[10, 20], [30, 0]])
    # result envelope keys match generate_result (geowarp.js:970-985)
    for k in ("data", "out_bands", "out_height", "out_layout",
              "out_pixel_height", "out_pixel_width", "out_width", "read_bands"):
        assert k in r


def test_envelope_layout_default_matches_input():
    data = [np.arange(4, dtype=np.uint8)]
    r = geowarp(in_data=data, in_bbox=[0, 0, 2, 2], in_srs=4326, out_srs=4326,
                in_width=2, in_height=2, out_width=2, out_height=2, method="near")
    assert r["out_layout"] == "[band][row,column]"
    assert isinstance(r["data"], list) and r["data"][0].shape == (4,)

def test_mixed_out_array_types_per_band():
    """Per-band dtypes (geowarp.js:477-483): float data + uint8 alpha."""
    data = np.stack([
        np.array([[1.5, 2.5], [3.5, 4.5]]),
        np.array([[255, 255], [255, 255]], dtype=float),
    ])
    r = geowarp(
        in_data=data, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
        in_width=2, in_height=2, out_width=2, out_height=2, method="near",
        out_array_types=["Float32Array", "Uint8Array"],
    )
    assert isinstance(r["data"], list)
    assert r["data"][0].dtype == np.float32
    assert r["data"][1].dtype == np.uint8
    np.testing.assert_allclose(r["data"][0], [1.5, 2.5, 3.5, 4.5])
    np.testing.assert_array_equal(r["data"][1], [255, 255, 255, 255])
    # canonical block widens to a common dtype
    assert r["block"].dtype == np.float32


def test_insert_pixel_and_sample_sinks():
    """Pluggable sinks (S6, geowarp.js:157-158 / README.md:177-193):
    vectorized (band, rows, cols, values) calls covering every written
    output pixel / sample."""
    data = [np.array([[10, 20], [30, 40]], dtype=np.uint8)]
    seen_px = {}
    seen_samp = {}

    def insert_pixel(band, rows, cols, values):
        seen_px[band] = (rows.copy(), cols.copy(), values.copy())

    def insert_sample(band, rows, cols, values):
        seen_samp[band] = (rows.copy(), cols.copy(), values.copy())

    r = geowarp(
        in_data=data, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
        in_width=2, in_height=2, out_width=2, out_height=2, method="near",
        out_array_types=["Uint8Array"],
        insert_pixel=insert_pixel, insert_sample=insert_sample,
    )
    rows, cols, vals = seen_px[0]
    assert len(rows) == 4  # every out pixel written
    grid = np.zeros((2, 2), dtype=np.uint8)
    grid[rows, cols] = vals
    np.testing.assert_array_equal(grid, r["block"][0])
    srows, scols, svals = seen_samp[0]
    assert len(srows) == 4 and svals.dtype == np.uint8


def test_insert_null_strategy_controls_sink_visibility():
    """P5 (geowarp.js:152,514-519): 'skip' never hands null samples to the
    pluggable sink; 'insert' forwards them as NaN."""
    data = [np.array([[10, 20], [30, 40]], dtype=np.uint8)]
    calls = {}

    def make_sink(name):
        def sink(band, rows, cols, values):
            calls[name] = len(rows)
        return sink

    common = dict(
        in_data=data, in_bbox=[0, 0, 2, 2], in_srs=3857, out_srs=3857,
        in_width=2, in_height=2, out_width=2, out_height=2, method="near",
        in_no_data=40,  # one of the 4 samples is no-data -> null
    )
    geowarp(insert_sample=make_sink("skip"),
            insert_null_strategy="skip", **common)
    geowarp(insert_sample=make_sink("insert"),
            insert_null_strategy="insert", **common)
    assert calls["skip"] == 3      # the null sample is withheld
    assert calls["insert"] == 4    # ... or forwarded, per strategy


def test_oracle_canon_detects_single_value_mutation():
    """Mutation probe (verify-skill recipe): the driver-gate canonical
    hash must diverge when ONE value of a result changes — guards
    against a vacuous compare, especially for the pinned-parquet warp
    oracles where both sides read the same fixture family."""
    import sys

    import pandas as pd

    sys.path.insert(0, "/root/repo/tools")
    from check_oracle import canon

    base = pd.DataFrame({"z": [9, 9, 10], "crc": [111, 222, 333]})
    h0, n0 = canon(base)
    mut = base.copy()
    mut.loc[1, "crc"] = 223
    h1, n1 = canon(mut)
    assert n0 == n1 == 3 and h0 != h1
    # column order must NOT matter (driver sorts columns by name)
    reordered = base[["crc", "z"]]
    assert canon(reordered)[0] == h0
    # row order must NOT matter (order-insensitive compare)
    shuffled = base.iloc[[2, 0, 1]]
    assert canon(shuffled)[0] == h0
