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
