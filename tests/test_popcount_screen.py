"""Parity: the Pallas packed-popcount screen must match the indicator
matmul screen (interpret mode on CPU)."""

import numpy as np
from conftest import data

from galah_tpu.ops.popcount_screen import (
    pack_indicator,
    screen_triangle_popcount,
)
from galah_tpu.ops.prefilter import screen_triangle


def test_pack_indicator():
    bits = 1 << 10
    buckets = np.array([0, 1, 31, 32, 1023], dtype=np.int32)
    words = pack_indicator(buckets, bits)
    assert words[0] == (1 | 2 | (1 << 31))
    assert words[1] == 1
    assert words[31] == (1 << 31)
    assert int(np.unpackbits(words.view(np.uint8)).sum()) == 5


def test_popcount_matches_matmul_screen():
    bits = 1 << 12
    rng = np.random.default_rng(0)
    n = 20
    indicators = (rng.random((n, bits)) < 0.1).astype(np.uint8)
    indicators[3] = indicators[2]
    indicators[7] = indicators[6] * (rng.random(bits) < 0.6)
    sizes = indicators.sum(axis=1)
    packed = [
        pack_indicator(np.nonzero(row)[0].astype(np.int32), bits)
        for row in indicators
    ]
    a = screen_triangle(list(indicators), sizes, k=15, min_containment=0.15)
    b = screen_triangle_popcount(packed, sizes, 15, 0.15, bits)
    assert np.array_equal(a.pairs, b.pairs)
    np.testing.assert_allclose(a.ani_est, b.ani_est, rtol=1e-3)


def test_popcount_on_real_sketches():
    from galah_tpu.sketch.fracminhash import NativeSketchParams, sketch_file_native

    params = NativeSketchParams()
    paths = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("antonio_mags/BE_RX_R2_MAG52.fna"),
    ]
    sks = [sketch_file_native(p, params) for p in paths]
    bits = params.prefilter_bits
    packed = [pack_indicator(s.prefilter_buckets, bits) for s in sks]
    sizes = np.asarray([s.n_prefilter for s in sks])
    res = screen_triangle_popcount(packed, sizes, params.k, 0.1, bits)
    got = {tuple(p) for p in res.pairs.tolist()}
    assert (0, 1) in got          # related abisko pair
    assert (0, 2) not in got      # unrelated antonio MAG
    assert (1, 2) not in got
