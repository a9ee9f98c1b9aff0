"""MT19937 / uniform-float parity with libstdc++ (std::mt19937 +
std::uniform_real_distribution<float>), which the reference uses for
manufactured solutions (gmres_perf_test.cpp:39-51).

Golden values generated with g++ 12 / libstdc++ (see docstring of
gmres_tpu/io/rng.py)."""

import numpy as np

from gmres_tpu.io.rng import MT19937, rand_vect


def test_raw_stream_seed42():
    got = MT19937(42).random_raw(6).tolist()
    assert got == [
        1608637542, 3421126067, 4083286876, 787846414, 3143890026, 3348747335,
    ]


def test_raw_stream_seed0():
    got = MT19937(0).random_raw(4).tolist()
    assert got == [2357136044, 2546248239, 3071714933, 3626093760]


def test_uniform_floats_seed42():
    want = [
        3.745401204e-01, 7.965430021e-01, 9.507142901e-01, 1.834347844e-01,
        7.319939137e-01, 7.796909809e-01, 5.986585021e-01, 5.968501568e-01,
    ]
    got = rand_vect(8, 42)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_uniform_float_across_twist_boundary():
    # index 1000 crosses the 624-word twist boundary twice-refilled state
    v = rand_vect(1001, 7)[1000]
    np.testing.assert_allclose(v, 9.646173120e-01, rtol=1e-9)


def test_dtype_and_range():
    v = rand_vect(10_000, 3)
    assert v.dtype == np.float64
    assert (v >= 0).all() and (v < 1).all()
    # values are exactly representable float32s
    assert (v.astype(np.float32).astype(np.float64) == v).all()


def test_streaming_matches_batch():
    g = MT19937(5)
    a = np.concatenate([g.random_raw(100), g.random_raw(1000), g.random_raw(1)])
    b = MT19937(5).random_raw(1101)
    assert (a == b).all()
