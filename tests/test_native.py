"""Native C++ kernel tests: build, bind, and match the numpy fallback."""
import numpy as np
import pytest

from mqe_tpu.native import build, get_lib


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _numpy_octave(angles, shape, res):
    """The numpy reference path (mirrors terrain/perlin.py fallback)."""

    def fade(t):
        return 6 * t**5 - 15 * t**4 + 10 * t**3

    delta = (res[0] / shape[0], res[1] / shape[1])
    d = (shape[0] // res[0], shape[1] // res[1])
    grid = np.mgrid[0 : res[0] : delta[0], 0 : res[1] : delta[1]].transpose(1, 2, 0) % 1
    gradients = np.dstack((np.cos(angles), np.sin(angles)))
    g00 = gradients[:-1, :-1].repeat(d[0], 0).repeat(d[1], 1)
    g10 = gradients[1:, :-1].repeat(d[0], 0).repeat(d[1], 1)
    g01 = gradients[:-1, 1:].repeat(d[0], 0).repeat(d[1], 1)
    g11 = gradients[1:, 1:].repeat(d[0], 0).repeat(d[1], 1)
    n00 = np.sum(grid * g00, 2)
    n10 = np.sum(np.dstack((grid[:, :, 0] - 1, grid[:, :, 1])) * g10, 2)
    n01 = np.sum(np.dstack((grid[:, :, 0], grid[:, :, 1] - 1)) * g01, 2)
    n11 = np.sum(np.dstack((grid[:, :, 0] - 1, grid[:, :, 1] - 1)) * g11, 2)
    t = fade(grid)
    n0 = n00 * (1 - t[:, :, 0]) + t[:, :, 0] * n10
    n1 = n01 * (1 - t[:, :, 0]) + t[:, :, 0] * n11
    return np.sqrt(2) * ((1 - t[:, :, 1]) * n0 + t[:, :, 1] * n1) * 0.5 + 0.5


def test_build_succeeds():
    assert build(verbose=True)


def test_octave_matches_numpy(lib):
    rng = np.random.default_rng(0)
    for shape, res in [((64, 64), (4, 4)), ((120, 80), (8, 4)), ((30, 30), (3, 5))]:
        angles = 2 * np.pi * rng.random((res[0] + 1, res[1] + 1))
        out = np.empty(shape, dtype=np.float64)
        lib.perlin_octave(
            np.ascontiguousarray(angles), res[0], res[1], shape[0], shape[1], out
        )
        ref = _numpy_octave(angles, shape, res)
        np.testing.assert_allclose(out, ref, atol=1e-12)


def test_accumulate_matches_manual(lib):
    rng = np.random.default_rng(1)
    res = (4, 4)
    padH, padW, H, W = 64, 64, 50, 60
    angles = 2 * np.pi * rng.random((res[0] + 1, res[1] + 1))
    scratch = np.empty((padH, padW), dtype=np.float64)
    out = np.ones((H, W), dtype=np.float64)
    lib.perlin_octave_accumulate(
        np.ascontiguousarray(angles), res[0], res[1], padH, padW, H, W,
        0.25, scratch, out,
    )
    ref = 1.0 + 0.25 * _numpy_octave(angles, (padH, padW), res)[:H, :W]
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_perlin_module_uses_native_transparently(lib):
    """terrain/perlin.py gives identical fields whether or not the native
    kernel is used (same numpy Generator stream)."""
    from mqe_tpu.terrain import perlin as P

    rng1 = np.random.default_rng(7)
    with_native = P.perlin_noise_2d(rng1, (64, 64), (4, 4))

    import mqe_tpu.native as native_mod

    saved_lib, saved_tried = native_mod._lib, native_mod._tried
    native_mod._lib, native_mod._tried = None, True  # force fallback
    try:
        rng2 = np.random.default_rng(7)
        without = P.perlin_noise_2d(rng2, (64, 64), (4, 4))
    finally:
        native_mod._lib, native_mod._tried = saved_lib, saved_tried
    np.testing.assert_allclose(with_native, without, atol=1e-12)


def test_fractal_field_deterministic(lib):
    from mqe_tpu.terrain.perlin import fractal_noise_2d

    a = fractal_noise_2d(np.random.default_rng(3), xSamples=160, ySamples=120)
    b = fractal_noise_2d(np.random.default_rng(3), xSamples=160, ySamples=120)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (160, 120)
