"""Native C++ runtime vs the numpy references (oracle pattern)."""

import numpy as np
import pytest

from raw_ngp_tpu import native
from raw_ngp_tpu.ops.grid import _morton3d_invert_np
from raw_ngp_tpu.postprocess.raw import bilinear_demosaic, linear_to_srgb


@pytest.fixture(scope="module")
def lib_available():
    ok = native.available()
    if not ok:
        pytest.skip("native library could not be built")
    return ok


def test_native_builds(lib_available):
    assert native.available()


def test_demosaic_matches_numpy(lib_available):
    rng = np.random.default_rng(0)
    bayer = rng.uniform(0, 1, (64, 96)).astype(np.float32)
    got = native.demosaic_rggb(bayer)
    want = bilinear_demosaic(bayer)
    # interiors must match exactly; edges differ only in wrap handling
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                               atol=1e-5)


def test_demosaic_constant(lib_available):
    bayer = np.full((32, 32), 0.25, np.float32)
    out = native.demosaic_rggb(bayer)
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_normalize_levels(lib_available):
    img = np.array([-0.5, 0.0, 0.5, 1.0, 2.0], np.float32)
    out = native.normalize_levels(img, black=0.1, white=0.9, clip=True)
    want = (np.clip(img, 0, 1) - 0.1) / 0.8
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_morton_roundtrip_native(lib_available):
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 1024, (1000, 3)).astype(np.int32)
    codes = native.morton3d_encode(coords)
    back = native.morton3d_decode(codes)
    np.testing.assert_array_equal(back, coords)
    # parity with the numpy/jnp implementation
    np.testing.assert_array_equal(_morton3d_invert_np(codes), coords)


def test_packbits_native(lib_available):
    rng = np.random.default_rng(2)
    grid = rng.uniform(0, 20, 4096).astype(np.float32)
    got = native.packbits(grid, 10.0)
    occ = (grid > 10.0).reshape(-1, 8)
    want = (occ.astype(np.uint8)
            * (2 ** np.arange(8)).astype(np.uint8)).sum(-1).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_srgb_native(lib_available):
    x = np.linspace(0, 1, 256).astype(np.float32)
    got = native.linear_to_srgb(x)
    want = linear_to_srgb(x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_numpy_fallback_paths():
    """Fallbacks must work even when forcing the no-library path."""
    import raw_ngp_tpu.native as nat
    old_lib, old_tried = nat._LIB, nat._TRIED
    try:
        nat._LIB, nat._TRIED = None, True   # simulate missing compiler
        bayer = np.full((16, 16), 0.5, np.float32)
        assert nat.demosaic_rggb(bayer).shape == (16, 16, 3)
        assert nat.packbits(np.zeros(64, np.float32), 1.0).shape == (8,)
        coords = np.array([[1, 2, 3]], np.int32)
        np.testing.assert_array_equal(
            nat.morton3d_decode(nat.morton3d_encode(coords)), coords)
    finally:
        nat._LIB, nat._TRIED = old_lib, old_tried
