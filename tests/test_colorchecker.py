"""Color-checker WB solve (reference img/image_utils.py:263-363)."""

import numpy as np

from raw_ngp_tpu.postprocess import (
    CLASSIC_24,
    determine_wb,
    extract_patch_means,
    solve_color_matrix,
)


def make_chart(mat_inv, first=(60, 50, 140, 130), spacing=150,
               shape=(660, 950, 3), noise=0.0, seed=0):
    """Synthetic chart: patches = reference colors pushed through the
    INVERSE of a known color matrix (so the solve must recover mat)."""
    rng = np.random.default_rng(seed)
    img = np.zeros(shape, np.float32)
    k = 0
    for r in range(4):
        for c in range(6):
            x0 = first[0] + r * spacing
            y0 = first[1] + c * spacing
            col = CLASSIC_24[k] @ mat_inv.T
            img[x0:x0 + 80, y0:y0 + 80] = col
            k += 1
    if noise:
        img += rng.normal(0, noise, img.shape).astype(np.float32)
    return img


def test_recovers_known_color_matrix():
    mat = np.array([[1.8, -0.3, -0.1],
                    [-0.2, 1.5, -0.3],
                    [0.05, -0.4, 1.9]])
    img = make_chart(np.linalg.inv(mat))
    got = determine_wb(img)
    np.testing.assert_allclose(got, mat, atol=1e-3)


def test_noise_robust_and_patch_means():
    mat = np.eye(3) * 2.0
    img = make_chart(np.linalg.inv(mat), noise=5e-3)
    means = extract_patch_means(img)
    assert means.shape == (24, 3)
    got = solve_color_matrix(means)
    np.testing.assert_allclose(got, mat, atol=0.05)


def test_crop_rotation_and_levels():
    mat = np.array([[1.2, 0.1, 0.0],
                    [0.0, 1.1, 0.1],
                    [0.1, 0.0, 1.3]])
    base = make_chart(np.linalg.inv(mat))
    # embed in a larger frame with black/white levels and rotate the
    # chart -90 like the reference capture
    framed = np.rot90(base, k=-1)   # chart captured rotated clockwise
    levels = framed * 3000.0 + 256.0
    canvas = np.zeros((1400, 1400, 3), np.float32)
    canvas[100:100 + levels.shape[0], 200:200 + levels.shape[1]] = levels
    got = determine_wb(
        canvas, black_level=256.0, white_level=3256.0,
        crop=(200, 100, 200 + levels.shape[1], 100 + levels.shape[0]),
        rot90=-1)
    np.testing.assert_allclose(got, mat, atol=2e-3)
