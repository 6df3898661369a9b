"""Pallas kernel equivalence tests (interpret mode on CPU; the same code
compiles with Mosaic on TPU)."""
import numpy as np

import jax.numpy as jnp

from lpslam_tpu.io.synthetic import make_texture
from lpslam_tpu.kernels.fast import fast_score, nms3x3
from lpslam_tpu.kernels.pallas_fast import fast_nms_score_pallas


def reference_score(img, thr_hi=20.0, thr_lo=7.0, lo_ceiling=1e-3 / (1.0 + 255.0 * 16.0)):
    s_hi, _ = fast_score(img, thr_hi)
    s_lo, _ = fast_score(img, thr_lo)
    score = jnp.where(s_hi > 0, 1.0 + s_hi, s_lo * lo_ceiling)
    return nms3x3(score)


def test_pallas_fast_matches_xla_banded():
    # 160 rows > TILE + 2*HALO exercises the DMA band path incl. first/last
    # band clamping and the padded remainder (160 = 2*64 + 32)
    img = jnp.asarray(make_texture(160, 128, seed=4))
    ref = np.asarray(reference_score(img))
    ours = np.asarray(fast_nms_score_pallas(img, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    assert (ref > 1.0).sum() > 20  # fixture has high-threshold corners


def test_pallas_fast_small_image_fallback():
    img = jnp.asarray(make_texture(48, 96, seed=5))
    ref = np.asarray(reference_score(img))
    ours = np.asarray(fast_nms_score_pallas(img, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pallas_patches_match_xla():
    """extract_patches_pallas must be bit-identical to the XLA gather path
    (aligned-load + dynamic-roll formulation, incl. border clamping and the
    padded tail block)."""
    from lpslam_tpu.kernels.orb import extract_patches
    from lpslam_tpu.kernels.pallas_patch import extract_patches_pallas

    rng = np.random.default_rng(9)
    img = jnp.asarray(make_texture(240, 320, seed=6))
    # include exact border-clamp cases and non-block-multiple N
    xy = np.concatenate([
        rng.uniform(0, [320, 240], (70, 2)).astype(np.float32),
        np.array([[0, 0], [319, 239], [16, 16], [303, 223]], np.float32),
    ])
    ref = np.asarray(extract_patches(img, jnp.asarray(xy)))
    ours = np.asarray(extract_patches_pallas(img, jnp.asarray(xy), interpret=True))
    np.testing.assert_array_equal(ours, ref)
