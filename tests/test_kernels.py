"""Kernel golden/property tests: FAST vs cv2, matching under known warps,
remap vs cv2.remap — the "unit kernels vs golden CPU reference" strategy
SURVEY.md §4 prescribes (the reference itself has no kernel tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpslam_tpu.io.synthetic import make_texture, warp_homography
from lpslam_tpu.kernels import (
    build_pyramid,
    extract_orb,
    fast_score,
    hamming_matrix,
    hamming_matrix_mxu,
    match_mutual_nn,
    nms3x3,
    remap_bilinear,
    select_topk_grid,
)
from lpslam_tpu.kernels.orb import OrbParams


@pytest.fixture(scope="module")
def texture():
    return make_texture(240, 320, seed=3)


class TestFast:
    def test_matches_cv2_corners(self, texture):
        import cv2

        thresh = 20
        img8 = texture.astype(np.uint8)
        det = cv2.FastFeatureDetector_create(
            threshold=thresh, nonmaxSuppression=False
        )
        kps = det.detect(img8)
        cv_set = {(int(k.pt[0]), int(k.pt[1])) for k in kps}
        cv_set = {
            (x, y) for (x, y) in cv_set
            if 4 <= x < 320 - 4 and 4 <= y < 240 - 4
        }

        _, is_corner = jax.jit(fast_score, static_argnums=1)(
            jnp.asarray(img8.astype(np.float32)), float(thresh)
        )
        ours = np.argwhere(np.asarray(is_corner))
        our_set = {
            (int(x), int(y)) for (y, x) in ours
            if 4 <= x < 320 - 4 and 4 <= y < 240 - 4
        }
        inter = len(cv_set & our_set)
        union = len(cv_set | our_set)
        assert union > 50  # texture must actually have corners
        assert inter / union > 0.9, (inter, union)

    def test_nms_keeps_local_maxima(self, texture):
        score, _ = fast_score(jnp.asarray(texture), 20.0)
        nms = np.asarray(nms3x3(score))
        ys, xs = np.nonzero(nms)
        s = np.asarray(score)
        for y, x in list(zip(ys, xs))[:200]:
            patch = s[max(y - 1, 0) : y + 2, max(x - 1, 0) : x + 2]
            assert s[y, x] == patch.max()

    def test_topk_shapes_and_border(self, texture):
        score, _ = fast_score(jnp.asarray(texture), 20.0)
        score = nms3x3(score)
        xy, s, valid = select_topk_grid(score, 256, cell=16, border=16)
        assert xy.shape == (256, 2) and valid.dtype == np.bool_
        xyv = np.asarray(xy)[np.asarray(valid)]
        assert len(xyv) > 50
        assert xyv[:, 0].min() >= 16 and xyv[:, 0].max() < 320 - 16
        assert xyv[:, 1].min() >= 16 and xyv[:, 1].max() < 240 - 16


class TestOrb:
    def test_extract_shapes(self, texture):
        params = OrbParams(num_keypoints=512, num_levels=3)
        f = extract_orb(jnp.asarray(texture), params)
        assert f.xy.shape == (512, 2)
        assert f.desc.shape == (512, 8) and f.desc.dtype == np.uint32
        assert int(np.sum(np.asarray(f.valid))) > 200

    def test_rotation_shifts_orientation(self, texture):
        import cv2

        ang_deg = 30.0
        h, w = texture.shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), ang_deg, 1.0)
        rot = cv2.warpAffine(texture, M, (w, h), borderValue=128)
        params = OrbParams(num_keypoints=256, num_levels=1)
        f0 = extract_orb(jnp.asarray(texture), params)
        f1 = extract_orb(jnp.asarray(rot), params)
        # map f0 keypoints through the rotation, find f1 keypoints nearby,
        # compare angle differences to the applied rotation
        xy0 = np.asarray(f0.xy)[np.asarray(f0.valid)]
        an0 = np.asarray(f0.angle)[np.asarray(f0.valid)]
        xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
        an1 = np.asarray(f1.angle)[np.asarray(f1.valid)]
        pts = np.concatenate([xy0, np.ones((len(xy0), 1))], axis=1) @ M.T
        diffs = []
        for p, a in zip(pts, an0):
            d = np.linalg.norm(xy1 - p, axis=1)
            j = d.argmin()
            if d[j] < 1.5:
                # content rotated by +ang CCW (y-down) shifts the intensity
                # centroid angle by -ang
                dd = (an1[j] - a + np.deg2rad(ang_deg) + np.pi) % (2 * np.pi) - np.pi
                diffs.append(dd)
        assert len(diffs) > 30
        frac_ok = np.mean(np.abs(np.asarray(diffs)) < 0.2)
        assert frac_ok > 0.7, frac_ok


class TestPolarBrief:
    """The polar-derotation descriptor (kernels/orb.py): the DFT phase-shift
    path must reproduce the exact integer-shift semantics, patch moments must
    equal the whole-image orientation maps, and descriptor quality must hold
    up against the binned path under warps (covered by TestMatching, which
    runs the default = polar path)."""

    def test_dft_matches_exact_shift(self, texture):
        from lpslam_tpu.kernels.orb import (
            extract_patches, polar_brief_from_patches,
            polar_tap_values_reference,
        )
        from lpslam_tpu.kernels.pyramid import gaussian_blur

        rng = np.random.default_rng(11)
        blurred = gaussian_blur(jnp.asarray(texture), sigma=2.0, radius=3)
        xy = jnp.asarray(
            rng.uniform(16, [320 - 17, 240 - 17], (128, 2)).astype(np.float32)
        )
        ang = jnp.asarray(rng.uniform(-np.pi, np.pi, 128).astype(np.float32))
        p = extract_patches(blurred, xy)
        d_dft = np.asarray(polar_brief_from_patches(p, ang))
        vals = np.asarray(polar_tap_values_reference(p, ang))
        bits_ref = vals[:, :256] < vals[:, 256:]
        bits_dft = np.unpackbits(
            d_dft.view(np.uint8), bitorder="little", axis=1
        ).astype(bool)
        # pairs whose taps are exactly equal (flat patch / same-pixel taps)
        # have an arbitrary bit in both paths — exclude them; every decided
        # pair must agree (DFT reconstruction error ~1e-5 << any real
        # intensity gap)
        decided = np.abs(vals[:, :256] - vals[:, 256:]) > 1e-3
        agree = (bits_ref == bits_dft) | ~decided
        assert decided.mean() > 0.5  # the texture must actually decide pairs
        frac = agree[decided].mean() if decided.any() else 1.0
        assert frac == 1.0, (1.0 - frac, int((~agree & decided).sum()))

    def test_patch_orientation_equals_moment_maps(self, texture):
        from lpslam_tpu.kernels.orb import (
            extract_patches, patch_orientation, orientation_maps,
        )
        from lpslam_tpu.kernels.pyramid import gaussian_blur

        rng = np.random.default_rng(5)
        blurred = gaussian_blur(jnp.asarray(texture), sigma=2.0, radius=3)
        xi = rng.integers(16, 320 - 17, 96)
        yi = rng.integers(16, 240 - 17, 96)
        xy = jnp.asarray(np.stack([xi, yi], 1).astype(np.float32))
        ang_patch = np.asarray(patch_orientation(extract_patches(blurred, xy)))
        m10, m01 = orientation_maps(blurred)
        m10n = np.asarray(m10)[yi, xi]
        m01n = np.asarray(m01)[yi, xi]
        ang_map = np.arctan2(m01n, m10n)
        d = (ang_patch - ang_map + np.pi) % (2 * np.pi) - np.pi
        # identical math up to f32 summation order; angle noise blows up
        # only where the centroid magnitude is ~0 (angle is meaningless)
        strong = np.hypot(m10n, m01n) > 1e3
        assert strong.sum() > 50
        assert np.abs(d[strong]).max() < 1e-3, np.abs(d[strong]).max()

    def test_rotation_invariance_match_rate(self, texture):
        """Polar descriptors must match across a pure in-plane rotation at
        a rate comparable to the binned path (the quantization the polar
        grid adds must not cost matching quality)."""
        import cv2
        from lpslam_tpu.kernels import match_mutual_nn

        h, w = texture.shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), 25.0, 1.0)
        rot = cv2.warpAffine(texture, M, (w, h), borderValue=128)
        rates = {}
        for mode in ("polar", "binned"):
            params = OrbParams(num_keypoints=384, num_levels=1, brief_mode=mode)
            fa = extract_orb(jnp.asarray(texture), params)
            fb = extract_orb(jnp.asarray(rot), params)
            idx, ok = match_mutual_nn(fa.desc, fb.desc, fa.valid, fb.valid)
            okn = np.asarray(ok)
            xya = np.asarray(fa.xy)[okn]
            xyb = np.asarray(fb.xy)[np.asarray(idx)[okn]]
            mapped = np.concatenate([xya, np.ones((len(xya), 1))], 1) @ M.T
            err = np.linalg.norm(mapped - xyb, axis=1)
            rates[mode] = float(np.sum(err < 2.0))
        assert rates["polar"] > 40, rates
        assert rates["polar"] >= 0.8 * rates["binned"], rates

    def test_gather_agrees_with_binned(self, texture):
        """steered_brief_gather samples the same quantized pattern as the
        binned matmul: agreement up to bf16 rounding of near-equal taps
        (kept as the negative-result fallback — see PERF.md)."""
        from lpslam_tpu.kernels.orb import (
            steered_brief_binned, steered_brief_gather,
        )
        from lpslam_tpu.kernels.pyramid import gaussian_blur

        rng = np.random.default_rng(3)
        blurred = gaussian_blur(jnp.asarray(texture), sigma=2.0, radius=3)
        xy = jnp.asarray(
            rng.uniform(16, [320 - 17, 240 - 17], (64, 2)).astype(np.float32)
        )
        ang = jnp.asarray(rng.uniform(-np.pi, np.pi, 64).astype(np.float32))
        d_g = np.asarray(steered_brief_gather(blurred, xy, ang))
        d_b = np.asarray(steered_brief_binned(blurred, xy, ang))
        ham = np.array([
            bin(int.from_bytes(a.tobytes(), "little")
                ^ int.from_bytes(b.tobytes(), "little")).count("1")
            for a, b in zip(d_g, d_b)
        ])
        assert ham.mean() < 2.0, ham.mean()


class TestMatching:
    def test_hamming_vs_numpy(self, rng):
        a = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (96, 8), dtype=np.uint32)
        ours = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = np.zeros((64, 96), np.int32)
        for i in range(64):
            for j in range(96):
                ref[i, j] = bin(int.from_bytes(a[i].tobytes(), "little")
                                ^ int.from_bytes(b[j].tobytes(), "little")).count("1")
        np.testing.assert_array_equal(ours, ref)

    def test_mxu_equals_popcount(self, rng):
        a = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        np.testing.assert_array_equal(
            np.asarray(hamming_matrix_mxu(jnp.asarray(a), jnp.asarray(b))),
            np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b))),
        )

    def test_matching_under_warp(self, texture):
        # similarity warp: rotation + translation; matched pairs must map
        # through the warp (the end-to-end correctness bar for ORB+matcher)
        import cv2

        ang = 12.0
        tx, ty = 9.0, -6.0
        h, w = texture.shape
        M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
        M[:, 2] += (tx, ty)
        warped = cv2.warpAffine(texture, M, (w, h), borderValue=128)

        params = OrbParams(num_keypoints=512, num_levels=3)
        fa = extract_orb(jnp.asarray(texture), params)
        fb = extract_orb(jnp.asarray(warped), params)
        idx, ok = match_mutual_nn(fa.desc, fb.desc, fa.valid, fb.valid)
        okn = np.asarray(ok)
        assert okn.sum() > 60, okn.sum()
        xya = np.asarray(fa.xy)[okn]
        xyb = np.asarray(fb.xy)[np.asarray(idx)[okn]]
        mapped = np.concatenate([xya, np.ones((len(xya), 1))], axis=1) @ M.T
        err = np.linalg.norm(mapped - xyb, axis=1)
        inlier_rate = np.mean(err < 2.0)
        assert inlier_rate > 0.75, inlier_rate


class TestRemap:
    def test_vs_cv2(self, texture):
        import cv2

        h, w = texture.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        mapx = xs * 0.97 + 3.1 + 2.0 * np.sin(ys / 37.0)
        mapy = ys * 0.98 + 1.7 + 1.5 * np.cos(xs / 23.0)
        ref = cv2.remap(texture, mapx, mapy, cv2.INTER_LINEAR)
        ours = np.asarray(
            remap_bilinear(jnp.asarray(texture), jnp.asarray(np.stack([mapx, mapy], -1)))
        )
        inb = (mapx >= 0) & (mapx <= w - 2) & (mapy >= 0) & (mapy <= h - 2)
        np.testing.assert_allclose(ours[inb], ref[inb], atol=0.75)


class TestPyramid:
    def test_shapes(self, texture):
        lv = build_pyramid(jnp.asarray(texture), 3, 1.2)
        assert lv[0].shape == (240, 320)
        assert lv[1].shape == (200, 267)
        assert lv[2].shape == (167, 222)
