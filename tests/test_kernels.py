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
