"""ORB feature extraction: oriented FAST + rotated BRIEF, TPU-native.

Design notes (vs the reference engine's CPU ORB):
- Orientation is computed with two whole-image moment convolutions
  (m10 = I * x-mask, m01 = I * y-mask over a radius-15 disc) followed by a
  2-value gather per keypoint — instead of per-keypoint patch loops. Convs
  are MXU/VPU work; the gather is tiny.
- rBRIEF uses a fixed 256-pair sampling pattern (deterministic Gaussian
  pattern, max radius 13 so any rotation stays inside the 16-px border) on
  the Gaussian-blurred level image; sampling is one gather of 2*256 taps per
  keypoint; bit packing is a (8,32) reshape + shift-or reduction.
- The keypoint budget is split across pyramid levels geometrically
  (factor 1/scale per level), like the reference engine's per-level
  distribution of max_num_keypoints=1200 (scale 1.2, levels 3 —
  /root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:193-198).

Everything is static-shape: exactly ``num_keypoints`` slots come back, with a
validity mask — the fixed-capacity discipline that keeps XLA recompiles away.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .pyramid import build_pyramid, gaussian_blur
from .fast import fast_score, nms3x3, select_topk_grid

EDGE_MARGIN = 16  # keypoints closer than this to a level border are dropped
PATCH_RADIUS = 15  # orientation disc radius


class OrbParams(NamedTuple):
    num_keypoints: int = 1024
    num_levels: int = 3
    scale_factor: float = 1.2
    fast_threshold: float = 20.0
    fast_min_threshold: float = 7.0
    cell: int = 16  # grid cell for spatially-uniform selection (0 = global)
    use_pallas: bool = False  # fused Pallas FAST+NMS kernel (TPU)
    # True: 12-degree angle-binned BRIEF sampled by MXU matmuls (~10x faster
    # on TPU than the exact-rotation gather; classic-ORB-style quantization)
    binned_brief: bool = True


class OrbFeatures(NamedTuple):
    """Fixed-capacity keypoint set (level-0 pixel coordinates)."""

    xy: jnp.ndarray      # (N, 2) float32, level-0 pixels (x, y)
    level: jnp.ndarray   # (N,) int32
    angle: jnp.ndarray   # (N,) float32 radians
    score: jnp.ndarray   # (N,) float32
    desc: jnp.ndarray    # (N, 8) uint32 — 256-bit rBRIEF
    valid: jnp.ndarray   # (N,) bool


# ---------------------------------------------------------------------------
# BRIEF sampling pattern: deterministic, generated once at import.
# ---------------------------------------------------------------------------


def _make_pattern(n_pairs: int = 256, radius: float = 13.0, seed: int = 7):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, radius / 2.0, size=(n_pairs, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, radius / np.maximum(norm, 1e-9))
    return (pts * scale).astype(np.float32)


BRIEF_PATTERN = jnp.asarray(_make_pattern())  # (256, 2, 2) (pair, point, xy)


# ---------------------------------------------------------------------------
# Orientation via moment convolutions
# ---------------------------------------------------------------------------


def _disc_half_heights(radius: int = PATCH_RADIUS):
    """For each column offset dx of the disc, the max |dy| inside the circle."""
    dxs = np.arange(-radius, radius + 1)
    rys = np.floor(np.sqrt(np.maximum(radius * radius - dxs * dxs, 0))).astype(int)
    return list(zip(dxs.tolist(), rys.tolist()))


_DISC_COLS = _disc_half_heights()


def orientation_maps(img):
    """Whole-image intensity-centroid moments (m10, m01) per pixel.

    Disc decomposition instead of a dense 31x31 convolution (which costs
    minutes of XLA-TPU compile time for a 1-channel kernel): the circular
    patch is a stack of columns; each column sum is a vertical box filter
    (cumsum + two shifts), so
        m10 = sum_dx dx * shift_x(vbox_{ry(dx)}(I), dx)
        m01 = sum_dy dy * shift_y(hbox_{rx(dy)}(I), dy)
    — ~250 cheap elementwise/roll ops, compiles in seconds, runs at VPU speed.
    """
    h, w = img.shape
    # vertical cumulative sums with a zero row prepended: vbox of half-height r
    # at row y = C[y+r+1] - C[y-r]
    Cv = jnp.concatenate([jnp.zeros((1, w), img.dtype), jnp.cumsum(img, axis=0)], 0)
    Ch = jnp.concatenate([jnp.zeros((h, 1), img.dtype), jnp.cumsum(img, axis=1)], 1)

    ys = jnp.arange(h)
    xs = jnp.arange(w)

    def vbox(r):
        top = jnp.clip(ys - r, 0, h)
        bot = jnp.clip(ys + r + 1, 0, h)
        return Cv[bot, :] - Cv[top, :]

    def hbox(r):
        left = jnp.clip(xs - r, 0, w)
        right = jnp.clip(xs + r + 1, 0, w)
        return Ch[:, right] - Ch[:, left]

    m10 = jnp.zeros_like(img)
    m01 = jnp.zeros_like(img)
    # cache box sums per radius (many dx share the same ry)
    vcache = {}
    hcache = {}
    for dx, ry in _DISC_COLS:
        if dx == 0:
            continue
        if ry not in vcache:
            vcache[ry] = vbox(ry)
        m10 = m10 + dx * jnp.roll(vcache[ry], -dx, axis=1)
    for dy, rx in _DISC_COLS:  # circle is symmetric: same table
        if dy == 0:
            continue
        if rx not in hcache:
            hcache[rx] = hbox(rx)
        m01 = m01 + dy * jnp.roll(hcache[rx], -dy, axis=0)
    return m10, m01


# ---------------------------------------------------------------------------
# BRIEF descriptor
# ---------------------------------------------------------------------------

_BIT_WEIGHTS = jnp.asarray((1 << np.arange(32)).astype(np.uint32))

# --- angle-binned sampling (classic ORB 12-degree quantization) ------------
N_ANGLE_BINS = 30
_PB = 16  # patch half-size; pattern radius <= 13, rotation preserves norm
_PATCH = 2 * _PB  # 32


def _binned_sample_matrices():
    """(BINS, 1024, 512) one-hot selection: patch pixels -> 512 sample values
    (first 256 columns = point p of each pair, last 256 = point q)."""
    mats = np.zeros((N_ANGLE_BINS, _PATCH * _PATCH, 512), np.float32)
    pat = np.asarray(BRIEF_PATTERN)  # (256, 2, 2)
    for b in range(N_ANGLE_BINS):
        th = b * 2 * np.pi / N_ANGLE_BINS - np.pi
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        rot = pat @ R.T  # (256, 2, 2) xy
        ix = np.clip(np.round(rot[..., 0]).astype(int), -_PB, _PB - 1) + _PB
        iy = np.clip(np.round(rot[..., 1]).astype(int), -_PB, _PB - 1) + _PB
        flat = iy * _PATCH + ix  # (256, 2)
        for pair in range(256):
            mats[b, flat[pair, 0], pair] = 1.0
            mats[b, flat[pair, 1], 256 + pair] = 1.0
    return jnp.asarray(mats)


_SAMPLE_MATS = _binned_sample_matrices()


def _binned_offset_table():
    """(BINS, 512, 2) int32 (dy, dx) tap offsets — the same quantized
    rotated pattern as `_binned_sample_matrices`, kept as coordinates
    instead of one-hot matrices (first 256 = point p, last 256 = point q)."""
    pat = np.asarray(BRIEF_PATTERN)  # (256, 2, 2)
    offs = np.zeros((N_ANGLE_BINS, 512, 2), np.int32)
    for b in range(N_ANGLE_BINS):
        th = b * 2 * np.pi / N_ANGLE_BINS - np.pi
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        rot = pat @ R.T  # (256, 2, 2) xy
        ix = np.clip(np.round(rot[..., 0]).astype(int), -_PB, _PB - 1)
        iy = np.clip(np.round(rot[..., 1]).astype(int), -_PB, _PB - 1)
        offs[b, :256, 0] = iy[:, 0]
        offs[b, :256, 1] = ix[:, 0]
        offs[b, 256:, 0] = iy[:, 1]
        offs[b, 256:, 1] = ix[:, 1]
    return jnp.asarray(offs)


_OFFSET_TABLE = _binned_offset_table()


def steered_brief_gather(blurred, xy, angle):
    """Angle-binned steered BRIEF via ONE flat 512-tap gather per keypoint.

    Bit-identical pattern to `steered_brief_binned` (same 12-degree
    quantization) but samples the taps directly instead of slicing 32x32
    patches and matmul-selecting: half the gathered elements, no (N, 30,
    512) intermediate. Measured ~3x faster than the patch+matmul path on
    v5e (the patch dynamic-slice gather dominated extract_orb). Keypoints
    respect EDGE_MARGIN=16 >= |offset|, so taps never leave the image."""
    h, w = blurred.shape
    bins = jnp.mod(
        jnp.round((angle + np.pi) * (N_ANGLE_BINS / (2 * np.pi))).astype(jnp.int32),
        N_ANGLE_BINS,
    )
    offs = _OFFSET_TABLE[bins]  # (N, 512, 2)
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), _PB, w - _PB - 1)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), _PB, h - _PB - 1)
    fy = cy[:, None] + offs[..., 0]
    fx = cx[:, None] + offs[..., 1]
    vals = blurred.reshape(-1)[fy * w + fx]  # (N, 512)
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)
    return jnp.sum(bits.reshape(-1, 8, 32) * _BIT_WEIGHTS, axis=-1, dtype=jnp.uint32)


def steered_brief_binned(blurred, xy, angle):
    """Angle-binned steered BRIEF: MXU matmul sampling instead of a random
    gather (the gather costs ~3 ms/frame on TPU; this path is ~10x cheaper).

    Rotation is quantized to 12-degree bins exactly like classic ORB's
    precomputed-pattern trick; descriptors from this path are self-consistent
    (always match against other binned descriptors).
    """
    h, w = blurred.shape
    n = xy.shape[0]
    # 32x32 patch per keypoint (keypoints respect EDGE_MARGIN=16)
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - _PB, 0, w - _PATCH)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - _PB, 0, h - _PATCH)
    patches = jax.vmap(
        lambda y0, x0: jax.lax.dynamic_slice(blurred, (y0, x0), (_PATCH, _PATCH))
    )(cy, cx).reshape(n, _PATCH * _PATCH)

    # all-bins sampling as ONE large matmul (batched small matmuls underuse
    # the MXU), then per-keypoint bin selection
    big = jnp.transpose(_SAMPLE_MATS, (1, 0, 2)).reshape(
        _PATCH * _PATCH, N_ANGLE_BINS * 512
    )
    # bf16 MXU is exact here: `big` is one-hot 0/1, so each product is just
    # the (bf16-rounded) pixel value — descriptor bits compare intensities
    # whose noise floor dwarfs bf16 rounding. The package default is
    # `highest` (geometry safety, see lpslam_tpu/__init__.py); opt out.
    vals_all = jnp.dot(
        patches, big, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).reshape(n, N_ANGLE_BINS, 512)
    bins = jnp.mod(
        jnp.round((angle + np.pi) * (N_ANGLE_BINS / (2 * np.pi))).astype(jnp.int32),
        N_ANGLE_BINS,
    )
    vals = jnp.take_along_axis(vals_all, bins[:, None, None], axis=1)[:, 0]
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)
    return jnp.sum(bits.reshape(-1, 8, 32) * _BIT_WEIGHTS, axis=-1, dtype=jnp.uint32)


def steered_brief(blurred, xy, angle):
    """Compute 256-bit steered BRIEF for keypoints on one level image.

    blurred: (H, W) float32 (Gaussian-smoothed level image)
    xy: (N, 2) float32 level-local pixel coords; angle: (N,) radians.
    Returns (N, 8) uint32.
    """
    h, w = blurred.shape
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    R = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )  # (N, 2, 2)
    # rotated sample positions: (N, 256, 2, 2)
    rotated = jnp.einsum("nij,pqj->npqi", R, BRIEF_PATTERN)
    pos = xy[:, None, None, :] + rotated
    px = jnp.clip(jnp.round(pos[..., 0]).astype(jnp.int32), 0, w - 1)
    py = jnp.clip(jnp.round(pos[..., 1]).astype(jnp.int32), 0, h - 1)
    flat = blurred.reshape(-1)
    vals = flat[py * w + px]  # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    packed = jnp.sum(bits.reshape(-1, 8, 32) * _BIT_WEIGHTS, axis=-1, dtype=jnp.uint32)
    return packed


# ---------------------------------------------------------------------------
# Full extraction
# ---------------------------------------------------------------------------


def _level_budgets(n: int, num_levels: int, scale: float):
    wts = np.array([1.0 / scale**l for l in range(num_levels)])
    wts = wts / wts.sum()
    ks = [int(round(n * w)) for w in wts]
    ks[0] += n - sum(ks)
    return ks


@functools.partial(jax.jit, static_argnames=("params",))
def extract_orb(img, params: OrbParams = OrbParams()) -> OrbFeatures:
    """(H, W) float32 [0,255] image -> OrbFeatures with N = params.num_keypoints.

    Two-pass thresholding like the reference (init threshold, then min
    threshold — OpenVSLAMTrackerBase.cpp:197-198): scores are taken at the
    high threshold and, where a grid cell yields nothing, low-threshold
    corners still compete in the global top-k because both score maps are
    blended (low-threshold scores are scaled down so high-threshold corners
    always win when present).
    """
    levels = build_pyramid(img, params.num_levels, params.scale_factor)
    budgets = _level_budgets(params.num_keypoints, params.num_levels, params.scale_factor)

    feats = []
    for lvl, (level_img, k_lvl) in enumerate(zip(levels, budgets)):
        if k_lvl <= 0:
            continue
        if params.use_pallas:
            from .pallas_fast import fast_nms_score_pallas

            score = fast_nms_score_pallas(
                level_img, params.fast_threshold, params.fast_min_threshold
            )
        else:
            score_hi, _ = fast_score(level_img, params.fast_threshold)
            score_lo, _ = fast_score(level_img, params.fast_min_threshold)
            # blend: high-threshold corners dominate, low-threshold fill in
            lo_ceiling = 1e-3 / (1.0 + jnp.max(score_lo))
            score = jnp.where(score_hi > 0, 1.0 + score_hi, score_lo * lo_ceiling)
            score = nms3x3(score)
        xy, sc, valid = select_topk_grid(
            score, k_lvl, cell=params.cell, border=EDGE_MARGIN
        )

        blurred = gaussian_blur(level_img, sigma=2.0, radius=3)
        m10_map, m01_map = orientation_maps(blurred)
        h, w = level_img.shape
        xi = xy[:, 0].astype(jnp.int32)
        yi = xy[:, 1].astype(jnp.int32)
        m10 = m10_map.reshape(-1)[yi * w + xi]
        m01 = m01_map.reshape(-1)[yi * w + xi]
        angle = jnp.arctan2(m01, m10)

        if params.binned_brief:
            desc = steered_brief_binned(blurred, xy, angle)
        else:
            desc = steered_brief(blurred, xy, angle)

        scale_l = jnp.float32(params.scale_factor**lvl)
        feats.append(
            OrbFeatures(
                xy=xy * scale_l,
                level=jnp.full((k_lvl,), lvl, jnp.int32),
                angle=angle,
                score=sc,
                desc=desc,
                valid=valid,
            )
        )

    return OrbFeatures(
        xy=jnp.concatenate([f.xy for f in feats]),
        level=jnp.concatenate([f.level for f in feats]),
        angle=jnp.concatenate([f.angle for f in feats]),
        score=jnp.concatenate([f.score for f in feats]),
        desc=jnp.concatenate([f.desc for f in feats]),
        valid=jnp.concatenate([f.valid for f in feats]),
    )
