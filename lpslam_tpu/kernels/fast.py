"""FAST-9/16 corner detection, 3x3 NMS and spatially-uniform top-K selection.

TPU-native formulation: instead of the reference engine's per-pixel pointer
chasing (OpenCV/OpenVSLAM FAST on CPU), the 16 Bresenham-circle taps become 16
shifted copies of the whole image; the "9 contiguous of 16" test becomes
bit-parallel mask arithmetic; NMS is 8 shifted max-compares. Everything is
fully-vectorized VPU work that XLA fuses into a few passes over VMEM tiles.

Reference behavior anchors: FAST thresholds 20 (init) / 7 (min) and per-level
extraction (/root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:194-198).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 16 (dx, dy) offsets on the radius-3 Bresenham circle, in circular order.
CIRCLE16 = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def _shift(img, dx: int, dy: int):
    """shifted[y, x] = img[y + dy, x + dx] (border values are garbage; the
    caller masks a 3-px margin)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_score(img, threshold: float):
    """FAST-9/16 corner response for every pixel of a (H, W) float32 image.

    Returns (score, is_corner): score is the sum of |tap - center| over taps
    beyond the threshold (0 where not a corner); is_corner is the 9-contiguous
    arc test. A 3-px border is zeroed.
    """
    c = img
    taps = [_shift(img, dx, dy) for dx, dy in CIRCLE16]
    t = jnp.float32(threshold)

    bright_bits = jnp.zeros(img.shape, jnp.uint32)
    dark_bits = jnp.zeros(img.shape, jnp.uint32)
    bright_sum = jnp.zeros_like(img)
    dark_sum = jnp.zeros_like(img)
    for i, tap in enumerate(taps):
        d = tap - c
        is_b = d > t
        is_d = d < -t
        bright_bits = bright_bits | (is_b.astype(jnp.uint32) << i)
        dark_bits = dark_bits | (is_d.astype(jnp.uint32) << i)
        bright_sum = bright_sum + jnp.where(is_b, d - t, 0.0)
        dark_sum = dark_sum + jnp.where(is_d, -d - t, 0.0)

    def has_run9(m16):
        m = m16 | (m16 << 16)  # unroll the circle
        r = m & (m >> 1)       # runs >= 2
        r = r & (r >> 2)       # runs >= 4
        r = r & (r >> 4)       # runs >= 8
        r = r & (m >> 8)       # runs >= 9
        return (r & jnp.uint32(0xFFFF)) != 0

    is_corner = has_run9(bright_bits) | has_run9(dark_bits)
    score = jnp.where(is_corner, jnp.maximum(bright_sum, dark_sum), 0.0)

    # zero the 3-px border (shift wrap garbage)
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, score, 0.0), is_corner & interior


def nms3x3(score):
    """Suppress pixels with a strictly greater 3x3 neighbor. Deterministic
    (pure function of the score map); on an exact score plateau ALL plateau
    maxima survive — measured to track better than unique-survivor
    tie-breaking because window-constrained matching can then pick the
    plateau pixel that is geometrically consistent across views (plateaus
    sample at different subpixel phases in each image, so forcing a single
    survivor injects ±1 px correspondence error). Final keypoint order is
    resolved deterministically by select_topk_grid."""
    m = score
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = _shift(score, dx, dy)  # n[y,x] = score[y+dy, x+dx]
            m = jnp.where(n > score, 0.0, m)
    return m


@functools.partial(jax.jit, static_argnames=("k", "cell", "border"))
def select_topk_grid(score, k: int, cell: int = 0, border: int = 16):
    """Select top-k scoring pixels, optionally with per-cell pre-selection for
    spatial uniformity (the TPU-shaped stand-in for OpenVSLAM's quadtree
    keypoint distribution — fixed shapes, no recursion).

    Returns (xy (k,2) float32, scores (k,), valid (k,) bool).
    cell=0: plain global top-k. cell>0: image is tiled into cell x cell
    buckets, each bucket contributes at most m = ceil(2k / n_cells)
    candidates, then a global top-k runs over candidates.
    """
    h, w = score.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)
    score = jnp.where(ok, score, 0.0)

    if cell and cell > 0:
        ch = cell
        nby, nbx = h // ch, w // ch
        m = max(1, min((2 * k) // max(nby * nbx, 1) + 1, ch * ch))
        trimmed = score[: nby * ch, : nbx * ch]
        cells = trimmed.reshape(nby, ch, nbx, ch).transpose(0, 2, 1, 3).reshape(
            nby * nbx, ch * ch
        )
        cs, ci = jax.lax.top_k(cells, m)  # (n_cells, m)
        cyi = ci // ch
        cxi = ci % ch
        by = jax.lax.broadcasted_iota(jnp.int32, (nby * nbx, m), 0) // nbx
        bx = jax.lax.broadcasted_iota(jnp.int32, (nby * nbx, m), 0) % nbx
        cand_y = (by * ch + cyi).reshape(-1)
        cand_x = (bx * ch + cxi).reshape(-1)
        cand_s = cs.reshape(-1)
        top_s, top_i = jax.lax.top_k(cand_s, min(k, cand_s.shape[0]))
        sel_y = cand_y[top_i]
        sel_x = cand_x[top_i]
    else:
        flat = score.reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, k)
        sel_y = top_i // w
        sel_x = top_i % w

    if top_s.shape[0] < k:  # pad (cell path may produce fewer candidates)
        pad = k - top_s.shape[0]
        top_s = jnp.pad(top_s, (0, pad))
        sel_y = jnp.pad(sel_y, (0, pad))
        sel_x = jnp.pad(sel_x, (0, pad))

    valid = top_s > 0.0
    xy = jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.float32)
    return xy, top_s, valid
