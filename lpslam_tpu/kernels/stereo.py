"""Rectified stereo keypoint matching (disparity / depth recovery).

The reference engine row-matches ORB keypoints between rectified eyes with a
y-margin of 2.0 px and a depth cutoff (config keys ``y_matching_margin`` and
``depth_threshold`` — /root/reference/src/Trackers/OpenVSLAMTrackerBase.cpp:200-201).
TPU-native version: a dense masked Hamming matrix between left/right keypoint
sets with the row/disparity constraints as masks — one MXU matmul + elementwise
masking instead of per-row bucket loops.
"""
from __future__ import annotations

import jax.numpy as jnp

from .match import hamming_matrix_mxu, BIG


def match_stereo(
    desc_l,
    uv_l,
    valid_l,
    desc_r,
    uv_r,
    valid_r,
    y_margin: float = 2.0,
    min_disparity: float = 0.5,
    max_disparity: float = 256.0,
    max_hamming: int = 60,
):
    """For each left keypoint find its right partner on the same rectified row.

    Returns (disparity (Nl,), idx_r (Nl,), ok (Nl,)). disparity = u_l - u_r.
    """
    D = hamming_matrix_mxu(desc_l, desc_r).astype(jnp.float32)
    dy = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    feas = (
        (dy <= y_margin)
        & (disp >= min_disparity)
        & (disp <= max_disparity)
        & valid_l[:, None]
        & valid_r[None, :]
    )
    D = jnp.where(feas, D, BIG)
    idx = jnp.argmin(D, axis=1)
    rows = jnp.arange(desc_l.shape[0])
    best = D[rows, idx]
    # mutual-best (left-right) consistency on the SAME distance matrix: a
    # right keypoint claimed by a left keypoint must claim it back. Kills
    # one-sided false matches that pass the row/disparity/Hamming gates and
    # would otherwise seed wrong metric depth (measured r5: stereo room ATE
    # 0.0946 -> see PERF.md stereo section) — the reference engine's stereo
    # matcher enforces the same best-in-both-directions property.
    idx_back = jnp.argmin(D, axis=0)  # (Nr,) best left row per right kp
    mutual = idx_back[idx] == rows
    ok = (best <= max_hamming) & valid_l & mutual
    disparity = uv_l[:, 0] - uv_r[idx, 0]
    return disparity, idx.astype(jnp.int32), ok


def depth_from_disparity(disparity, focal_x_baseline: float):
    """z = fx*b / d. Callers mask with the `ok` flag from match_stereo."""
    return focal_x_baseline / jnp.maximum(disparity, 1e-6)


def refine_disparity_subpixel(
    img_l,
    img_r,
    uv_l,
    uv_r,
    ok,
    half_win: int = 4,
    search: int = 2,
):
    """Sub-pixel disparity refinement by SAD parabola fit.

    Keypoints are detected on integer pixels, so raw descriptor-matched
    disparity carries +-1 px error — at small disparities that is tens of
    percent of depth. Like the reference engine's stereo matcher, we slide a
    small left-image patch across the right image around the matched column
    and fit a parabola through the SAD minimum.

    img_l/img_r: (H, W) float32. uv_l/uv_r: (N,2) matched coords.
    Returns refined disparity (N,).

    Fully vectorized: one gather of N x (2*search+1+2) x patch elements.
    """
    h, w = img_l.shape
    win = 2 * half_win + 1
    dy, dx = jnp.mgrid[-half_win : half_win + 1, -half_win : half_win + 1]
    dy = dy.reshape(-1)
    dx = dx.reshape(-1)

    def patch(img, cx, cy, off_x):
        px = jnp.clip(cx[:, None] + dx[None, :] + off_x, 0, w - 1)
        py = jnp.clip(cy[:, None] + dy[None, :], 0, h - 1)
        return img.reshape(-1)[py * w + px]  # (N, win*win)

    xl = jnp.round(uv_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(uv_l[:, 1]).astype(jnp.int32)
    xr = jnp.round(uv_r[:, 0]).astype(jnp.int32)
    yr = jnp.round(uv_r[:, 1]).astype(jnp.int32)

    ref = patch(img_l, xl, yl, 0)
    sads = []
    offsets = list(range(-search, search + 1))
    for e in offsets:
        cand = patch(img_r, xr, yr, e)
        sads.append(jnp.sum(jnp.abs(cand - ref), axis=-1))
    sads = jnp.stack(sads, axis=-1)  # (N, 2*search+1)

    best = jnp.argmin(sads, axis=-1)
    best_in = jnp.clip(best, 1, len(offsets) - 2)  # keep parabola neighbors valid
    rows = jnp.arange(uv_l.shape[0])
    s0 = sads[rows, best_in - 1]
    s1 = sads[rows, best_in]
    s2 = sads[rows, best_in + 1]
    denom = s0 - 2.0 * s1 + s2
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (s0 - s2) / jnp.maximum(denom, 1e-6), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    e_best = (best_in - search).astype(jnp.float32) + delta

    # the true right column is xr + e_best (sub-pixel)
    disp0 = uv_l[:, 0] - uv_r[:, 0]
    refined = uv_l[:, 0] - (xr.astype(jnp.float32) + e_best)
    # keep the raw value where refinement was untrustworthy (flat SAD)
    flat = jnp.abs(denom) <= 1e-6
    return jnp.where(ok & ~flat, refined, disp0)
