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
    # Descriptor path (all share the same 256-pair pattern):
    #   "polar"  — polar-grid resampled patch, 12-degree derotation applied
    #              as an exact integer shift on the angle axis via a tiny
    #              real-DFT phase rotation; ~10x fewer matmul FLOPs than
    #              "binned" (no all-bins intermediate). Orientation comes
    #              from per-patch disc moments (two 1024x1 matmuls) instead
    #              of whole-image moment maps. Default.
    #   "binned" — classic one-hot matmul over ALL 30 angle bins + per-
    #              keypoint bin selection (round 1-3 default).
    #   "gather" — same binned pattern via a flat 512-tap image gather;
    #              measured SLOWER than "binned" on v5e (see PERF.md) —
    #              kept as the honest negative result + fallback.
    #   "exact"  — continuous rotation, per-keypoint gather (reference
    #              semantics, slowest).
    brief_mode: str = "polar"
    # Patch extraction for the polar path: "auto" uses the Pallas kernel
    # (kernels/pallas_patch.py: VMEM-resident image + aligned loads +
    # dynamic rolls, ~5x the XLA gather) when tracing for a TPU backend and
    # the XLA gather elsewhere; "on"/"off" force it.
    pallas_patches: str = "auto"


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

    Same tap pattern as `steered_brief_binned` (same 12-degree quantization;
    outputs agree up to bf16 rounding of near-equal taps) but samples taps
    directly instead of slicing 32x32 patches and matmul-selecting.

    MEASURED SLOWER than the binned matmul on v5e (3.8 vs 1.2 ms/frame at
    700 kp batched x16 — flat image gathers don't vectorize on TPU; the
    one-hot MXU matmul wins despite 30x the FLOPs; see PERF.md). Kept as an
    honest negative result and low-memory fallback. Keypoints respect
    EDGE_MARGIN=16 >= |offset|, so taps never leave the image."""
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


# --- polar derotation BRIEF -------------------------------------------------
#
# The binned path pays for rotation by computing the sample matmul for ALL 30
# bins and discarding 29 (a (N, 30, 512) intermediate, ~22 GFLOP/frame at the
# 1200-keypoint operating point). The polar path makes rotation itself free:
#
#   1. resample the 32x32 patch onto a fixed polar grid (R rings x T angles,
#      T a multiple of the 30 bins) — ONE bin-independent one-hot matmul;
#   2. a rotation by bin b is then an EXACT integer shift of 2b positions
#      along the angle axis (no resampling error beyond step 1's grid
#      quantization), applied per keypoint as a phase rotation of the ring
#      rows' real-DFT coefficients (elementwise VPU work);
#   3. the 512 pattern taps live at fixed (ring, angle) grid positions, so
#      tap evaluation + inverse DFT fuse into one fixed matmul.
#
# Quantization: the unrotated pattern is snapped once to (integer ring,
# T-grid angle, integer pixel) — comparable to the binned path's
# (integer pixel after rotation, 12-degree bin) snapping; descriptors are
# self-consistent within a map/vocabulary like the binned ones.

_T_POLAR = 60          # angle grid; 60/30 bins -> shift step 2 per bin
_R_POLAR = 14          # integer rings 0..13 (pattern radius <= 13)
_K_FREQ = _T_POLAR // 2 + 1  # real-DFT frequencies


def _polar_tables():
    pat = np.asarray(_make_pattern())                       # (256, 2, 2)
    pts = np.concatenate([pat[:, 0, :], pat[:, 1, :]], 0)   # (512, 2) xy
    r = np.linalg.norm(pts, axis=1)
    th = np.arctan2(pts[:, 1], pts[:, 0])
    ring = np.clip(np.round(r).astype(int), 0, _R_POLAR - 1)        # (512,)
    jq = np.round((th + np.pi) / (2 * np.pi / _T_POLAR)).astype(int) % _T_POLAR

    # patch pixel -> polar grid sample (one-hot): (1024, R*T)
    sel = np.zeros((_PATCH * _PATCH, _R_POLAR * _T_POLAR), np.float32)
    for i in range(_R_POLAR):
        for j in range(_T_POLAR):
            thj = j * 2 * np.pi / _T_POLAR - np.pi
            px = int(np.clip(np.round(i * np.cos(thj)), -_PB, _PB - 1))
            py = int(np.clip(np.round(i * np.sin(thj)), -_PB, _PB - 1))
            sel[(py + _PB) * _PATCH + (px + _PB), i * _T_POLAR + j] = 1.0

    # forward real DFT along the angle axis: a_k = f@C (= Re F), b_k = f@S
    # (= -Im F); shifting f by s rotates (a_k, b_k) by phi = 2*pi*k*s/T
    jj = np.arange(_T_POLAR)[:, None]
    kk = np.arange(_K_FREQ)[None, :]
    C = np.cos(2 * np.pi * jj * kk / _T_POLAR).astype(np.float32)   # (T, K)
    S = np.sin(2 * np.pi * jj * kk / _T_POLAR).astype(np.float32)

    # tap evaluation (inverse DFT at the taps' fixed grid angles), fused with
    # the per-ring selection: vals = [a'|b'] @ ITAP with
    #   ITAP_a[(r,k), q] = [r == ring_q] * (w_k/T) * cos(2*pi*k*jq_q/T)
    #   ITAP_b[(r,k), q] = [r == ring_q] * (w_k/T) * sin(2*pi*k*jq_q/T)
    w = np.full(_K_FREQ, 2.0)
    w[0] = 1.0
    w[-1] = 1.0  # Nyquist (T even)
    itap = np.zeros((2 * _R_POLAR * _K_FREQ, 512), np.float32)
    for q in range(512):
        kq = np.arange(_K_FREQ)
        base = ring[q] * _K_FREQ
        ang = 2 * np.pi * kq * jq[q] / _T_POLAR
        itap[base + kq, q] = (w / _T_POLAR) * np.cos(ang)
        itap[_R_POLAR * _K_FREQ + base + kq, q] = (w / _T_POLAR) * np.sin(ang)

    # exact-shift reference tables (for tests): flat polar index per (bin, q)
    shift = (2 * np.arange(N_ANGLE_BINS) - N_ANGLE_BINS)            # (30,)
    jrot = (jq[None, :] + shift[:, None]) % _T_POLAR                # (30, 512)
    flat_ref = ring[None, :] * _T_POLAR + jrot                      # (30, 512)
    return (
        jnp.asarray(sel),
        jnp.asarray(C),
        jnp.asarray(S),
        jnp.asarray(itap),
        jnp.asarray(flat_ref.astype(np.int32)),
    )


_POLAR_SEL, _DFT_C, _DFT_S, _ITAP, _POLAR_REF_IDX = _polar_tables()

# disc-moment weights for per-patch orientation: same radius-15 disc as
# orientation_maps, evaluated from the 32x32 patch (two 1024-dim dot
# products per keypoint instead of whole-image moment maps)
_dxg, _dyg = np.meshgrid(np.arange(-_PB, _PB), np.arange(-_PB, _PB))
_disc = (_dxg**2 + _dyg**2) <= PATCH_RADIUS**2
_MOM_W = jnp.asarray(
    np.stack([(_dxg * _disc).reshape(-1), (_dyg * _disc).reshape(-1)], 1)
    .astype(np.float32)
)


def extract_patches(blurred, xy):
    """(N, 1024) 32x32 patches around rounded keypoint centers. Keypoints
    respect EDGE_MARGIN=16 so the window never clips for valid keypoints."""
    h, w = blurred.shape
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - _PB, 0, w - _PATCH)
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - _PB, 0, h - _PATCH)
    return jax.vmap(
        lambda y0, x0: jax.lax.dynamic_slice(blurred, (y0, x0), (_PATCH, _PATCH))
    )(cy, cx).reshape(-1, _PATCH * _PATCH)


def patch_orientation(patches):
    """Intensity-centroid angle from per-keypoint patches: identical to the
    orientation_maps value at interior keypoints (same radius-15 disc), at
    ~zero cost (a (N,1024)x(1024,2) matmul)."""
    m = jnp.dot(patches, _MOM_W, precision=jax.lax.Precision.HIGHEST)
    return jnp.arctan2(m[:, 1], m[:, 0])


def _bin_of(angle):
    return jnp.mod(
        jnp.round((angle + np.pi) * (N_ANGLE_BINS / (2 * np.pi))).astype(jnp.int32),
        N_ANGLE_BINS,
    )


def polar_coeffs(patches):
    """Ring-wise real-DFT coefficients (a, b) of the polar-resampled patch.

    patches: (N, 1024). Returns a, b: (N, R, K). The POLAR_SEL matmul is a
    one-hot selection — exact under bf16 up to pixel-value rounding (MXU
    DEFAULT precision); the small DFT matmuls run at HIGHEST so coefficient
    magnitudes (DC ~ T*mean) don't lose tap-level precision.
    """
    n = patches.shape[0]
    pol = jnp.dot(
        patches, _POLAR_SEL, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).reshape(n, _R_POLAR, _T_POLAR)
    a = jnp.dot(pol, _DFT_C, precision=jax.lax.Precision.HIGHEST)
    b = jnp.dot(pol, _DFT_S, precision=jax.lax.Precision.HIGHEST)
    return a, b


def polar_brief_from_patches(patches, angle):
    """256-bit steered BRIEF via polar derotation (see module comment)."""
    n = patches.shape[0]
    a, b = polar_coeffs(patches)
    s = (2 * _bin_of(angle) - N_ANGLE_BINS).astype(jnp.float32)     # (N,)
    phi = (2 * np.pi / _T_POLAR) * s[:, None] * jnp.arange(_K_FREQ)  # (N, K)
    cphi = jnp.cos(phi)[:, None, :]
    sphi = jnp.sin(phi)[:, None, :]
    a2 = a * cphi + b * sphi
    b2 = b * cphi - a * sphi
    coef = jnp.concatenate([a2.reshape(n, -1), b2.reshape(n, -1)], 1)
    vals = jnp.dot(coef, _ITAP, precision=jax.lax.Precision.HIGHEST)
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)
    return jnp.sum(bits.reshape(-1, 8, 32) * _BIT_WEIGHTS, axis=-1, dtype=jnp.uint32)


def steered_brief_polar(blurred, xy, angle):
    """Polar-derotation BRIEF from the image (convenience wrapper)."""
    return polar_brief_from_patches(extract_patches(blurred, xy), angle)


def polar_tap_values_reference(patches, angle):
    """Exact-shift tap values for the polar descriptor (gather formulation,
    slow on TPU — tests only): (N, 512) sampled values, taps [0:256] = point
    p, [256:512] = point q of each pair, bit-for-bit the polar path's
    semantics without the DFT round trip."""
    n = patches.shape[0]
    pol = jnp.dot(
        patches, _POLAR_SEL, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(n, _R_POLAR * _T_POLAR)
    idx = _POLAR_REF_IDX[_bin_of(angle)]                            # (N, 512)
    return jnp.take_along_axis(pol, idx, axis=1)


def polar_brief_reference(patches, angle):
    """Exact-shift reference descriptor (tests only). NOTE: pairs whose two
    taps are exactly equal (flat patches, or both taps quantized to the same
    pixel) produce an arbitrary bit; the DFT path resolves such ties by
    ~1e-5 reconstruction noise instead — compare with a tie mask."""
    vals = polar_tap_values_reference(patches, angle)
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
        if params.brief_mode == "polar":
            # patch-based path: one patch extraction feeds both the disc-
            # moment orientation and the polar descriptor — no whole-image
            # moment maps, no all-bins sampling
            use_pallas_patches = params.pallas_patches == "on" or (
                params.pallas_patches == "auto"
                and jax.default_backend() == "tpu"
            )
            if use_pallas_patches:
                from .pallas_patch import extract_patches_pallas

                patches = extract_patches_pallas(blurred, xy)
            else:
                patches = extract_patches(blurred, xy)
            angle = patch_orientation(patches)
            desc = polar_brief_from_patches(patches, angle)
        else:
            m10_map, m01_map = orientation_maps(blurred)
            h, w = level_img.shape
            xi = xy[:, 0].astype(jnp.int32)
            yi = xy[:, 1].astype(jnp.int32)
            m10 = m10_map.reshape(-1)[yi * w + xi]
            m01 = m01_map.reshape(-1)[yi * w + xi]
            angle = jnp.arctan2(m01, m10)
            if params.brief_mode == "binned":
                desc = steered_brief_binned(blurred, xy, angle)
            elif params.brief_mode == "gather":
                desc = steered_brief_gather(blurred, xy, angle)
            elif params.brief_mode == "exact":
                desc = steered_brief(blurred, xy, angle)
            else:
                raise ValueError(f"unknown brief_mode {params.brief_mode!r}")

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
