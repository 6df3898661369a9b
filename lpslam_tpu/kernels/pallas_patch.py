"""Pallas TPU kernel: batched 32x32 patch extraction around keypoints.

The XLA formulation (vmapped `lax.dynamic_slice`) lowers to a generic gather
that costs ~1.5 ms/frame at the 1200-keypoint operating point — by far the
dominant term of the polar-BRIEF descriptor path (the DFT/matmul chain after
it is ~0.2 ms). Here the level image stays resident in VMEM (<=1.5 MB padded
at 480x640 f32) and a grid over keypoint blocks copies each (32, 32) window
out with ALIGNED loads + dynamic-shift rolls:

  - Mosaic only allows statically-aligned slice starts (sublane multiples of
    8, lane multiples of 128), so each keypoint loads an aligned 40-row,
    two-128-lane-block window and rotates the residual (y0 % 8, x0 % 128)
    away with `pltpu.roll` (VPU shifts — no gather, no HBM round trips).
  - The image is pre-padded (rows to 8k+8, cols to 128k+128) so the aligned
    window never leaves the buffer; padding is one cheap batched XLA pad.

Keypoint coordinates arrive via scalar prefetch (SMEM) so slice starts are
available before the body runs. Out-of-range tail slots (grid padding)
re-read keypoint n-1; callers mask invalid keypoints via OrbFeatures.valid.

Reference role: ORB patch sampling around FAST corners (the reference's
OpenVSLAM-fork orb_extractor / compute_orb_descriptor loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PB = 16
_PATCH = 32
_ROWS = _PATCH + 8    # aligned row window
_LANES = 256          # two aligned 128-lane blocks


def _patch_kernel(cy_ref, cx_ref, img_ref, out_ref, *, g: int, n: int):
    pid = pl.program_id(0)

    def body(j, carry):
        i = jnp.minimum(pid * g + j, n - 1)
        y0 = cy_ref[i]
        x0 = cx_ref[i]
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        win = jnp.concatenate(
            [
                img_ref[pl.ds(ya, _ROWS), pl.ds(xa, 128)],
                img_ref[pl.ds(ya, _ROWS), pl.ds(xa + 128, 128)],
            ],
            axis=1,
        )  # (40, 256)
        win = pltpu.roll(win, _ROWS - (y0 - ya), axis=0)
        win = pltpu.roll(win, _LANES - (x0 - xa), axis=1)
        out_ref[pl.ds(j, 1)] = win[:_PATCH, :_PATCH][None]
        return carry

    jax.lax.fori_loop(0, g, body, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def extract_patches_pallas(blurred, xy, block: int = 128, interpret: bool = False):
    """(N, 1024) patches around rounded keypoint centers (pallas TPU path).

    Semantics identical to `orb.extract_patches`: centers are rounded and
    clamped so the 32x32 window never leaves the (unpadded) image.
    """
    h, w = blurred.shape
    n = xy.shape[0]
    cy = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - _PB, 0, h - _PATCH)
    cx = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - _PB, 0, w - _PATCH)
    hp = -(-h // 8) * 8 + 8
    wp = -(-w // 128) * 128 + 128
    img = jnp.pad(blurred, ((0, hp - h), (0, wp - w)))
    grid = pl.cdiv(n, block)
    out = pl.pallas_call(
        functools.partial(_patch_kernel, g=block, n=n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (block, _PATCH, _PATCH), lambda pid, cy, cx: (pid, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((grid * block, _PATCH, _PATCH), blurred.dtype),
        interpret=interpret,
    )(cy, cx, img)
    return out[:n].reshape(n, _PATCH * _PATCH)
