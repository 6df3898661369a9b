"""Pallas TPU kernel: fused FAST-9/16 two-threshold score + 3x3 NMS.

The XLA formulation in fast.py is ~100 elementwise HLOs whose intermediates
round-trip through HBM; this kernel computes the whole score map in one
VMEM-resident pass per row band:

    grid over row bands -> DMA band+halo from HBM into VMEM scratch ->
    16 taps via pltpu.roll -> bright/dark bitmasks -> run-of-9 test ->
    two-threshold blended score -> 3x3 NMS -> write band

Band tiling keeps live VMEM ~2 MB (a whole 480p frame plus temporaries blows
the 16 MB scoped-vmem limit). The 8-row halo covers FAST's +-3 taps plus
NMS's +-1 (8 keeps dynamic sublane offsets aligned); row-wrap artifacts from `roll` land only on globally
border-masked rows, so outputs equal the XLA version bit-for-bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE16

HALO = 8  # >= 4 needed by FAST+NMS; 8 keeps dynamic sublane offsets aligned
TILE = 64


def _band_kernel(hw_ref, img_hbm, out_ref, scratch, band_out, sem, *, thr_hi,
                 thr_lo, tile_h: int, real_h: int):
    i = pl.program_id(0)
    Hp = img_hbm.shape[0]
    band_h = tile_h + 2 * HALO
    start = jnp.clip(i * tile_h - HALO, 0, Hp - band_h)
    # always a multiple of 8 (tile_h % 8 == HALO % 8 == 0, Hp - band_h too),
    # but Mosaic needs the divisibility hint to tile the HBM slice
    start = pl.multiple_of(start, 8)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(start, band_h), :], scratch, sem
    )
    copy.start()
    copy.wait()
    img = scratch[:]
    h, w = img.shape

    def shift(x, dx, dy):
        out = x
        if dy:
            out = pltpu.roll(out, (-dy) % h, axis=0)
        if dx:
            out = pltpu.roll(out, (-dx) % w, axis=1)
        return out

    def score_at(thr):
        t = jnp.float32(thr)
        bright_bits = jnp.zeros(img.shape, jnp.uint32)
        dark_bits = jnp.zeros(img.shape, jnp.uint32)
        bright_sum = jnp.zeros(img.shape, jnp.float32)
        dark_sum = jnp.zeros(img.shape, jnp.float32)
        for k, (dx, dy) in enumerate(CIRCLE16):
            d = shift(img, dx, dy) - img
            is_b = d > t
            is_d = d < -t
            bright_bits |= is_b.astype(jnp.uint32) << k
            dark_bits |= is_d.astype(jnp.uint32) << k
            bright_sum += jnp.where(is_b, d - t, 0.0)
            dark_sum += jnp.where(is_d, -d - t, 0.0)

        def has_run9(m16):
            m = m16 | (m16 << 16)
            r = m & (m >> 1)
            r = r & (r >> 2)
            r = r & (r >> 4)
            r = r & (m >> 8)
            return (r & jnp.uint32(0xFFFF)) != 0

        corner = has_run9(bright_bits) | has_run9(dark_bits)
        return jnp.where(corner, jnp.maximum(bright_sum, dark_sum), 0.0)

    s_hi = score_at(thr_hi)
    s_lo = score_at(thr_lo)

    # interior mask in GLOBAL coordinates (start + local row)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + start
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < real_h - 3) & (xx >= 3) & (xx < w - 3)
    s_hi = jnp.where(interior, s_hi, 0.0)
    s_lo = jnp.where(interior, s_lo, 0.0)

    # global low-threshold ceiling comes in via the prefetched scalar
    lo_ceiling = hw_ref[0]
    score = jnp.where(s_hi > 0, 1.0 + s_hi, s_lo * lo_ceiling)

    m = score
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            m = jnp.where(shift(score, dx, dy) > score, 0.0, m)

    # dynamic_slice of a value isn't lowerable in Mosaic; stage through a
    # scratch ref where pl.ds-based reads are
    band_out[:] = m
    off = pl.multiple_of(i * tile_h - start, 8)
    out_ref[:] = band_out[pl.ds(off, tile_h), :]


@functools.partial(jax.jit, static_argnames=("thr_hi", "thr_lo", "interpret"))
def fast_nms_score_pallas(
    img, thr_hi: float = 20.0, thr_lo: float = 7.0, interpret: bool = False
):
    """Fused two-threshold FAST + NMS score map. img: (H, W) float32.

    Matches fast.py's fast_score x2 + blend + nms3x3 composite exactly,
    except the low-threshold blend ceiling uses a fixed conservative bound
    (1e-3 / (1 + max_possible_score)) instead of the frame's max score —
    ranking within each class is unchanged, and high-threshold corners
    dominate either way, so top-k selection is unaffected.
    """
    h, w = img.shape
    if h < TILE + 2 * HALO:
        # tiny pyramid levels: the banded DMA layout needs >= tile+halo rows;
        # fall back to the XLA composite (these levels are cheap anyway)
        from .fast import fast_score, nms3x3

        s_hi, _ = fast_score(img, thr_hi)
        s_lo, _ = fast_score(img, thr_lo)
        lo_ceiling = 1e-3 / (1.0 + 255.0 * 16.0)
        score = jnp.where(s_hi > 0, 1.0 + s_hi, s_lo * lo_ceiling)
        return nms3x3(score)
    tile = TILE
    n_bands = -(-h // tile)
    hp = n_bands * tile
    img_p = jnp.pad(img, ((0, hp - h), (0, 0))) if hp != h else img
    # conservative global ceiling: s_lo <= 255 * 16
    lo_ceiling = jnp.asarray([1e-3 / (1.0 + 255.0 * 16.0)], jnp.float32)

    kernel = functools.partial(
        _band_kernel, thr_hi=thr_hi, thr_lo=thr_lo, tile_h=tile, real_h=h
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile, w), lambda i, hw: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * HALO, w), jnp.float32),
            pltpu.VMEM((tile + 2 * HALO, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(hp * w * 16 * 8 * 2),
            bytes_accessed=int(hp * w * 8),
            transcendentals=0,
        ),
    )(lo_ceiling, img_p)
    return out[:h] if hp != h else out
