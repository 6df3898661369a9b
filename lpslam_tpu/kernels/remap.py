"""Bilinear remap (undistort / rectify) as a device gather kernel.

The reference rectifies each stereo eye on CPU with cached cv::remap maps
(/root/reference/src/Utils/ImageProcessing.h:130-256,
/root/reference/src/Trackers/OpenVSLAMStereoTracker.cpp:192-215 runs the two
eyes in parallel threads). Here the cached map is a device-resident (H,W,2)
array and the remap is one vectorized bilinear gather — both eyes ride the
same kernel via a leading batch dim.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def remap_bilinear(img, mapxy):
    """img: (H, W) or (B, H, W) float32; mapxy: (H', W', 2) sample coords
    (x, y) into img. Out-of-range samples clamp to the border (matching
    cv2.BORDER_REPLICATE behavior closely enough for rectification edges).
    """
    batched = img.ndim == 3
    if not batched:
        img = img[None]
    b, h, w = img.shape
    x = mapxy[..., 0]
    y = mapxy[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)

    flat = img.reshape(b, -1)
    idx00 = y0 * w + x0
    v00 = flat[:, idx00]
    v01 = flat[:, idx00 + 1]
    v10 = flat[:, idx00 + w]
    v11 = flat[:, idx00 + w + 1]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out if batched else out[0]
