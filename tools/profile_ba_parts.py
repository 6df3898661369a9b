"""Per-component device-time profile of one bundle_adjust LM iteration at
the local-BA operating shape (C=6 cams, N=1200 obs/cam, P=4096 points).
Each piece runs R times inside ONE jitted lax.fori_loop so the tunnel RTT
amortizes away; reported ms is pure device time per call."""
from __future__ import annotations

import json
import time

import sys

import numpy as np
import jax
import jax.numpy as jnp

C, N, Pn, REPS = 6, 1200, 4096, 50


def timed(name, fn, *args):
    out = {}
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) * 1e3 / REPS
    print(name, round(ms, 4), file=sys.stderr, flush=True)
    return name, round(ms, 4)


def loop(body, x0):
    def fn(x):
        return jax.lax.fori_loop(0, REPS, lambda _, v: body(v), x)
    return fn


def main():
    rng = np.random.default_rng(0)
    out = {}

    A = jnp.asarray(rng.normal(0, 1, (Pn, 3, 3)).astype(np.float32))
    A = A @ A.transpose(0, 2, 1) + 0.5 * jnp.eye(3)

    def inv_lu(M):
        return jnp.linalg.inv(M) + 1e-9 * M

    def inv_adj(M):
        # closed-form 3x3 inverse (adjugate / det) — pure VPU math
        a, b, c = M[:, 0, 0], M[:, 0, 1], M[:, 0, 2]
        d, e, f = M[:, 1, 0], M[:, 1, 1], M[:, 1, 2]
        g, h, i = M[:, 2, 0], M[:, 2, 1], M[:, 2, 2]
        A00 = e * i - f * h; A01 = c * h - b * i; A02 = b * f - c * e
        A10 = f * g - d * i; A11 = a * i - c * g; A12 = c * d - a * f
        A20 = d * h - e * g; A21 = b * g - a * h; A22 = a * e - b * d
        det = a * A00 + b * A10 + c * A20
        inv = jnp.stack([
            jnp.stack([A00, A01, A02], -1),
            jnp.stack([A10, A11, A12], -1),
            jnp.stack([A20, A21, A22], -1),
        ], 1) / det[:, None, None]
        return inv + 1e-9 * M

    import os
    if not os.environ.get("SKIP_MEASURED"):
        for nm, f in (("inv3x3_lu", inv_lu), ("inv3x3_adjugate", inv_adj)):
            k, v = timed(nm, loop(f, A), A)
            out[k] = v

    S = jnp.asarray(rng.normal(0, 1, (36, 36)).astype(np.float32))
    S = S @ S.T + 36 * jnp.eye(36)
    b = jnp.asarray(rng.normal(0, 1, (36,)).astype(np.float32))

    def solve_lu(x):
        return jnp.linalg.solve(S + 1e-9 * jnp.outer(x, x), b + x * 1e-9)

    def solve_cho(x):
        L = jnp.linalg.cholesky(S + 1e-9 * jnp.outer(x, x))
        y = jax.scipy.linalg.solve_triangular(L, b + x * 1e-9, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    if not os.environ.get("SKIP_MEASURED"):
        for nm, f in (("solve36_lu", solve_lu), ("solve36_chol", solve_cho)):
            k, v = timed(nm, loop(f, b), b)
            out[k] = v

    # scatter-add of the dense coupling (C,P,6,3)
    JcTJp = jnp.asarray(rng.normal(0, 1, (C, N, 6, 3)).astype(np.float32))
    flat_lm = jnp.asarray(rng.integers(0, Pn, C * N).astype(np.int32))
    cam_rows = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N)).reshape(-1)

    def coupling_scatter(x):
        Hcp = jnp.zeros((C, Pn, 6, 3), jnp.float32)
        Hcp = Hcp.at[cam_rows, flat_lm].add(JcTJp.reshape(-1, 6, 3) + x)
        return Hcp[0, 0] * 1e-9 + x
    if not os.environ.get("SKIP_MEASURED"):
        k, v = timed("coupling_scatter", loop(coupling_scatter, jnp.zeros((6, 3))),
                     jnp.zeros((6, 3)))
        out[k] = v

    # the Schur triple einsum given Hcp
    Hcp0 = jnp.asarray(rng.normal(0, 1, (C, Pn, 6, 3)).astype(np.float32))
    Hpi = inv_adj(A)

    def schur(x):
        Sx = jnp.einsum("apij,pjk,bplk->aibl", Hcp0 + x * 1e-9, Hpi, Hcp0)
        return Sx[0, :3, 0, :].T * 1e-9 + x
    k, v = timed("schur_einsum", loop(schur, jnp.zeros((6, 3))), jnp.zeros((6, 3)))
    out[k] = v

    # segment_sum of (C*N,3,3) into P
    JpTJp = jnp.asarray(rng.normal(0, 1, (C * N, 3, 3)).astype(np.float32))

    def seg(x):
        s = jax.ops.segment_sum(JpTJp + x * 1e-9, flat_lm, num_segments=Pn)
        return s[0] * 1e-9 + x
    k, v = timed("segment_sum", loop(seg, jnp.zeros((3, 3))), jnp.zeros((3, 3)))
    out[k] = v

    # projection residuals + jacobians at (C,N)
    from lpslam_tpu.geometry import PinholeCamera
    from lpslam_tpu.backend.ba import _project_residuals
    cam = PinholeCamera.make(460.0, 460.0, 320.0, 240.0)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3))
    t = jnp.asarray(rng.normal(0, 0.1, (C, 3)).astype(np.float32))
    pts = jnp.asarray(
        np.stack([rng.uniform(-2, 2, Pn), rng.uniform(-2, 2, Pn),
                  rng.uniform(3, 9, Pn)], -1).astype(np.float32))
    obs_lm = jnp.asarray(rng.integers(0, Pn, (C, N)).astype(np.int32))
    obs_uv = jnp.asarray(rng.normal(300, 80, (C, N, 2)).astype(np.float32))

    def proj(x):
        r, Jc, Jp, p_c = _project_residuals(cam, R, t + x * 1e-9, pts, obs_lm, obs_uv)
        return x + r[0, 0] * 1e-9
    k, v = timed("project_residuals", loop(proj, jnp.zeros((3,))), jnp.zeros((3,)))
    out[k] = v

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
