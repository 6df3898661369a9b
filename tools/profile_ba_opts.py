"""Optimization variants for the bundle_adjust hot pieces, measured on-chip.
Baselines (measured): solve36_lu 0.51ms, coupling_scatter 0.88ms,
schur_einsum 0.72ms, segment_sum(JpTJp) 0.94ms, project x2 TBD."""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

C, N, Pn, REPS = 6, 1200, 4096, 50


def timed(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) * 1e3 / REPS
    print(name, round(ms, 4), file=sys.stderr, flush=True)
    return name, round(ms, 4)


def loop(body):
    def fn(x):
        return jax.lax.fori_loop(0, REPS, lambda _, v: body(v), x)
    return fn


def main():
    rng = np.random.default_rng(0)
    out = {}

    JcTJp = jnp.asarray(rng.normal(0, 1, (C, N, 6, 3)).astype(np.float32))
    JpTJp = jnp.asarray(rng.normal(0, 1, (C, N, 3, 3)).astype(np.float32))
    obs_lm = jnp.asarray(rng.integers(0, Pn, (C, N)).astype(np.int32))

    # --- one-hot MXU matmul replacing BOTH segment_sum(JpTJp->Hpp) and the
    # coupling scatter (JcTJp->Hcp): onehot (C,N,P) contracted on N
    def onehot_builds(x):
        oh = (obs_lm[:, :, None] == jnp.arange(Pn)[None, None, :]).astype(
            jnp.float32)                           # (C,N,P)
        Hpp = jnp.einsum("cnp,cnij->pij", oh, JpTJp + x * 1e-9)
        Hcp = jnp.einsum("cnp,cnij->cpij", oh, JcTJp)
        return x + Hpp[0] * 1e-9 + Hcp[0, 0, :3, :] * 1e-9
    k, v = timed("onehot_Hpp_and_Hcp", loop(onehot_builds), jnp.zeros((3, 3)))
    out[k] = v

    # --- schur as reshaped matmuls: T = Hcp Hpp_inv; S = T (Hcp)^T over (p,k)
    Hcp0 = jnp.asarray(rng.normal(0, 1, (C, Pn, 6, 3)).astype(np.float32))
    A = jnp.asarray(rng.normal(0, 1, (Pn, 3, 3)).astype(np.float32))
    Hpi = A @ A.transpose(0, 2, 1) + jnp.eye(3)

    def schur_matmul(x):
        T = jnp.einsum("apij,pjk->apik", Hcp0 + x[None, None] * 1e-9, Hpi)
        Tm = T.transpose(0, 2, 1, 3).reshape(C * 6, Pn * 3)
        Hm = Hcp0.transpose(0, 2, 1, 3).reshape(C * 6, Pn * 3)
        S = Tm @ Hm.T                              # (36, 36) on the MXU
        return x + S[:6, :3] * 1e-9
    k, v = timed("schur_matmul", loop(schur_matmul), jnp.zeros((6, 3)))
    out[k] = v

    # --- 36x36 SPD solve: Gauss-Jordan fori (no pivoting) vs LU baseline
    S0 = jnp.asarray(rng.normal(0, 1, (36, 36)).astype(np.float32))
    S0 = S0 @ S0.T + 36 * jnp.eye(36)
    b0 = jnp.asarray(rng.normal(0, 1, (36,)).astype(np.float32))

    def gj_solve(Sm, bm):
        n = Sm.shape[0]
        Ab = jnp.concatenate([Sm, bm[:, None]], axis=1)   # (n, n+1)

        def step(k, Ab):
            piv = Ab[k] / Ab[k, k]
            fac = Ab[:, k].at[k].set(0.0)
            Ab = Ab - fac[:, None] * piv[None, :]
            return Ab.at[k].set(piv)

        Ab = jax.lax.fori_loop(0, n, step, Ab)
        return Ab[:, n]

    def solve_gj(x):
        return gj_solve(S0 + 1e-9 * jnp.outer(x, x), b0 + x * 1e-9)
    k, v = timed("solve36_gauss_jordan", loop(solve_gj), b0)
    out[k] = v
    # correctness check
    got = np.asarray(gj_solve(S0, b0))
    want = np.asarray(jnp.linalg.solve(S0, b0))
    out["gj_max_err"] = float(np.max(np.abs(got - want)))

    # --- projection residual cost at (C,N)
    from lpslam_tpu.geometry import PinholeCamera
    from lpslam_tpu.backend.ba import _project_residuals
    cam = PinholeCamera.make(460.0, 460.0, 320.0, 240.0)
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 3, 3))
    t = jnp.asarray(rng.normal(0, 0.1, (C, 3)).astype(np.float32))
    pts = jnp.asarray(np.stack(
        [rng.uniform(-2, 2, Pn), rng.uniform(-2, 2, Pn),
         rng.uniform(3, 9, Pn)], -1).astype(np.float32))
    obs_uv = jnp.asarray(rng.normal(300, 80, (C, N, 2)).astype(np.float32))

    def proj(x):
        r, Jc, Jp, p_c = _project_residuals(cam, R, t + x * 1e-9, pts,
                                            obs_lm, obs_uv)
        return x + jnp.sum(r[0, 0]) * 1e-9 + Jc[0, 0, 0] * 1e-9
    k, v = timed("project_residuals", loop(proj), jnp.zeros((3,)))
    out[k] = v

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
