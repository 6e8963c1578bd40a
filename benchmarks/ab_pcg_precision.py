"""A/B: fused PCG kernel matvec precision + fused-vs-XLA solve comparison.

Per the round-3 cross-Gram analysis (MEASUREMENTS.md): a 3-pass product's
element error (~2^-22) is below the f32 accumulation noise of a 1152-term dot
(~sqrt(N) * 2^-24 ~ 8e-6), so HIGH should be statistically free — but PCG
*iterates* on the result, so this measures (a) kernel time and (b) solution
delta vs an f64 direct solve, at shipped shapes with LM-realistic damping.

In-kernel matvec options actually available on TPU (round-4 findings,
MEASUREMENTS.md "fused-PCG VPU matvec: attempted, not lowerable"):
  - Precision.HIGH raises NotImplementedError in Mosaic lowering;
  - a VPU broadcast-multiply-reduce matvec hangs the Mosaic compiler for
    n >= 384 (lane-axis reduce) or is rejected ("unsupported shape cast",
    sublane/row-state variants);
so the A/B is the 6-pass HIGHEST MXU dot (shipped) vs the HBM-streaming XLA
while-loop PCG (solver.py fallback used when the kernel exceeds VMEM).

Run on the live TPU: python benchmarks/ab_pcg_precision.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wildcat_slam_tpu.ops import pcg_pallas as pp
    from wildcat_slam_tpu.odometry import solver as sv

    s_cap = 96
    n = s_cap * 12
    rng = np.random.default_rng(0)

    # H with normal-equation structure: block-banded dominant + low-rank cross
    # terms + a wide spectrum (weak gauge-adjacent modes ~1e-6 of strong).
    j = rng.normal(size=(8 * n, n)).astype(np.float64)
    scale = 10.0 ** rng.uniform(-3, 0, size=n)  # per-column conditioning
    j *= scale[None, :]
    h64 = j.T @ j
    g64 = rng.normal(size=n)
    lam = 1e-4
    d = np.clip(np.diag(h64), 1e-6, None)
    x_ref = np.linalg.solve(h64 + lam * np.diag(d), g64)

    h = jnp.asarray(h64, jnp.float32)
    dlam = jnp.asarray(lam * d, jnp.float32)
    b = jnp.asarray(g64, jnp.float32)
    minv = pp.block_diag_inverse(h, dlam, s_cap)

    def fused(h, dlam, minv, b):
        return pp.pcg_solve_fused(h, dlam, minv, b, iters=96, tol=1e-6,
                                  precision=jax.lax.Precision.HIGHEST)

    def xla(h, dlam, minv, b):
        # the solver fallback takes the already-damped matrix and rebuilds its
        # own block-Jacobi preconditioner (solver.py:202)
        hd = h + jnp.diag(dlam)
        return sv._pcg_solve(hd, b, s_cap, iters=96, tol=1e-6)

    for name, impl in [("fused-HIGHEST", fused), ("xla-stream", xla)]:
        fn = jax.jit(impl)
        x = np.asarray(jax.device_get(fn(h, dlam, minv, b)), np.float64)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = fn(h, dlam, minv, b)
        jax.device_get(out)  # true sync (block_until_ready lies on axon)
        ms = (time.perf_counter() - t0) / iters * 1e3
        rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        res = np.linalg.norm((h64 + lam * np.diag(d)) @ x - g64) / np.linalg.norm(g64)
        print(f"{name:14s}  {ms:7.3f} ms/solve   |x-x64|/|x64|={rel:.2e}   "
              f"residual={res:.2e}")


if __name__ == "__main__":
    main()
