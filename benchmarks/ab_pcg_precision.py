"""A/B: fused PCG kernel matvec at HIGHEST (6-pass bf16) vs HIGH (3-pass).

Per the round-3 cross-Gram analysis (MEASUREMENTS.md): a 3-pass product's
element error (~2^-22) is below the f32 accumulation noise of a 1152-term dot
(~sqrt(N) * 2^-24 ~ 8e-6), so HIGH should be statistically free — but PCG
*iterates* on the result, so this measures (a) kernel time and (b) solution
delta vs an f64 direct solve, at shipped shapes with LM-realistic damping.

Run on the live TPU: python benchmarks/ab_pcg_precision.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wildcat_slam_tpu.ops import pcg_pallas as pp

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

    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH)]:
        fn = jax.jit(lambda h, dlam, minv, b, p=prec: pp.pcg_solve_fused(
            h, dlam, minv, b, iters=96, tol=1e-6, precision=p))
        x = np.asarray(jax.device_get(fn(h, dlam, minv, b)), np.float64)
        t0 = time.perf_counter()
        iters = 30
        for _ in range(iters):
            out = fn(h, dlam, minv, b)
        jax.device_get(out)  # true sync (block_until_ready lies on axon)
        ms = (time.perf_counter() - t0) / iters * 1e3
        rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        res = np.linalg.norm((h64 + lam * np.diag(d)) @ x - g64) / np.linalg.norm(g64)
        print(f"{name:8s}  {ms:7.3f} ms/solve   |x-x64|/|x64|={rel:.2e}   "
              f"residual={res:.2e}")


if __name__ == "__main__":
    main()
