"""A/B cost of the round-3 numerics fixes at shipped shapes, on the live device.

1. extract_surfels: double-float prefix (ops/dfsum.py) vs plain f32 cumsum
2. fused PCG kernel: precision=HIGHEST matvec vs default

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_round3.py
"""

import time

import numpy as np


def timeit(fn, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.odometry import surfel as smod

    cfg = WildcatConfig()
    p = cfg.max_points_per_sweep
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-5, 5, (p, 3)), jnp.float32)
    t = jnp.asarray(np.sort(rng.uniform(0, 0.5, p)), jnp.float32)
    valid = jnp.ones((p,), bool)

    # A: shipped (df-prefix)
    a = timeit(lambda: smod.extract_surfels(pts, t, valid, cfg)["t"])

    # B: plain cumsum (the round-2 path), monkeypatched
    import wildcat_slam_tpu.ops.dfsum as dfs

    real_df = smod.df_prefix

    def plain_prefix(x, axis=0):
        hi = jnp.concatenate([jnp.zeros((1,) + x.shape[1:], x.dtype),
                              jnp.cumsum(x, axis=axis)])
        return hi, jnp.zeros_like(hi)

    smod.df_prefix = plain_prefix
    smod.extract_surfels.clear_cache()
    b = timeit(lambda: smod.extract_surfels(pts, t, valid, cfg)["t"])
    smod.df_prefix = real_df
    smod.extract_surfels.clear_cache()

    print(f"extract_surfels  df-prefix : {a:7.2f} ms")
    print(f"extract_surfels  plain     : {b:7.2f} ms   (delta {a-b:+.2f} ms)")

    # PCG fused kernel A/B
    from wildcat_slam_tpu.ops import pcg_pallas as pk

    s_cap = cfg.max_sample_states
    n = s_cap * 12
    jrng = jax.random.PRNGKey(0)
    m = jax.random.normal(jrng, (n, n), jnp.float32) * 0.1
    h = m @ m.T + 10.0 * jnp.eye(n)
    g = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
    lam = 1e-4
    d = jnp.clip(jnp.diag(h), 1e-6, 1e32)
    dlam = lam * d
    minv = pk.block_diag_inverse(h, dlam, s_cap)

    f_hi = jax.jit(lambda: pk.pcg_solve_fused(h, dlam, minv, g, iters=96, tol=1e-6))
    c = timeit(f_hi)
    print(f"fused PCG (HIGHEST matvec) : {c:7.2f} ms")


if __name__ == "__main__":
    main()
