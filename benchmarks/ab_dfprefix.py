"""A/B variants of the blocked compensated prefix (ops/dfsum.py) at the
shipped extraction shape (65536, 11) x 3 levels.

The shipped in-block cumsum (axis length 1024) lowers to three reduce-window
passes + layout copies (~0.43 ms per level traced). Candidates:
  a) block=1024, plain jnp.cumsum over 1024     (shipped)
  b) block=128, plain jnp.cumsum over 128
  c) block=128, cumsum via tril-ones matmul at HIGHEST (MXU)
  d) block=1024, 128-chunk matmul + 8-chunk offset chain

Run on the live TPU: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_dfprefix.py
"""

import time

import numpy as np


def timeit(fn, *args, n=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from wildcat_slam_tpu.ops import dfsum

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(65536, 11)) ** 2, jnp.float32)
    HI = jax.lax.Precision.HIGHEST

    def v_a(x):
        return dfsum.df_prefix(x, block=1024)

    def v_b(x):
        return dfsum.df_prefix(x, block=128)

    def inblock_mm(xb, k):
        # inclusive in-chunk cumsum via lower-triangular ones matmul (MXU).
        l = jnp.tril(jnp.ones((k, k), xb.dtype))
        return jnp.einsum("ij,bjc->bic", l, xb, precision=HI)

    def v_c(x):
        n, c = x.shape
        k = 128
        b = n // k
        xb = x.reshape(b, k, c)
        inc = inblock_mm(xb, k)
        inb = jnp.concatenate([jnp.zeros((b, 1, c), x.dtype), inc[:, :-1]], axis=1)
        inb = jnp.concatenate([inb.reshape(n, c), jnp.zeros((1, c), x.dtype)])
        totals = inc[:, -1]
        hi, lo = dfsum.df_cumsum(totals, axis=0)
        bp_hi = jnp.concatenate([jnp.zeros((1, c), x.dtype), hi])
        bp_lo = jnp.concatenate([jnp.zeros((1, c), x.dtype), lo])
        return dfsum.DfPrefix(bp_hi, bp_lo, inb, k)

    def v_d(x):
        n, c = x.shape
        k, m = 128, 8          # 1024-block = 8 chunks of 128
        b = n // (k * m)
        xb = x.reshape(b * m, k, c)
        inc128 = inblock_mm(xb, k)
        ct = inc128[:, -1].reshape(b, m, c)
        off = jnp.cumsum(ct, axis=1) - ct            # exclusive chunk offsets
        inc = (inc128.reshape(b, m, k, c) + off[:, :, None, :]).reshape(b, m * k, c)
        inb = jnp.concatenate([jnp.zeros((b, 1, c), x.dtype), inc[:, :-1]], axis=1)
        inb = jnp.concatenate([inb.reshape(n, c), jnp.zeros((1, c), x.dtype)])
        totals = inc[:, -1]
        hi, lo = dfsum.df_cumsum(totals, axis=0)
        bp_hi = jnp.concatenate([jnp.zeros((1, c), x.dtype), hi])
        bp_lo = jnp.concatenate([jnp.zeros((1, c), x.dtype), lo])
        return dfsum.DfPrefix(bp_hi, bp_lo, inb, k * m)

    # correctness vs f64 on a range-sum workload
    x64 = np.asarray(x, np.float64)
    s, e = 60000, 64321
    ref = x64[s:e].sum(axis=0)
    for name, fn in [("a block1024 cumsum", v_a), ("b block128 cumsum", v_b),
                     ("c block128 matmul", v_c), ("d 1024/128 matmul", v_d)]:
        jfn = jax.jit(fn)
        pfx = jfn(x)
        got = np.asarray(jax.device_get(dfsum.df_range_sum(
            pfx, jnp.asarray(s), jnp.asarray(e))), np.float64)
        err = np.max(np.abs(got - ref) / np.abs(ref))
        ms = timeit(jfn, x)
        print(f"{name:22s} {ms:7.3f} ms   max rel err {err:.2e}")


if __name__ == "__main__":
    main()
