"""Attribute per-sweep host/tunnel overhead: transfer count vs bytes vs dispatch.

Measures, on the live backend:
  1. dispatch+transfer cost of a trivial jitted fn taking the pipeline's 12
     per-sweep numpy args (the shipped process_sweep feed layout);
  2. the same data packed into 2 arrays (one small f32 block + one point block);
  3. pure dispatch of a no-arg jitted fn (tunnel round-trip floor);
  4. device_put throughput for the 1 MB point block.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tunnel_attrib.py
"""

import time

import numpy as np


def timeit(fn, n=30, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev)

    kmax, amax, p = 132, 14, 65536
    rng = np.random.default_rng(0)
    args = [
        rng.normal(size=(kmax,)).astype(np.float32),
        rng.normal(size=(kmax, 3)).astype(np.float32),
        rng.normal(size=(kmax, 3)).astype(np.float32),
        np.int32(100),
        rng.normal(size=(amax,)).astype(np.float32),
        np.int32(6),
        rng.normal(size=(p, 3)).astype(np.float32),
        rng.normal(size=(p,)).astype(np.float32),
        np.int32(p),
        np.int32(0),
        np.int32(0),
        np.bool_(True),
    ]

    @jax.jit
    def f12(*a):
        s = a[0].sum() + a[1].sum() + a[2].sum() + a[4].sum() + a[6].sum() + a[7].sum()
        return s + a[3] + a[5] + a[8] + a[9] + a[10] + a[11]

    small = np.concatenate([args[0], args[1].ravel(), args[2].ravel(), args[4],
                            np.float32([100, 6, p, 0, 0, 1])]).astype(np.float32)
    big = np.concatenate([args[6].ravel(), args[7]]).astype(np.float32)

    @jax.jit
    def f2(s, b):
        return s.sum() + b.sum()

    @jax.jit
    def f0():
        return jnp.zeros(())

    r12 = timeit(lambda: jax.block_until_ready(f12(*args)))
    r2 = timeit(lambda: jax.block_until_ready(f2(small, big)))
    r0 = timeit(lambda: jax.block_until_ready(f0()))
    rput = timeit(lambda: jax.block_until_ready(jax.device_put(big)))
    rput_small = timeit(lambda: jax.block_until_ready(jax.device_put(small)))

    # async-pipelined variant: dispatch N calls, block once
    def pipelined(fn, a):
        outs = [fn(*a) for _ in range(10)]
        jax.block_until_ready(outs)
    rp12 = timeit(lambda: pipelined(f12, args), n=5) / 10
    rp2 = timeit(lambda: pipelined(f2, (small, big)), n=5) / 10

    print(f"12-arg call (blocked)    : {r12:7.2f} ms")
    print(f" 2-arg call (blocked)    : {r2:7.2f} ms")
    print(f" 0-arg call (blocked)    : {r0:7.2f} ms")
    print(f"12-arg call (pipelined)  : {rp12:7.2f} ms")
    print(f" 2-arg call (pipelined)  : {rp2:7.2f} ms")
    print(f"device_put 1MB           : {rput:7.2f} ms")
    print(f"device_put 4KB           : {rput_small:7.2f} ms")


if __name__ == "__main__":
    main()
