"""Direct measurement of the TPU-tunnel per-dispatch RPC floor.

The wall-basis numbers in this environment ride a network tunnel to the TPU
whose per-execute overhead varies not just run-to-run but WITHIN a session
(round-5 observation: the same k=8 chunked replay measured 35.8 and then
124.5 ms/sweep 40 minutes apart). This probe isolates the tunnel from the
pipeline: it times (a) a trivial jitted scalar round-trip (dispatch + fetch
floor), (b) a 1 MB host->device transfer (one sweep's point feed), and
(c) a 1 MB device->host fetch — each N times, reporting min/median/p90.
Run it next to any wall measurement so the artifact records what the tunnel
was doing at that moment.

Usage: python benchmarks/rpc_floor.py [N=30]
"""
import sys
import time

import numpy as np


def _stats(xs):
    xs = sorted(xs)
    n = len(xs)
    return (xs[0] * 1e3, xs[n // 2] * 1e3, xs[int(n * 0.9)] * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))  # compile
    rt = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))  # enqueue + fetch: one full round-trip
        rt.append(time.perf_counter() - t0)

    def emit(name, vals):
        mn, md, p90 = _stats(vals)
        print(f"{name:17s} min {mn:7.1f} ms  median {md:7.1f} ms  p90 {p90:7.1f} ms",
              flush=True)

    emit("roundtrip_scalar", rt)

    # h2d at three sizes: flat per-call overhead vs bandwidth attribution
    for label, shape, nn in (("h2d_64KB", (16384,), n), ("h2d_1MB", (65536, 4), n),
                             ("h2d_8MB", (8, 65536, 4), max(n // 3, 5))):
        host = np.zeros(shape, np.float32)
        jax.block_until_ready(jax.device_put(host))  # warm path
        xs = []
        for _ in range(nn):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(host))
            xs.append(time.perf_counter() - t0)
        emit(label, xs)

    # h2d of one sweep's ACTUAL feed layout: 12 separate arrays in one jitted
    # call (how process_sweep receives them) — measures per-argument overhead
    args = [np.zeros((65536, 3), np.float32), np.zeros((65536,), np.float32)] + \
           [np.zeros((s,), np.float32) for s in (232, 232 * 3, 232 * 3, 1, 8, 1, 1, 1)] + \
           [np.zeros((), np.float32), np.zeros((3,), np.float32)]
    g = jax.jit(lambda *a: sum(jnp.sum(x) for x in a))
    float(g(*args))
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(g(*args))
        xs.append(time.perf_counter() - t0)
    emit("feed_12args_1MB", xs)

    # d2h of a device-COMPUTED 1MB array (device_put results keep a host copy,
    # so fetching one is free and would lie)
    mk = jax.jit(lambda: jnp.ones((65536, 4), jnp.float32) * 2.0)
    dev = jax.block_until_ready(mk())
    xs = []
    for _ in range(n):
        dev = jax.block_until_ready(mk())
        t0 = time.perf_counter()
        np.asarray(dev)
        xs.append(time.perf_counter() - t0)
    emit("d2h_1MB_computed", xs)


if __name__ == "__main__":
    main()
