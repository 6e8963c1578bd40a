"""Round-5 device micro A/Bs at shipped shapes (real TPU).

A. H cross-Gram operand layout (solver._surfel_normal_eqs): the r4/r5 traces
   show the two (8192,1152)^T(8192,1152) 3-pass Grams at ~0.34 ms each vs a
   ~0.11 ms MAC roofline — the gap attributed to operand relayout (the dot
   contracts dim 0, so XLA materializes/reads both expansions column-major).
   Variants: current (expand msj, dot(b1.T, b2)) vs pre-transposed expansion
   (expand sjm -> bitcast (S*12, nb), dot(b1t, b2)).

B. insert_surfels put(): current masked read-modify-write scatter
   (gather cur -> where -> sorted-unique scatter) vs OOB-drop scatter
   (non-written rows target index >= cap, mode="drop"; no cur gather, no
   select, unsorted-but-unique indices).

Usage: python benchmarks/ab_r5_device.py [reps=50]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rng = np.random.default_rng(0)
    HIGH = jax.lax.Precision.HIGH

    # --- A: cross-Gram layouts at shipped shapes (nb=8192, S=96) ---
    nb, S = 8192, 96
    w1 = jnp.asarray(rng.random((nb, S)), jnp.float32)
    w2 = jnp.asarray(rng.random((nb, S)), jnp.float32)
    j1 = jnp.asarray(rng.random((nb, 12)), jnp.float32)
    j2 = jnp.asarray(rng.random((nb, 12)), jnp.float32)

    @jax.jit
    def cross_cur(w1, j1, w2, j2):
        b1 = jnp.einsum("ms,mj->msj", w1, j1, precision=HIGH).reshape(nb, S * 12)
        b2 = jnp.einsum("ms,mj->msj", w2, j2, precision=HIGH).reshape(nb, S * 12)
        return jnp.dot(b1.T, b2, precision=HIGH, preferred_element_type=jnp.float32)

    @jax.jit
    def cross_pret(w1, j1, w2, j2):
        b1t = jnp.einsum("ms,mj->sjm", w1, j1, precision=HIGH).reshape(S * 12, nb)
        b2 = jnp.einsum("ms,mj->msj", w2, j2, precision=HIGH).reshape(nb, S * 12)
        return jnp.dot(b1t, b2, precision=HIGH, preferred_element_type=jnp.float32)

    a = timeit(cross_cur, w1, j1, w2, j2, reps=reps)
    print(f"A cross-Gram current: {a:.3f} ms", flush=True)
    b = timeit(cross_pret, w1, j1, w2, j2, reps=reps)
    ref = cross_cur(w1, j1, w2, j2)
    db = float(jnp.max(jnp.abs(cross_pret(w1, j1, w2, j2) - ref)))
    print(f"A cross-Gram pre-transposed: {b:.3f} ms (maxdiff {db:.2e})",
          flush=True)

    # --- B: insert_surfels put variants (fixed window: cap 16384, m 3072) ---
    cap, m = 16384, 3072
    fields = {  # (shape tail, dtype) per Surfels field + aux + valid
        "t": ((), jnp.float32), "center": ((3,), jnp.float32),
        "cov": ((3, 3), jnp.float32), "norm": ((3,), jnp.float32),
        "rot": ((4,), jnp.float32), "pos": ((3,), jnp.float32),
        "resolution": ((), jnp.float32), "std": ((), jnp.float32),
        "aux": ((12,), jnp.float32),
    }
    bufs = {k: jnp.asarray(rng.random((cap,) + s), d) for k, (s, d) in fields.items()}
    vals = {k: jnp.asarray(rng.random((m,) + s), d) for k, (s, d) in fields.items()}
    vbuf = jnp.asarray(rng.random(cap) < 0.9)
    vval = jnp.asarray(rng.random(m) < 0.8)
    slots = jnp.asarray(np.sort(rng.choice(cap, m, replace=False)).astype(np.int32))
    write = jnp.asarray(rng.random(m) < 0.5)

    @jax.jit
    def put_cur(bufs, vbuf, vals, vval, slots, write):
        out = {}
        for k, buf in bufs.items():
            cur = buf[slots]
            sel = write.reshape((-1,) + (1,) * (buf.ndim - 1))
            out[k] = buf.at[slots].set(jnp.where(sel, vals[k], cur),
                                       unique_indices=True, indices_are_sorted=True)
        out["valid"] = vbuf.at[slots].set(jnp.where(write, vval, vbuf[slots]),
                                          unique_indices=True, indices_are_sorted=True)
        return out

    @jax.jit
    def put_drop(bufs, vbuf, vals, vval, slots, write):
        # non-written rows target distinct OOB indices -> dropped; no gather
        tgt = jnp.where(write, slots, cap + jnp.arange(m, dtype=jnp.int32))
        out = {k: buf.at[tgt].set(vals[k], mode="drop", unique_indices=True)
               for k, buf in bufs.items()}
        out["valid"] = vbuf.at[tgt].set(vval, mode="drop", unique_indices=True)
        return out

    a = timeit(put_cur, bufs, vbuf, vals, vval, slots, write, reps=reps)
    b = timeit(put_drop, bufs, vbuf, vals, vval, slots, write, reps=reps)
    ra, rb = (put_cur(bufs, vbuf, vals, vval, slots, write),
              put_drop(bufs, vbuf, vals, vval, slots, write))
    same = all(bool(jnp.all(ra[k] == rb[k])) for k in ra)
    print(f"B insert put: rmw-scatter {a:.3f} ms | drop-scatter {b:.3f} ms "
          f"(identical={same})", flush=True)


if __name__ == "__main__":
    main()
