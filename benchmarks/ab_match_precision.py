"""A/B: match-Gram MXU precision (HIGHEST vs HIGH vs DEFAULT) for KNN ranking.

The matcher's distance Gram is a (Q, 6) x (6, T) matmul — contraction depth 6,
padded to 128 on the MXU, so every pass is ~21x redundant work and the pass
count IS the cost. The round-4 trace budget put the two Gram+top-k fusions at
2.22 ms/sweep at HIGHEST (6 passes). HIGH (3 passes) keeps element error
~2^-22 — two orders below one-pass bf16's ~0.4% that measurably scrambles
near-equal neighbour ranking (match.py:105-109) — so ranking fidelity should
be indistinguishable from HIGHEST while halving the MXU work.

Two modes:
  micro  (default)  — recall@k of each precision's candidate set against an
                      exact f64 ranking, plus steady-state kernel timing, at
                      shipped shapes on the live device.
  --e2e PRECISION   — run the validation regimes end-to-end with the match
                      Gram pinned to PRECISION (HIGHEST|HIGH|DEFAULT) and
                      print per-scene ATE. Run once per precision in separate
                      processes (the pipeline jit caches bake the constant in).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_match_precision.py [--e2e HIGH]
"""

import argparse
import time

import numpy as np


def micro():
    import jax
    import jax.numpy as jnp

    q_n, t_n, k = 8192, 24576, 10
    rng = np.random.default_rng(0)
    # descriptor ranges as shipped: centers re-centered to +-5 m / 1 m scale,
    # unit normals / 0.0873 rad -> +-11.5; cluster centers so near-ties exist
    cc = rng.uniform(-5, 5, (256, 3))
    cen_q = cc[rng.integers(0, 256, q_n)] + rng.normal(0, 0.3, (q_n, 3))
    cen_t = cc[rng.integers(0, 256, t_n)] + rng.normal(0, 0.3, (t_n, 3))
    nq = rng.normal(size=(q_n, 3)); nq /= np.linalg.norm(nq, axis=1, keepdims=True)
    nt = rng.normal(size=(t_n, 3)); nt /= np.linalg.norm(nt, axis=1, keepdims=True)
    dq64 = np.concatenate([cen_q, nq / 0.0873], axis=1)
    dt64 = np.concatenate([cen_t, nt / 0.0873], axis=1)

    d2_exact = (
        (dq64 * dq64).sum(1)[:, None]
        - 2.0 * dq64 @ dt64.T
        + (dt64 * dt64).sum(1)[None, :]
    )
    exact_knn = np.argsort(d2_exact, axis=1)[:, :k]

    dq = jnp.asarray(dq64, jnp.float32)
    dt = jnp.asarray(dt64, jnp.float32)

    results = {}
    for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)]:
        @jax.jit
        def knn(dq, dt, p=prec):
            d2 = ((dq * dq).sum(1)[:, None]
                  - 2.0 * jnp.matmul(dq, dt.T, precision=p)
                  + (dt * dt).sum(1)[None, :])
            _, idx = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
            return idx
        idx = np.asarray(jax.device_get(knn(dq, dt)))
        t0 = time.perf_counter()
        n_it = 30
        for _ in range(n_it):
            out = knn(dq, dt)
        jax.device_get(out)
        ms = (time.perf_counter() - t0) / n_it * 1e3
        recall = np.mean([
            len(set(idx[i]) & set(exact_knn[i])) / k for i in range(q_n)])
        results[name] = (ms, recall)
        print(f"{name:8s}  {ms:7.3f} ms/search   recall@{k} vs f64-exact: {recall:.4f}",
              flush=True)
    return results


def e2e(precision: str):
    import jax
    import jax.numpy as jnp  # noqa: F401

    from wildcat_slam_tpu.odometry import match
    match.GRAM_PRECISION = getattr(jax.lax.Precision, precision)

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

    cfg = WildcatConfig(
        max_points_per_sweep=16384, max_surfels_per_sweep=512,
        max_surfels_sliding=2048, max_surfels_fixed=2048,
        max_correspondences=2048, max_leaves_per_sweep=4096,
        max_imu_states=640, max_sample_states=48, inner_iter_num_max=25,
    )
    scenes = [
        ("room seed 0", dict(duration=2.5, points_per_scan=3000, room_half=5.0,
                             seed=0)),
        ("cylinder seed 0", dict(duration=2.5, points_per_scan=3000,
                                 room_half=5.0, seed=0, geometry="cylinder")),
        ("cylinder seed 2", dict(duration=2.5, points_per_scan=3000,
                                 room_half=5.0, seed=2, geometry="cylinder")),
        ("ramp doors 10", dict(duration=2.5, points_per_scan=3000,
                               room_half=8.0, seed=0, geometry="ramp",
                               door_spacing=10.0)),
    ]
    for name, kw in scenes:
        seq = SyntheticSequence(**kw)
        lo = LidarOdometry(cfg)
        it = iter(seq.imu)
        pending = next(it, None)
        for ts, pl in seq.scans:
            while pending is not None and pending[0] <= ts[-1] + 0.01:
                lo.add_imu(*pending)
                pending = next(it, None)
            lo.add_scan(ts, pl)
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        print(f"{precision:8s} {name:18s} ATE {err * 1e3:8.2f} mm", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e", metavar="PRECISION", default=None,
                    choices=["HIGHEST", "HIGH", "DEFAULT"])
    args = ap.parse_args()
    if args.e2e:
        e2e(args.e2e)
    else:
        micro()


if __name__ == "__main__":
    main()
