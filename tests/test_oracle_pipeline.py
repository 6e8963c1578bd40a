"""End-to-end cross-validation: the JAX pipeline vs a literal sequential f64
oracle of the reference's AddLidarScan (see oracle_pipeline.py).

This measures BASELINE.json's headline accuracy metric — "ATE RMSE vs Ceres
baseline" — with the oracle standing in for the unbuildable Ceres reference.
Remaining deviations between the two implementations are itemized in
MEASUREMENTS.md (f32 vs f64, approx vs exact KNN, solver ftol, batched-parallel
vs sequential match dedup).
"""

import numpy as np
import pytest

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

from oracle_pipeline import OracleLidarOdometry, run_oracle


def _cfg(**kw):
    base = dict(
        max_points_per_sweep=16384,
        max_surfels_per_sweep=512,
        max_surfels_sliding=2048,
        max_surfels_fixed=2048,
        max_correspondences=2048,
        max_leaves_per_sweep=4096,
        max_imu_states=640,
        max_sample_states=48,
        inner_iter_num_max=40,
        gn_function_tolerance=1e-8,
        match_knn_approx=False,  # exact KNN isolates solver/extraction parity
    )
    base.update(kw)
    return WildcatConfig(**base)


def _run_product(seq, cfg):
    lo = LidarOdometry(cfg)
    it = iter(seq.imu)
    pending = next(it, None)
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(it, None)
        lo.add_scan(ts, pl)
    return lo


def _compare(seq, cfg):
    oracle = run_oracle(cfg, seq)
    product = _run_product(seq, cfg)
    assert oracle.sweep_id == product.sweep_id >= 3
    po = np.array([p for _, p, _ in oracle.trajectory])
    to = np.array([t for t, _, _ in oracle.trajectory])
    pp = np.array([p for _, p, _ in product.trajectory])
    tp = np.array([t for t, _, _ in product.trajectory])
    np.testing.assert_allclose(to, tp, atol=1e-9)  # identical sweep boundaries
    delta_rmse = float(np.sqrt(np.mean(np.sum((po - pp) ** 2, axis=1))))
    ate_o = ate_rmse(oracle.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
    ate_p = ate_rmse(product.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
    return delta_rmse, ate_o, ate_p


class TestOracleJacobians:
    """The oracle's analytic jacobians (correct derivations of the reference's
    cost_functor.h residuals) must match finite differences — this is what
    makes the oracle's LM a trustworthy stand-in for a correctly-converged
    Ceres solve."""

    def test_fd_match(self):
        seq = SyntheticSequence(duration=1.2, points_per_scan=2500, room_half=4.0, seed=11)
        lo = run_oracle(_cfg(), seq)
        assert lo.sweep_id >= 2
        corrs_sld = lo._match(lo.surfels_sld, lo.surfels_sld, True)
        corrs_fix = lo._match(lo.surfels_sld, lo.surfels_fix, False)
        prob = lo._build_problem(corrs_sld, corrs_fix)
        assert prob["n_bfac"] > 20 and prob["n_ifac"] > 20

        rng = np.random.default_rng(0)
        s = prob["S"]
        x = rng.normal(scale=1e-2, size=(s, 12))

        rs, js = prob["surfel_residuals"](x, True)
        ri, ji = prob["imu_residuals"](x, True)
        eps = 1e-7
        cols = rng.choice(s * 12, size=24, replace=False)
        for c in cols:
            dx = np.zeros(s * 12)
            dx[c] = eps
            rs_p, _ = prob["surfel_residuals"](x + dx.reshape(s, 12), False)
            rs_m, _ = prob["surfel_residuals"](x - dx.reshape(s, 12), False)
            fd = (rs_p - rs_m) / (2 * eps)
            np.testing.assert_allclose(js[:, c], fd, atol=1e-5, rtol=1e-4)
            ri_p, _ = prob["imu_residuals"](x + dx.reshape(s, 12), False)
            ri_m, _ = prob["imu_residuals"](x - dx.reshape(s, 12), False)
            fd = (ri_p - ri_m) / (2 * eps)
            np.testing.assert_allclose(ji[:, c], fd, atol=2e-2, rtol=1e-4)


class TestPipelineVsOracle:
    def test_nominal_sequence(self):
        seq = SyntheticSequence(duration=2.2, points_per_scan=3000, room_half=4.0, seed=0)
        delta, ate_o, ate_p = _compare(seq, _cfg())
        print(f"nominal: traj-delta {delta*1000:.3f} mm, ATE oracle "
              f"{ate_o*1000:.3f} mm, ATE product {ate_p*1000:.3f} mm")
        # BASELINE.json: "ATE RMSE within 1% of the Ceres baseline".
        # Measured: traj-delta 1.36 mm, ATE 10.12 (product) vs 10.17 (oracle)
        # mm — the product matches the oracle to ~0.5% of its own ATE. Bounds
        # are ~3x the measured values.
        assert delta < 0.005
        assert ate_p < ate_o + 0.003

    def test_outlier_stress_sequence(self):
        seq = SyntheticSequence(duration=2.2, points_per_scan=3000, room_half=4.0,
                                seed=2, outlier_fraction=0.10)
        delta, ate_o, ate_p = _compare(seq, _cfg())
        print(f"stress: traj-delta {delta*1000:.3f} mm, ATE oracle "
              f"{ate_o*1000:.3f} mm, ATE product {ate_p*1000:.3f} mm")
        # measured: traj-delta 4.17 mm, ATE 11.97 (product) vs 11.51 (oracle) mm
        assert delta < 0.012
        assert ate_p < ate_o + 0.005

    @pytest.mark.full
    def test_long_sequence_past_window_shrink(self):
        # >= 8 s: crosses the 6 s sliding-window shrink AND the first
        # eviction->fixed-window migration + fixed-window cross-matching, so
        # drift accumulation past the first trim is exercised, not just the
        # growing-window transient
        seq = SyntheticSequence(duration=8.5, points_per_scan=2500, room_half=4.0, seed=1)
        # steady-state window spans need near-default capacities: the IMU
        # window holds (sliding + sweep) * rate ~ 1300 states, samples ~ 82
        delta, ate_o, ate_p = _compare(seq, _cfg(
            max_surfels_fixed=4096, max_imu_states=1536, max_sample_states=96))
        print(f"long: traj-delta {delta*1000:.3f} mm, ATE oracle "
              f"{ate_o*1000:.3f} mm, ATE product {ate_p*1000:.3f} mm")
        # measured: traj-delta 2.91 mm (round-3 start) -> 4.73 mm after the
        # round-3 normal-equation assembly reordering (fused band placement +
        # symmetric (d + d.T) grouping legitimately change f32 summation
        # order; the f32-product-vs-f64-oracle delta is sensitive to exactly
        # that). ATE at the re-measurement: 8.42 mm (product) vs 10.21 mm
        # (oracle) over 16 sweeps — the product tracks ground truth BETTER
        # than the oracle here, so the delta growth is not a product
        # regression. Bounds ~1.5x measured, per this file's protocol.
        assert delta < 0.0071
        assert ate_p < ate_o + 0.002

    @pytest.mark.full
    def test_doored_corridor_regime(self):
        # the regime that exposed the round-2 bf16 matmul hazard: weak
        # translational observability along the corridor, restored only by
        # doorway bulkheads — oracle agreement here is the strongest
        # regression guard for estimator-critical precision.
        #
        # door_spacing is 6.0 because the ORACLE (exact f64 reference
        # semantics) itself walks off along the corridor at sparser doors on
        # this 8.5 s ramp: measured oracle ATE 8.2 mm at spacing 6.0 but
        # 372 mm at 8.0 and 438 mm at 10.0, while the product stays bounded
        # (18.5 mm at spacing 10.0 — see MEASUREMENTS.md round 3). Agreement
        # can only be asserted where the reference algorithm is stable.
        seq = SyntheticSequence(
            duration=8.5, points_per_scan=2500, room_half=8.0, seed=0,
            geometry="ramp", door_spacing=6.0)
        delta, ate_o, ate_p = _compare(seq, _cfg(
            max_surfels_fixed=4096, max_imu_states=1536, max_sample_states=96))
        print(f"corridor: traj-delta {delta*1000:.3f} mm, ATE oracle "
              f"{ate_o*1000:.3f} mm, ATE product {ate_p*1000:.3f} mm")
        # measured (this round): traj-delta 6.09 mm, ATE 11.71 (product) vs
        # 8.24 (oracle) mm over 17 sweeps; bounds ~1.5x measured
        assert delta < 0.010
        assert ate_p < ate_o + 0.006
