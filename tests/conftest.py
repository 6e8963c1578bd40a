"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding code paths
(jax.sharding.Mesh / shard_map) are exercised without TPU hardware, and with x64
enabled so reference-fidelity checks can run at double precision.

Note: this environment's sitecustomize imports jax at interpreter start and pins
``jax_platforms=axon,cpu`` (the TPU tunnel). Overriding the env var is therefore
ineffective — we must update jax.config after import, before any backend is used.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Smoke subset: `pytest -m smoke` — curated for <2 min SERIAL on a 1-CPU box
# while touching every module (durations measured, MEASUREMENTS.md round 4).
# Matching is by node-id substring: a bare filename marks the whole module.
# The one deliberate compile in the set is test_short_sequence_ate (~45 s),
# the full end-to-end per-sweep program; everything else avoids fresh
# process_sweep compiles.
# ---------------------------------------------------------------------------
_SMOKE = (
    "test_config.py",                                            # whole module, <2 s
    "test_lie.py::TestExpLog::test_log_roundtrip",
    "test_lie.py::TestQuaternionOps::test_mul_matches_scipy",
    "test_lie.py::TestLinearSo3InterpApprox",
    "test_spline.py::TestLsFitInterpolator::test_f32",
    "test_eigh3.py::TestEigh3::test_f32",
    "test_dfsum.py::test_df_cumsum_matches_f64",
    "test_window.py::TestInsertSurfels::test_insert_into_free_slots",
    "test_imu.py::TestPropagation::test_matches_sequential_reference",
    "test_imu.py::TestInterpPose::test_undistort_identity",
    "test_factors.py::TestSurfelFactor::test_unary_jacobian_matches_autodiff",
    "test_match.py::TestSelfMatch::test_exact_vs_oracle",
    "test_match.py::TestCrossMatch::test_exact_vs_oracle",
    "test_surfel.py::TestExtraction::test_time_gap_clustering",
    # solver coverage comes from the end-to-end ATE test below (its compiled
    # program contains the full LM solve); a standalone solver test pays its
    # own ~20 s solve_window compile and blows the budget
    "test_pcg_pallas.py::TestFusedPcg::test_solves_the_system",
    "test_knn_pallas.py::TestKnnBinsKernel::test_matches_bins_oracle",
    "test_rosbag.py::TestRoundTrip::test_write_read",
    "test_rosbag.py::TestCorruption",
    "test_rosbag.py::TestFieldQuirks::test_unknown_message_types_skipped",
    "test_stream.py::TestProtocol",
    "test_stream.py::TestBoundedQueueReader::test_drop_oldest_counted",
    "test_native.py::TestFeeder::test_filter_matches_python",
    "test_native.py::TestResampler::test_matches_python_resampler",
    "test_utils_io.py::TestViz::test_ellipsoids",
    "test_live_viewer.py::test_viewer_serves_page_and_state",
    "test_se3_checkpoint.py::TestRigid3::test_compose_matches_matrix",
    "test_regimes.py::TestVoxelKeysFarFromOrigin::test_extreme_coords_unique",
    "test_batch.py::test_batch_size_must_divide_mesh",
    "test_pipeline.py::TestInputValidation",
    "test_pipeline.py::TestEndToEnd::test_short_sequence_ate",
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for it in items:
        if any(s in it.nodeid for s in _SMOKE):
            it.add_marker(pytest.mark.smoke)
