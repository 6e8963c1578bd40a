"""WildcatConfig construction-time validation.

The reference hard-codes every knob (lio_config.h:8-46), so it cannot be
misconfigured; the rebuild exposes them as dataclass fields and must therefore
reject invalid values at construction, not as an opaque trace-time failure
(e.g. outer_iter_num_max=0 previously surfaced as a KeyError deep inside the
jitted pipeline's packed-output build).
"""

import dataclasses

import pytest

from wildcat_slam_tpu.config import WildcatConfig


class TestConfigValidation:
    def test_default_config_valid(self):
        WildcatConfig()  # must not raise

    def test_outer_iter_zero_rejected(self):
        with pytest.raises(ValueError, match="outer_iter_num_max"):
            WildcatConfig(outer_iter_num_max=0)

    def test_inner_iter_zero_rejected(self):
        with pytest.raises(ValueError, match="inner_iter_num_max"):
            WildcatConfig(inner_iter_num_max=0)

    @pytest.mark.parametrize("field", [
        "max_points_per_sweep", "max_sample_states", "max_imu_states",
        "max_surfels_per_sweep", "max_surfels_sliding", "max_surfels_fixed",
        "max_correspondences", "max_voxels_per_sweep", "max_leaves_per_sweep",
        "pcg_iters",
    ])
    def test_nonpositive_capacity_rejected(self, field):
        with pytest.raises(ValueError, match=field):
            WildcatConfig(**{field: 0})
        with pytest.raises(ValueError, match=field):
            WildcatConfig(**{field: -3})

    @pytest.mark.parametrize("field", [
        "imu_rate", "sample_dt", "sweep_duration", "sliding_window_duration",
        "fixed_window_duration", "voxel_size", "decimate_voxel_size",
    ])
    def test_nonpositive_duration_rejected(self, field):
        with pytest.raises(ValueError, match=field):
            WildcatConfig(**{field: 0.0})

    def test_bad_solver_name_rejected(self):
        with pytest.raises(ValueError, match="linear_solver"):
            WildcatConfig(linear_solver="cholmod")

    def test_bad_dtype_rejected(self):
        with pytest.raises(ValueError, match="dtype"):
            WildcatConfig(dtype="bfloat16")

    def test_bad_degeneracy_ratio_rejected(self):
        with pytest.raises(ValueError, match="degeneracy_warn_ratio"):
            WildcatConfig(degeneracy_warn_ratio=1.0)
        with pytest.raises(ValueError, match="degeneracy_warn_ratio"):
            WildcatConfig(degeneracy_warn_ratio=-0.1)
        WildcatConfig(degeneracy_warn_ratio=0.0)  # 0 disables — valid

    def test_replace_revalidates(self):
        cfg = WildcatConfig()
        with pytest.raises(ValueError, match="outer_iter_num_max"):
            cfg.replace(outer_iter_num_max=0)

    def test_json_roundtrip_still_works(self):
        cfg = WildcatConfig(max_points_per_sweep=4096)
        cfg2 = WildcatConfig.from_json(cfg.to_json())
        assert dataclasses.asdict(cfg) == dataclasses.asdict(cfg2)
