"""Spline tests — ports of spline_interpolation_test.cc cases plus batched checks."""

import numpy as np
import jax.numpy as jnp

from wildcat_slam_tpu.ops import spline


def v1(x):
    return jnp.asarray([float(x)])


class TestBSplineApprox:
    def test_arithmetic_progression(self):
        # spline_interpolation_test.cc:10-16
        for s, expect in [(0.0, 2.0), (1.0, 3.0), (0.4, 2.4), (0.5, 2.5)]:
            got = spline.cubic_bspline_approx(v1(1), v1(2), v1(3), v1(4), s)
            np.testing.assert_allclose(np.asarray(got), [expect], atol=1e-12)

    def test_const(self):
        # spline_interpolation_test.cc:18-23
        for s in [0.0, 1.0, 0.5, 0.4]:
            got = spline.cubic_bspline_approx(v1(2), v1(2), v1(2), v1(2), s)
            np.testing.assert_allclose(np.asarray(got), [2.0], atol=1e-12)

    def test_batched(self):
        s = jnp.linspace(0, 1, 16)
        got = spline.cubic_bspline_approx(v1(1), v1(2), v1(3), v1(4), s)
        np.testing.assert_allclose(np.asarray(got)[:, 0], 2 + np.linspace(0, 1, 16), atol=1e-12)


class TestHermite:
    def test_arithmetic_progression(self):
        # spline_interpolation_test.cc:25-31
        for s, expect in [(0.0, 2.0), (1.0, 3.0), (0.4, 2.4), (0.5, 2.5)]:
            got = spline.cubic_hermite(-1, v1(1), 0, v1(2), 1, v1(3), 2, v1(4), s)
            np.testing.assert_allclose(np.asarray(got), [expect], atol=1e-12)

    def test_const(self):
        for s in [0.0, 1.0, 0.5, 0.4]:
            got = spline.cubic_hermite(-1, v1(2), 0, v1(2), 1, v1(2), 2, v1(2), s)
            np.testing.assert_allclose(np.asarray(got), [2.0], atol=1e-12)

    def test_begin_end(self):
        # spline_interpolation_test.cc:38-41
        got0 = spline.cubic_hermite(-1, v1(2), 0, v1(3), 1, v1(1), 2, v1(2), 0.0)
        got1 = spline.cubic_hermite(-1, v1(2), 0, v1(3), 1, v1(1), 2, v1(2), 1.0)
        np.testing.assert_allclose(np.asarray(got0), [3.0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(got1), [1.0], atol=1e-12)


class TestLsFitInterpolator:
    def test_fit_passes_through_samples(self):
        # spline_interpolation_test.cc:79-96
        timestamps = jnp.asarray([0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0])
        p = jnp.asarray(
            [
                [1, 1, 1], [2, 3, 2], [4, 5, 5], [6, 6, 3],
                [5, 4, 1], [6, 7, 1], [9, 9, 8], [12, 15, 11],
            ],
            dtype=jnp.float64,
        )
        vals, ok = spline.fit_and_eval(timestamps, p, timestamps)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(vals), np.asarray(p), atol=1e-6)

    def test_out_of_range_flagged(self):
        timestamps = jnp.linspace(0.0, 1.0, 10)
        p = jnp.stack([timestamps, timestamps**2, timestamps**3], axis=1)
        _, ok = spline.fit_and_eval(timestamps, p, jnp.asarray([-0.1, 0.5, 1.1]))
        np.testing.assert_array_equal(np.asarray(ok), [False, True, False])

    def test_smooth_function_accuracy(self):
        # dense query between knots on a smooth curve should be accurate
        t = jnp.linspace(0.0, 1.0, 30)
        p = jnp.stack([jnp.sin(2 * t), jnp.cos(3 * t), t * t], axis=1)
        tq = jnp.linspace(0.0, 1.0, 200)
        vals, ok = spline.fit_and_eval(t, p, tq)
        ref = np.stack([np.sin(2 * np.asarray(tq)), np.cos(3 * np.asarray(tq)), np.asarray(tq) ** 2], axis=1)
        assert bool(jnp.all(ok))
        # boundary wiggle of the clamped LS fit dominates; interior is ~1e-4
        np.testing.assert_allclose(np.asarray(vals), ref, atol=6e-3)

    def test_f32(self):
        t = jnp.linspace(0.0, 1.0, 20, dtype=jnp.float32)
        p = jnp.stack([t, 2 * t, -t], axis=1).astype(jnp.float32)
        vals, _ = spline.fit_and_eval(t, p, t)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(p), atol=1e-4)
