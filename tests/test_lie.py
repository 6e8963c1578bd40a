"""Lie-group math tests.

Mirrors the reference's utils_test.cc identities and extends with property tests
(round-trips, finite differences against closed-form Jacobians) the reference lacks.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from wildcat_slam_tpu.ops import lie


def _rand_vecs(n, scale=3.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-scale, scale, size=(n, 3))


def _scipy_quat_wxyz(rotvecs):
    q = R.from_rotvec(rotvecs).as_quat()  # xyzw
    return np.concatenate([q[:, 3:4], q[:, :3]], axis=1)


class TestExpLog:
    def test_exp_matches_scipy(self):
        v = _rand_vecs(512)
        q = np.asarray(lie.exp_quat(jnp.asarray(v)))
        q_ref = _scipy_quat_wxyz(v)
        # quaternion sign ambiguity
        sign = np.sign(np.sum(q * q_ref, axis=1, keepdims=True))
        np.testing.assert_allclose(q * sign, q_ref, atol=1e-12)

    def test_log_roundtrip(self):
        # keep |v| < pi: beyond that, log returns the principal value, not v
        rng = np.random.default_rng(0)
        axis = rng.normal(size=(512, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        v = axis * rng.uniform(0, 3.1, size=(512, 1))
        out = np.asarray(lie.log_quat(lie.exp_quat(jnp.asarray(v))))
        np.testing.assert_allclose(out, v, atol=1e-10)

    def test_small_angle(self):
        v = _rand_vecs(64, scale=1e-9)
        out = np.asarray(lie.log_quat(lie.exp_quat(jnp.asarray(v))))
        np.testing.assert_allclose(out, v, atol=1e-15)

    def test_log_negative_w(self):
        # angle near pi: w close to 0; Sophus log still returns the (-pi,pi] vector
        rng = np.random.default_rng(3)
        axis = rng.normal(size=(64, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        v = axis * 3.1
        out = np.asarray(lie.log_quat(lie.exp_quat(jnp.asarray(v))))
        np.testing.assert_allclose(out, v, atol=1e-9)

    def test_exp_matrix_matches_scipy(self):
        v = _rand_vecs(128)
        m = np.asarray(lie.exp_matrix(jnp.asarray(v)))
        np.testing.assert_allclose(m, R.from_rotvec(v).as_matrix(), atol=1e-12)


class TestJacobians:
    def test_jl_inv_is_inverse(self):
        # utils_test.cc:5-13
        v = jnp.asarray(_rand_vecs(128))
        jl = np.asarray(lie.jl(v))
        jli = np.asarray(lie.jl_inv(v))
        prod = np.einsum("nij,njk->nik", jl, jli)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-10)

    def test_jl_equals_jr_neg(self):
        # utils_test.cc:15-21
        v = jnp.asarray(_rand_vecs(128))
        np.testing.assert_allclose(np.asarray(lie.jl(v)), np.asarray(lie.jr(-v)), atol=1e-12)

    def test_jr_finite_difference(self):
        # Jr is defined by: Exp(v + dv) ~ Exp(v) Exp(Jr(v) dv)
        rng = np.random.default_rng(1)
        for _ in range(20):
            v = rng.uniform(-2, 2, size=3)
            jr = np.asarray(lie.jr(jnp.asarray(v)))
            h = 1e-7
            num = np.zeros((3, 3))
            base = R.from_rotvec(v)
            for k in range(3):
                dv = np.zeros(3)
                dv[k] = h
                delta = (base.inv() * R.from_rotvec(v + dv)).as_rotvec()
                num[:, k] = delta / h
            np.testing.assert_allclose(jr, num, atol=1e-5)

    def test_small_angle_jacobians(self):
        v = jnp.asarray(_rand_vecs(16, scale=1e-8))
        np.testing.assert_allclose(np.asarray(lie.jl(v)), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-7)
        np.testing.assert_allclose(np.asarray(lie.jl_inv(v)), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-7)

    def test_continuity_across_taylor_switch(self):
        # values straddling the Taylor switch points must agree to ~machine eps
        for switch in [1e-8, 0.01]:  # tiny-guard and cancellation switch (f64)
            d = 1e-9  # straddle narrow enough that true variation is ~1e-11*switch
            v = jnp.asarray(
                np.array([[switch * (1 - d), 1e-12, 0], [switch * (1 + d), 1e-12, 0]]),
                dtype=jnp.float64,
            )
            jl = np.asarray(lie.jl(v))
            np.testing.assert_allclose(jl[0], jl[1], atol=1e-12)
            jli = np.asarray(lie.jl_inv(v))
            np.testing.assert_allclose(jli[0], jli[1], atol=1e-12)


class TestQuaternionOps:
    def test_mul_matches_scipy(self):
        v1, v2 = _rand_vecs(128, seed=1), _rand_vecs(128, seed=2)
        qa, qb = lie.exp_quat(jnp.asarray(v1)), lie.exp_quat(jnp.asarray(v2))
        got = np.asarray(lie.quat_mul(qa, qb))
        ref = (R.from_rotvec(v1) * R.from_rotvec(v2)).as_matrix()
        np.testing.assert_allclose(np.asarray(lie.quat_to_matrix(jnp.asarray(got))), ref, atol=1e-12)

    def test_rotate_matches_matrix(self):
        v = _rand_vecs(128, seed=3)
        x = _rand_vecs(128, seed=4)
        q = lie.exp_quat(jnp.asarray(v))
        got = np.asarray(lie.quat_rotate(q, jnp.asarray(x)))
        ref = np.einsum("nij,nj->ni", R.from_rotvec(v).as_matrix(), x)
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_conj_rotate_inverse(self):
        v, x = _rand_vecs(32, seed=5), _rand_vecs(32, seed=6)
        q = lie.exp_quat(jnp.asarray(v))
        out = lie.quat_rotate(lie.quat_conj(q), lie.quat_rotate(q, jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-12)

    def test_slerp_matches_scipy(self):
        from scipy.spatial.transform import Slerp
        v1, v2 = _rand_vecs(64, seed=7), _rand_vecs(64, seed=8)
        t = 0.37
        got = np.asarray(lie.quat_slerp(lie.exp_quat(jnp.asarray(v1)), lie.exp_quat(jnp.asarray(v2)), jnp.asarray(t)))
        for i in range(64):
            s = Slerp([0.0, 1.0], R.from_rotvec([v1[i], v2[i]]))
            ref = s([t]).as_quat()[0]  # xyzw
            ref = np.array([ref[3], ref[0], ref[1], ref[2]])
            sign = np.sign(np.dot(got[i], ref))
            np.testing.assert_allclose(got[i] * sign, ref, atol=1e-9)

    def test_slerp_endpoint_and_parallel(self):
        v = _rand_vecs(8, seed=9)
        q = lie.exp_quat(jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(lie.quat_slerp(q, q, jnp.asarray(0.5))), np.asarray(q), atol=1e-12)
        q2 = lie.exp_quat(jnp.asarray(_rand_vecs(8, seed=10)))
        np.testing.assert_allclose(np.asarray(lie.quat_slerp(q, q2, jnp.asarray(0.0))), np.asarray(q), atol=1e-9)

    def test_angular_distance(self):
        v = _rand_vecs(32, seed=11)
        q = lie.exp_quat(jnp.asarray(v))
        d = np.asarray(lie.quat_angular_distance(q, q))
        np.testing.assert_allclose(d, 0.0, atol=1e-8)


class TestLinearSo3InterpApprox:
    def test_lerp_close_to_slerp_for_small_rotations(self):
        # spline_interpolation_test.cc:50-77: for rotations < 10 deg, linear
        # interpolation of rotation vectors is within 0.04 deg of slerp.
        rng = np.random.default_rng(12)
        n = 10000
        ra = rng.uniform(-1, 1, (n, 3)) * (10 * np.pi / 180)
        rb = rng.uniform(-1, 1, (n, 3)) * (10 * np.pi / 180)
        s = 0.5
        q_slerp = lie.quat_slerp(lie.exp_quat(jnp.asarray(ra)), lie.exp_quat(jnp.asarray(rb)), jnp.asarray(s))
        q_lin = lie.exp_quat(jnp.asarray((1 - s) * ra + s * rb))
        err = np.asarray(lie.quat_angular_distance(q_slerp, q_lin)) * 180 / np.pi
        assert err.max() < 0.04


class TestFloat32:
    def test_f32_roundtrip_tolerance(self):
        rng = np.random.default_rng(0)
        axis = rng.normal(size=(256, 3))
        axis /= np.linalg.norm(axis, axis=1, keepdims=True)
        v = axis * rng.uniform(0, 3.1, size=(256, 1))  # |v| < pi
        v32 = jnp.asarray(v, dtype=jnp.float32)
        out = np.asarray(lie.log_quat(lie.exp_quat(v32)))
        np.testing.assert_allclose(out, v, atol=1e-6)

    def test_f32_jacobians(self):
        v = jnp.asarray(_rand_vecs(256), dtype=jnp.float32)
        jlm = np.asarray(lie.jl(v))
        jli = np.asarray(lie.jl_inv(v))
        prod = np.einsum("nij,njk->nik", jlm, jli)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5)
