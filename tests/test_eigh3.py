"""Closed-form batched 3x3 symmetric eigendecomposition vs numpy.linalg.eigh."""

import numpy as np
import jax.numpy as jnp

from wildcat_slam_tpu.ops.eigh3 import eigh3, min_eigpair3


def _check(a_np, val_atol=1e-9, vec_atol=1e-7):
    vals, vecs = eigh3(jnp.asarray(a_np))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals, ref_vecs = np.linalg.eigh(a_np)
    np.testing.assert_allclose(vals, ref_vals, atol=val_atol)
    # eigenvector property: A v = lambda v, and orthonormality
    for k in range(3):
        av = np.einsum("...ij,...j->...i", a_np, vecs[..., :, k])
        lv = vals[..., k : k + 1] * vecs[..., :, k]
        np.testing.assert_allclose(av, lv, atol=vec_atol)
    gram = np.einsum("...ki,...kj->...ij", vecs, vecs)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape), atol=1e-10)


def _rand_sym(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, 3, 3)) * scale
    return (m + m.transpose(0, 2, 1)) / 2


class TestEigh3:
    def test_random(self):
        _check(_rand_sym(2048))

    def test_random_large_scale(self):
        _check(_rand_sym(512, seed=1, scale=1e4), val_atol=1e-5, vec_atol=1e-3)

    def test_random_small_scale(self):
        _check(_rand_sym(512, seed=2, scale=1e-6), val_atol=1e-15, vec_atol=1e-13)

    def test_diagonal(self):
        a = np.zeros((6, 3, 3))
        diags = [(1, 2, 3), (3, 2, 1), (2, 1, 3), (1.0, 1.0, 2.0), (5.0, 1.0, 1.0), (2.0, 2.0, 2.0)]
        for i, d in enumerate(diags):
            a[i] = np.diag(d)
        _check(a)

    def test_repeated_pair(self):
        # rotate diag(1, 1, 5) and diag(1, 5, 5) into general position
        rng = np.random.default_rng(3)
        mats = []
        for d in [(1.0, 1.0, 5.0), (1.0, 5.0, 5.0), (0.0, 0.0, 1.0), (-2.0, -2.0, 7.0)]:
            for _ in range(64):
                q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
                mats.append(q @ np.diag(d) @ q.T)
        _check(np.asarray(mats), val_atol=1e-8, vec_atol=1e-6)

    def test_near_degenerate(self):
        rng = np.random.default_rng(4)
        mats = []
        for gap in [1e-3, 1e-6, 1e-9]:
            for _ in range(32):
                q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
                mats.append(q @ np.diag([1.0, 1.0 + gap, 3.0]) @ q.T)
        _check(np.asarray(mats), val_atol=1e-8, vec_atol=2e-6)

    def test_zero_matrix(self):
        _check(np.zeros((2, 3, 3)))

    def test_planar_covariances(self):
        # realistic plane-fit input: thin-disc covariances
        rng = np.random.default_rng(5)
        mats = []
        for _ in range(256):
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            d = np.diag([1e-6 * rng.uniform(0.1, 10), 0.05 * rng.uniform(0.5, 2), 0.06 * rng.uniform(0.5, 2)])
            mats.append(q @ d @ q.T)
        a = np.asarray(mats)
        lam_min, v_min = min_eigpair3(jnp.asarray(a))
        ref_vals, ref_vecs = np.linalg.eigh(a)
        np.testing.assert_allclose(np.asarray(lam_min), ref_vals[:, 0], atol=1e-10)
        dots = np.abs(np.einsum("ni,ni->n", np.asarray(v_min), ref_vecs[:, :, 0]))
        np.testing.assert_allclose(dots, 1.0, atol=1e-7)

    def test_f32(self):
        a = _rand_sym(512, seed=6).astype(np.float32)
        vals, vecs = eigh3(jnp.asarray(a))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        ref_vals, _ = np.linalg.eigh(a.astype(np.float64))
        np.testing.assert_allclose(vals, ref_vals, atol=2e-5)
        for k in range(3):
            av = np.einsum("nij,nj->ni", a.astype(np.float64), vecs[:, :, k].astype(np.float64))
            lv = vals[:, k : k + 1] * vecs[:, :, k]
            np.testing.assert_allclose(av, lv, atol=5e-4)
