"""Fused KNN kernel (ops/knn_pallas.py) — interpret-mode semantics on CPU.

Three layers: (1) exact equivalence to a numpy per-bin-argmin oracle — the
kernel's reduction is deterministic, not statistical; (2) exactness whenever
n_bins >= T (each bin holds at most one target, so the result IS the true
top-k); (3) realized recall vs exact top-k on a realistic descriptor cloud at
shipped-like density, which must beat the 0.95 recall_target the unfused
approx_max_k path requests (match.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wildcat_slam_tpu.ops.knn_pallas import knn_topk_fused


def _np_bins_oracle(dq, dt, k, n_bins):
    """Reference: full d2, per-(index mod n_bins) argmin, exact top-k over bins."""
    q, t = dq.shape[0], dt.shape[0]
    d2 = ((dq[:, None, :] - dt[None, :, :]) ** 2).sum(-1)
    s = (dt * dt).sum(-1)[None, :] - 2.0 * dq @ dt.T  # the kernel's score
    pad = (-t) % n_bins
    far = 1e6
    if pad:
        dt_pad = np.full((pad, dt.shape[1]), far)
        s = np.concatenate(
            [s, (dt_pad * dt_pad).sum(-1)[None, :] - 2.0 * dq @ dt_pad.T], axis=1)
        d2 = np.concatenate([d2, np.full((q, pad), np.inf)], axis=1)
    tt = s.shape[1]
    sb = s.reshape(q, tt // n_bins, n_bins)
    arg = sb.argmin(axis=1)                       # first min wins ties
    bin_idx = arg * n_bins + np.arange(n_bins)[None, :]
    bin_val = np.take_along_axis(s, bin_idx, axis=1)
    order = np.argsort(bin_val, axis=1, kind="stable")[:, :k]
    knn = np.take_along_axis(bin_idx, order, axis=1)
    return knn


def _cloud(rng, n, spread=5.0):
    c = rng.uniform(-spread, spread, (n, 3))
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return np.concatenate([c, nrm / 0.0873], axis=1).astype(np.float32)


class TestKnnBinsKernel:
    @pytest.mark.parametrize("mode", ["mxu", "vpu"])
    def test_matches_bins_oracle(self, mode):
        rng = np.random.default_rng(0)
        dq = _cloud(rng, 256)
        dt = _cloud(rng, 1024)
        dq8 = np.pad(dq, ((0, 0), (0, 2)))
        dt8 = np.pad(dt, ((0, 0), (0, 2)))
        knn, d2 = knn_topk_fused(jnp.asarray(dq8), jnp.asarray(dt8), 10,
                                 mode=mode, n_bins=256, interpret=True)
        ref = _np_bins_oracle(dq8.astype(np.float64), dt8.astype(np.float64),
                              10, 256)
        # f32 near-ties can swap adjacent ranks; compare as sets per row
        agree = np.mean([len(set(a) & set(b)) / 10.0
                         for a, b in zip(np.asarray(knn), ref)])
        assert agree >= 0.995, agree
        # returned distances are true squared distances of the returned index
        full = ((dq8[:, None, :] - dt8[None, :, :]) ** 2).sum(-1)
        got = np.take_along_axis(full, np.asarray(knn), axis=1)
        np.testing.assert_allclose(np.asarray(d2), got, rtol=1e-3, atol=1e-2)

    def test_mxu_vpu_modes_agree(self):
        rng = np.random.default_rng(5)
        dq = np.pad(_cloud(rng, 128), ((0, 0), (0, 2)))
        dt = np.pad(_cloud(rng, 700), ((0, 0), (0, 2)))
        a, da = knn_topk_fused(jnp.asarray(dq), jnp.asarray(dt), 10,
                               mode="mxu", n_bins=256, interpret=True)
        b, db = knn_topk_fused(jnp.asarray(dq), jnp.asarray(dt), 10,
                               mode="vpu", n_bins=256, interpret=True)
        agree = np.mean([len(set(x) & set(y)) / 10.0
                         for x, y in zip(np.asarray(a), np.asarray(b))])
        assert agree >= 0.995, agree
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   rtol=1e-3, atol=1e-2)

    def test_exact_when_bins_cover_targets(self):
        # T <= n_bins: one target per bin, the kernel result IS exact top-k;
        # also exercises Q/T padding (neither a multiple of the block sizes)
        rng = np.random.default_rng(1)
        dq = np.pad(_cloud(rng, 37), ((0, 0), (0, 2)))
        dt = np.pad(_cloud(rng, 300), ((0, 0), (0, 2)))
        knn, _ = knn_topk_fused(jnp.asarray(dq), jnp.asarray(dt), 10,
                                interpret=True)
        d2 = ((dq[:, None, :].astype(np.float64) - dt[None, :, :]) ** 2).sum(-1)
        ref = np.argsort(d2, axis=1, kind="stable")[:, :10]
        for a, b in zip(np.asarray(knn), ref):
            assert set(a) == set(b)

    def test_recall_vs_exact_at_density(self):
        # realistic surfel-descriptor cloud, shipped k: recall must beat the
        # 0.95 target the approx_max_k path is configured with
        rng = np.random.default_rng(2)
        dt = np.pad(_cloud(rng, 3072), ((0, 0), (0, 2)))
        dq = dt[:512]
        knn, _ = knn_topk_fused(jnp.asarray(dq), jnp.asarray(dt), 10,
                                n_bins=512, interpret=True)
        d2 = ((dq[:, None, :].astype(np.float64) - dt[None, :, :]) ** 2).sum(-1)
        ref = np.argsort(d2, axis=1, kind="stable")[:, :10]
        recall = np.mean([len(set(a) & set(b)) / 10.0
                          for a, b in zip(np.asarray(knn), ref)])
        assert recall >= 0.95, recall

    @pytest.mark.full
    def test_recall_at_gated_shape_density(self):
        # the kernel only runs past the measured 2^30 crossover (Q=16384,
        # T=65536+); recall is governed by the k/n_bins collision rate, so a
        # T=16384 cloud at the SAME n_bins=512 and k=10 is the density proxy
        # that CPU interpret mode can afford. The ~98% analytic recall claim
        # (module doc) must hold here, not just on the real-TPU measurement.
        rng = np.random.default_rng(7)
        dt = np.pad(_cloud(rng, 16384, spread=12.0), ((0, 0), (0, 2)))
        dq = dt[:2048]
        knn, _ = knn_topk_fused(jnp.asarray(dq), jnp.asarray(dt), 10,
                                n_bins=512, interpret=True)
        d2 = ((dq[:, None, :].astype(np.float64) - dt[None, :, :]) ** 2).sum(-1)
        ref = np.argsort(d2, axis=1, kind="stable")[:, :10]
        recall = np.mean([len(set(a) & set(b)) / 10.0
                          for a, b in zip(np.asarray(knn), ref)])
        assert recall >= 0.95, recall

    def test_masked_far_targets_never_selected(self):
        rng = np.random.default_rng(3)
        dt = np.pad(_cloud(rng, 256), ((0, 0), (0, 2)))
        dt[100:] = 1e6  # masked rows, as match.py's vt masking produces
        dq = dt[:32]
        knn, _ = knn_topk_fused(jnp.asarray(dq), jnp.asarray(dt), 10,
                                n_bins=128, interpret=True)
        assert np.asarray(knn).max() < 100
