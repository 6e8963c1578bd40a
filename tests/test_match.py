"""Correspondence matching vs a sequential oracle of the reference Match loop."""

import numpy as np
import jax.numpy as jnp

from wildcat_slam_tpu.odometry.match import match_surfels

ANG = 5.0 * np.pi / 180.0


def oracle_match(cq, nq, tq, ct, nt, tt, self_match, k=10):
    """Literal port of KnnSurfelMatcher::Match (knn_surfel_matcher.cc:16-49)."""
    dq = np.concatenate([cq / 1.0, nq / ANG], axis=1)
    dt_ = np.concatenate([ct / 1.0, nt / ANG], axis=1)
    d2 = ((dq[:, None, :] - dt_[None, :, :]) ** 2).sum(-1)
    knn = np.argsort(d2, axis=1, kind="stable")[:, :k]
    pairs = set()
    out = []
    for i in range(len(cq)):
        for j in knn[i]:
            if abs(tq[i] - tt[j]) < 0.06:
                continue
            cosang = np.clip(np.dot(nq[i], nt[j]), -1, 1)
            if np.arccos(cosang) > ANG:
                continue
            if abs(np.dot(nq[i], cq[i] - ct[j])) > 0.1:
                continue
            key = (min(i, j), max(i, j)) if self_match else (i, j)
            if key in pairs:
                continue
            pairs.add(key)
            out.append((i, j))
            break
    return out


def make_surfels(n, seed, spread=4.0):
    """Clustered surfels so matches exist: a few planes observed at many times."""
    rng = np.random.default_rng(seed)
    n_planes = max(2, n // 20)
    centers, norms, times = [], [], []
    for p in range(n_planes):
        c0 = rng.uniform(-spread, spread, 3)
        nv = rng.normal(size=3)
        nv /= np.linalg.norm(nv)
        m = n // n_planes
        for _ in range(m):
            centers.append(c0 + rng.normal(scale=0.15, size=3) - np.dot(rng.normal(scale=0.15, size=3), nv) * nv)
            d = rng.normal(scale=0.01, size=3)
            v = nv + d
            norms.append(v / np.linalg.norm(v))
            times.append(rng.uniform(0, 3.0))
    n_out = len(centers)
    return (np.asarray(centers), np.asarray(norms), np.asarray(times), n_out)


def run_module(cq, nq, tq, ct, nt, tt, self_match, q_cap=256, t_cap=256):
    def pad(x, cap, dim=None):
        shape = (cap,) if dim is None else (cap, dim)
        out = np.zeros(shape)
        out[: len(x)] = x
        return jnp.asarray(out)

    vq = jnp.arange(q_cap) < len(cq)
    vt = jnp.arange(t_cap) < len(ct)
    iq, it, valid, _nd = match_surfels(
        pad(cq, q_cap, 3), pad(nq, q_cap, 3), pad(tq, q_cap),
        jnp.asarray(vq),
        pad(ct, t_cap, 3), pad(nt, t_cap, 3), pad(tt, t_cap),
        jnp.asarray(vt),
        k=10, max_pairs=512, self_match=self_match,
        approx=False,  # the sequential-oracle comparison needs exact knn ranks
    )
    v = np.asarray(valid)
    return list(zip(np.asarray(iq)[v].tolist(), np.asarray(it)[v].tolist()))


class TestCrossMatch:
    def test_exact_vs_oracle(self):
        # no dedup interactions in cross-match -> must be exactly the oracle
        for seed in range(4):
            cq, nq, tq, _ = make_surfels(60, seed)
            ct, nt, tt, _ = make_surfels(80, seed + 50)
            got = run_module(cq, nq, tq, ct, nt, tt, self_match=False)
            ref = oracle_match(cq, nq, tq, ct, nt, tt, self_match=False)
            assert sorted(got) == sorted(ref), f"seed {seed}: {len(got)} vs {len(ref)}"

    def test_empty_target(self):
        cq, nq, tq, _ = make_surfels(40, 0)
        got = run_module(cq, nq, tq, cq[:0], nq[:0], tq[:0], self_match=False)
        assert got == []


class TestSelfMatch:
    def test_exact_vs_oracle(self):
        # the fixed-point matcher solves the sequential recurrence exactly
        # (match.py module doc) — the pair set must EQUAL the literal
        # sequential oracle, every seed
        total_ref = 0
        for seed in range(10):
            c, n, t, _ = make_surfels(100, seed + 10)
            got = run_module(c, n, t, c, n, t, self_match=True)
            ref = oracle_match(c, n, t, c, n, t, self_match=True)
            gs = {tuple(sorted(p)) for p in got}
            rs = {tuple(sorted(p)) for p in ref}
            assert len(gs) == len(got), "duplicate unordered pair emitted"
            assert gs == rs, (
                f"seed {seed}: {len(gs & rs)} common, "
                f"module-only {sorted(gs - rs)}, oracle-only {sorted(rs - gs)}")
            total_ref += len(rs)
        assert total_ref > 40  # the scenes actually exercise matching

    def test_exact_vs_oracle_dense_dedup_chains(self):
        # few planes + many surfels -> long dedup chains (the regime where the
        # old round-parallel scheme diverged)
        for seed in range(4):
            c, n, t, _ = make_surfels(200, seed + 90, spread=1.5)
            got = run_module(c, n, t, c, n, t, self_match=True)
            ref = oracle_match(c, n, t, c, n, t, self_match=True)
            gs = {tuple(sorted(p)) for p in got}
            rs = {tuple(sorted(p)) for p in ref}
            assert gs == rs, f"seed {seed}: {len(gs ^ rs)} mismatched pairs"

    def test_filters_respected(self):
        c, n, t, _ = make_surfels(100, 3)
        got = run_module(c, n, t, c, n, t, self_match=True)
        for i, j in got:
            assert abs(t[i] - t[j]) >= 0.06
            assert np.arccos(np.clip(np.dot(n[i], n[j]), -1, 1)) <= ANG
            assert abs(np.dot(n[i], c[i] - c[j])) <= 0.1
            assert i != j


class TestKnnSearch:
    def test_self_query_returns_self(self):
        # knn_surfel_matcher_test.cc:19-43: random 6-D points, self-query must
        # return the point itself as the nearest neighbor
        from wildcat_slam_tpu.odometry.match import knn_search

        rng = np.random.default_rng(0)
        n, cap = 1000, 1024
        c = np.zeros((cap, 3)); c[:n] = rng.uniform(-50, 50, (n, 3))
        nv = np.zeros((cap, 3)); nv[:n] = rng.normal(size=(n, 3))
        nv[:n] /= np.linalg.norm(nv[:n], axis=1, keepdims=True)
        v = np.arange(cap) < n
        idx, d2 = knn_search(jnp.asarray(c), jnp.asarray(nv), jnp.asarray(v),
                             jnp.asarray(c), jnp.asarray(nv), jnp.asarray(v), k=10,
                             approx=False)
        idx, d2 = np.asarray(idx), np.asarray(d2)
        np.testing.assert_array_equal(idx[:n, 0], np.arange(n))
        np.testing.assert_allclose(d2[:n, 0], 0.0, atol=1e-4)

    def test_approx_recall_vs_exact(self):
        # the production path uses approx_max_k (recall_target 0.95); check the
        # realized recall against exact top-k on a realistic descriptor cloud
        from wildcat_slam_tpu.odometry.match import knn_search

        rng = np.random.default_rng(1)
        n, cap = 3000, 4096
        c = np.zeros((cap, 3)); c[:n] = rng.uniform(-30, 30, (n, 3))
        nv = np.zeros((cap, 3)); nv[:n] = rng.normal(size=(n, 3))
        nv[:n] /= np.linalg.norm(nv[:n], axis=1, keepdims=True)
        v = np.arange(cap) < n
        a = [jnp.asarray(c), jnp.asarray(nv), jnp.asarray(v)]
        idx_a, _ = knn_search(*a, *a, k=10, approx=True)
        idx_e, _ = knn_search(*a, *a, k=10, approx=False)
        idx_a, idx_e = np.asarray(idx_a)[:n], np.asarray(idx_e)[:n]
        recall = np.mean([len(set(ra) & set(re)) / 10.0 for ra, re in zip(idx_a, idx_e)])
        # >= the shipped recall_target (0.95, match.py); the realized recall is
        # ~0.98-0.99, so a regression to the low 0.9s must fail here
        assert recall >= 0.95, recall
