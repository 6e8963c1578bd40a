"""Surfel extraction vs a direct numpy re-implementation of the reference octree.

The oracle below mirrors surfel_extraction.cc (BuildVoxelMap/InitOctoTree/
CutOctoTree/ExtractSurfelInfo/ClusterSurfels) literally; the module under test is
the flat sort+segment re-design. Both must produce the same surfel set.
"""

import numpy as np
import jax.numpy as jnp

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.odometry.surfel import extract_surfels


# ---------------------------------------------------------------------------
# Oracle: literal python port of the reference algorithm semantics
# ---------------------------------------------------------------------------

def _plane_fit(pts):
    center = pts.mean(axis=0)
    cov = (pts.T @ pts) / len(pts) - np.outer(center, center)
    vals, vecs = np.linalg.eigh(cov)
    return center, cov, vals, vecs


def _cluster_surfels(pts, ts, resolution, thr, likeness_min, out):
    # ClusterSurfels (surfel_extraction.cc:12-65)
    clusters = [[0]]
    for i in range(1, len(pts)):
        if ts[i] - ts[clusters[-1][-1]] > 0.05:
            clusters.append([i])
        else:
            clusters[-1].append(i)
    for cl in clusters:
        if len(cl) < 20:
            continue
        p = pts[cl]
        center, cov, vals, vecs = _plane_fit(p)
        likeness = 2 * (vals[1] - vals[0]) / vals.sum()
        if vals[0] > thr or likeness < likeness_min:
            continue
        norm = vecs[:, 0]
        if np.dot(norm, center) < 0:  # view point = origin
            norm = -norm
        out.append(dict(t=ts[cl].mean(), center=center, cov=cov, norm=norm,
                        resolution=resolution, std=np.sqrt(vals[0])))


def oracle_extract(pts, ts, cfg):
    thr, lk, minp = cfg.planer_threshold, cfg.min_plane_likeness, cfg.min_points_per_plane
    out = []

    def node_plane(p):
        _, _, vals, _ = _plane_fit(p)
        likeness = 2 * (vals[1] - vals[0]) / vals.sum()
        return vals[0] < thr and likeness > lk

    # level 0 voxels
    keys0 = np.floor(pts / cfg.voxel_size).astype(np.int64)
    vox = {}
    for i, k in enumerate(map(tuple, keys0)):
        vox.setdefault(k, []).append(i)

    for k0, idx0 in vox.items():
        if len(idx0) <= minp:
            continue
        p0 = pts[idx0]
        if node_plane(p0):
            _cluster_surfels(p0, ts[idx0], cfg.voxel_size, thr, lk, out)
        # force split either way (InitOctoTree)
        sub1 = {}
        for i in idx0:
            k1 = tuple(np.floor(pts[i] / (cfg.voxel_size / 2)).astype(np.int64))
            sub1.setdefault(k1, []).append(i)
        for k1, idx1 in sub1.items():
            if len(idx1) <= minp:
                continue
            p1 = pts[idx1]
            if node_plane(p1):
                _cluster_surfels(p1, ts[idx1], cfg.voxel_size / 2, thr, lk, out)
                continue  # planar level-1 node is a leaf
            sub2 = {}
            for i in idx1:
                k2 = tuple(np.floor(pts[i] / (cfg.voxel_size / 4)).astype(np.int64))
                sub2.setdefault(k2, []).append(i)
            for k2, idx2 in sub2.items():
                if len(idx2) <= minp:
                    continue
                p2 = pts[idx2]
                if node_plane(p2):
                    _cluster_surfels(p2, ts[idx2], cfg.voxel_size / 4, thr, lk, out)
    out.sort(key=lambda s: s["t"])
    return out


# ---------------------------------------------------------------------------
# Scene generators
# ---------------------------------------------------------------------------

def make_scene(seed=0, n_planes=6, pts_per_plane=400, noise=0.004, span=6.0):
    rng = np.random.default_rng(seed)
    pts, ts = [], []
    t0 = 0.0
    for k in range(n_planes):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        c = rng.uniform(-span, span, 3)
        u = np.cross(n, [1, 0.3, 0.2]); u /= np.linalg.norm(u)
        v = np.cross(n, u)
        uv = rng.uniform(-1.2, 1.2, (pts_per_plane, 2))
        p = c + uv[:, :1] * u + uv[:, 1:] * v + rng.normal(scale=noise, size=(pts_per_plane, 1)) * n
        pts.append(p)
        ts.append(np.sort(rng.uniform(t0, t0 + 0.45, pts_per_plane)))
    # interleave by time like a real sweep
    pts = np.concatenate(pts)
    ts = np.concatenate(ts)
    order = np.argsort(ts, kind="stable")
    return pts[order], ts[order]


def run_both(pts, ts, cfg, pad_to=8192):
    p = np.zeros((pad_to, 3), np.float64)
    t = np.zeros((pad_to,), np.float64)
    val = np.zeros((pad_to,), bool)
    p[: len(pts)] = pts
    t[: len(pts)] = ts
    val[: len(pts)] = True
    got = extract_surfels(jnp.asarray(p), jnp.asarray(t), jnp.asarray(val), cfg)
    got = {k: np.asarray(v) for k, v in got.items()}
    ref = oracle_extract(pts, ts, cfg)
    return got, ref


def check_match(got, ref):
    nv = int(got["valid"].sum())
    assert nv == len(ref), f"surfel count {nv} != oracle {len(ref)}"
    g_t = got["t"][got["valid"]]
    g_c = got["center"][got["valid"]]
    g_n = got["norm"][got["valid"]]
    g_res = got["resolution"][got["valid"]]
    g_std = got["std"][got["valid"]]
    # both sorted by time
    for i, s in enumerate(ref):
        assert abs(g_t[i] - s["t"]) < 1e-6, (i, g_t[i], s["t"])
        np.testing.assert_allclose(g_c[i], s["center"], atol=1e-6)
        d = abs(np.dot(g_n[i], s["norm"]))
        np.testing.assert_allclose(d, 1.0, atol=1e-6)
        assert g_res[i] == s["resolution"]
        np.testing.assert_allclose(g_std[i], s["std"], atol=1e-6)


class TestExtraction:
    def test_matches_oracle_basic(self):
        cfg = WildcatConfig(max_surfels_per_sweep=512, max_leaves_per_sweep=4096)
        pts, ts = make_scene(seed=0)
        got, ref = run_both(pts, ts, cfg)
        assert len(ref) > 0
        check_match(got, ref)

    def test_matches_oracle_many_seeds(self):
        cfg = WildcatConfig(max_surfels_per_sweep=512, max_leaves_per_sweep=4096)
        for seed in range(1, 5):
            pts, ts = make_scene(seed=seed, n_planes=4, pts_per_plane=300)
            got, ref = run_both(pts, ts, cfg)
            check_match(got, ref)

    def test_time_gap_clustering(self):
        # one plane observed in two passes separated by > 0.05 s -> 2 surfels
        cfg = WildcatConfig(max_surfels_per_sweep=512, max_leaves_per_sweep=4096)
        rng = np.random.default_rng(7)
        n = 120
        xy = rng.uniform(-0.35, 0.35, (n, 2))
        p = np.stack([xy[:, 0] + 0.4, xy[:, 1] + 0.4, rng.normal(scale=0.003, size=n) + 0.4], axis=1)
        t = np.concatenate([np.linspace(0, 0.02, n // 2), np.linspace(0.2, 0.22, n - n // 2)])
        got, ref = run_both(p, t, cfg)
        assert len(ref) >= 2
        check_match(got, ref)

    def test_volumetric_blob(self):
        # uniform blob: the voxel interior is non-planar, but boundary sub-cells
        # are thin slabs that legitimately pass the plane test — match the oracle
        cfg = WildcatConfig(max_surfels_per_sweep=512, max_leaves_per_sweep=4096)
        rng = np.random.default_rng(9)
        pts = rng.uniform(-0.4, 0.4, (500, 3)) + 0.4
        ts = np.sort(rng.uniform(0, 0.4, 500))
        got, ref = run_both(pts, ts, cfg)
        check_match(got, ref)

    def test_rough_plane_rejected_fine_split(self):
        # a curved surface: coarse voxel fails plane test but fine cells pass
        cfg = WildcatConfig(max_surfels_per_sweep=512, max_leaves_per_sweep=4096)
        rng = np.random.default_rng(11)
        n = 3000
        xy = rng.uniform(0, 0.8, (n, 2))
        z = 0.25 * ((xy[:, 0] - 0.4) ** 2 + (xy[:, 1] - 0.4) ** 2) / 0.16  # paraboloid
        pts = np.stack([xy[:, 0], xy[:, 1], z + 0.05], axis=1)
        ts = np.sort(rng.uniform(0, 0.4, n))
        got, ref = run_both(pts, ts, cfg)
        check_match(got, ref)

    def test_f32_close_to_f64(self):
        cfg = WildcatConfig(max_surfels_per_sweep=512, max_leaves_per_sweep=4096)
        pts, ts = make_scene(seed=3, n_planes=4, pts_per_plane=300, span=40.0)
        pad = 4096
        p32 = np.zeros((pad, 3), np.float32); p32[: len(pts)] = pts
        t32 = np.zeros((pad,), np.float32); t32[: len(pts)] = ts
        val = np.zeros((pad,), bool); val[: len(pts)] = True
        got32 = extract_surfels(jnp.asarray(p32), jnp.asarray(t32), jnp.asarray(val), cfg)
        ref = oracle_extract(pts, ts, cfg)
        nv = int(np.asarray(got32["valid"]).sum())
        # f32 rounding can flip borderline plane tests; allow one surfel difference
        assert abs(nv - len(ref)) <= 1, (nv, len(ref))
        if nv == len(ref):
            g_c = np.asarray(got32["center"])[np.asarray(got32["valid"])]
            for i, s in enumerate(ref):
                np.testing.assert_allclose(g_c[i], s["center"], atol=1e-3)
