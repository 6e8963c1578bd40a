"""Multi-window mesh scaling: structural guarantees on the sharded step.

On this 1-core CI box the 8 virtual devices share one physical CPU, so
wall-clock per-window flatness is unmeasurable here (benchmarks/batched_bench
records throughput on real hardware). What IS machine-checkable — and what
actually guarantees scaling — is structural:

1. the compiled batched step contains ZERO cross-device collectives
   (all-reduce / all-gather / collective-permute / all-to-all): every device
   runs its windows independently, so adding devices adds no communication;
2. per-device compiled cost (XLA flop estimate) is independent of the device
   count: one window per device costs the same at batch=2 as at batch=8.

Together these are exactly "per-window device cost stays flat as the batch
grows" for a communication-free data-parallel program.
"""

import re

import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as g
from wildcat_slam_tpu.parallel import mesh as pmesh

COLLECTIVES = re.compile(
    r"\b(all-reduce|all-gather|collective-permute|all-to-all|reduce-scatter)\b")


def _compiled_step(n_devices):
    cfg = g._tiny_cfg()
    mesh = pmesh.make_mesh(n_devices)
    state = pmesh.batched_window_state(cfg, n_devices, jnp.float32, mesh)
    feed = g._example_feed(cfg, jnp.float32, batch=n_devices)
    step = pmesh.make_batched_step(cfg, mesh)
    return step.lower(state, *feed).compile()


@pytest.mark.full
def test_no_collectives_and_flat_per_device_cost():
    c8 = _compiled_step(8)
    hlo = c8.as_text()
    hits = sorted(set(COLLECTIVES.findall(hlo)))
    assert not hits, f"sharded step contains collectives: {hits}"

    c2 = _compiled_step(2)
    f8 = c8.cost_analysis()["flops"]
    f2 = c2.cost_analysis()["flops"]
    # one window per device => identical per-device program regardless of
    # device count. cost_analysis may report per-device or total flops
    # depending on backend; accept either by normalizing when it's total.
    ratio = f8 / f2
    if ratio > 2.0:  # total-flops reporting: normalize per window
        ratio = (f8 / 8) / (f2 / 2)
    assert 0.9 < ratio < 1.1, (f2, f8, ratio)


@pytest.mark.full
def test_batched_outputs_window_sharded():
    n = 4
    cfg = g._tiny_cfg()
    mesh = pmesh.make_mesh(n)
    state = pmesh.batched_window_state(cfg, n, jnp.float32, mesh)
    init = pmesh.make_batched_init(cfg, mesh)
    state = init(
        state,
        jnp.broadcast_to(jnp.asarray([0.0, cfg.imu_dt]), (n, 2)).astype(jnp.float32),
        jnp.broadcast_to(jnp.asarray([[0.0, 0.0, 9.81]] * 2), (n, 2, 3)).astype(jnp.float32),
        jnp.broadcast_to(jnp.asarray([[0.01, 0.0, 0.0]] * 2), (n, 2, 3)).astype(jnp.float32),
    )
    feed = g._example_feed(cfg, jnp.float32, batch=n)
    step = pmesh.make_batched_step(cfg, mesh)
    state2, out = step(state, *feed)
    jax.block_until_ready(out["packed"])
    # every output leaf is sharded over the window axis (no accidental gather
    # to one device), and each window produced a finite pose
    sh = out["packed"].sharding
    assert sh.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("window")),
        out["packed"].ndim)
    assert bool(jnp.all(jnp.isfinite(out["packed"][:, 0:3])))
