"""Varying-manual-axes (VMA) helpers for shard_map-compatible loop carries.

``jax.shard_map(..., check_vma=True)`` type-checks every ``while_loop``/``scan``
carry: a carry initialised from a device-invariant literal (``zeros``, a
counter, ``False``) but updated from sharded data inside the body is rejected
as an invariant-input/varying-output mismatch. The fix JAX prescribes is
``jax.lax.pcast(init, axis, to="varying")`` — but that needs the mesh axis
name, and the same odometry program must also trace unsharded on a single
chip. This module keeps one code path: :func:`vary` reads the ambient axis
name from a context variable that :mod:`wildcat_slam_tpu.parallel.mesh` sets
while tracing inside ``shard_map``, and is the identity when no axis is in
scope (single-chip jit, CPU tests, the oracle).

Usage at a loop-carry init site::

    init = vary(jnp.zeros(()), jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
"""

from __future__ import annotations

import contextlib
import contextvars

import jax

_VARY_AXIS: contextvars.ContextVar = contextvars.ContextVar("wildcat_vary_axis",
                                                            default=None)


@contextlib.contextmanager
def vary_axis(axis_name: str):
    """While tracing under ``shard_map`` over ``axis_name``, make :func:`vary`
    promote literal loop-carry inits to varying over that axis."""
    token = _VARY_AXIS.set(axis_name)
    try:
        yield
    finally:
        _VARY_AXIS.reset(token)


def _promote(x, ax):
    # pcast rejects an already-varying operand ("Unsupported pcast
    # from=varying"), so promote only values whose abstract type does not
    # already carry the axis in its varying-manual-axes set
    if ax in getattr(jax.typeof(x), "vma", frozenset()):
        return x
    return jax.lax.pcast(x, ax, to="varying")


def vary(*xs):
    """Mark literal loop-carry init values as varying over the ambient
    shard_map axis; identity when tracing unsharded or for values already
    varying over the axis. Returns a tuple for multiple arguments, the bare
    value for one."""
    ax = _VARY_AXIS.get()
    if ax is not None:
        xs = tuple(_promote(x, ax) for x in xs)
    return xs if len(xs) > 1 else xs[0]


def is_varying(x) -> bool:
    """True when ``x`` is traced under ``shard_map`` with axes it varies over.

    Used to gate the Pallas kernels off on the sharded (batched-windows) path:
    a ``pallas_call`` kernel jaxpr is traced OUTSIDE the shard_map manual-axes
    context, so ref-loads of sharded operands carry `{V:axis}` while every op
    result inside the kernel is invariant — ``check_vma=True`` then rejects the
    kernel at trace time (JAX 0.9 eval error says literally: "as a temporary
    workaround pass check_vma=False"). Rather than give up vma checking for
    the whole batched program, the callers fall back to the XLA paths when
    their operands are varying (docs/ISSUES.md)."""
    return bool(getattr(jax.typeof(x), "vma", frozenset()))


def out_struct(shape, dtype, *operands):
    """``jax.ShapeDtypeStruct`` for a ``pallas_call`` output, carrying the
    union of the operands' varying-manual-axes. Under ``shard_map`` with
    ``check_vma=True`` an out_shape without ``vma`` is rejected outright
    (pallas_call.py: "vma ... must not be None"); outside shard_map the
    operands' vma sets are empty and this is the plain struct."""
    vma = frozenset()
    for x in operands:
        vma |= getattr(jax.typeof(x), "vma", frozenset())
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
