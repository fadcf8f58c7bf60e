"""Vector spaces for the arrowhead structure + generic pytree reductions.

The reference's OO `Vector<T>`/`DistributedVector<T>` hierarchy
(Core/LinearAlgebra/Abstract/Vector.hpp, Distributed/DistributedVector.h:17-120)
collapses here into two small pytree dataclasses:

  XVec: variable-space vector   (first: [n0], blocks: [N, n])
  RVec: row-space vector        (first: [m0], blocks: [N, m], link: [ml])

Elementwise IPM ops are plain `jax.tree.map`; reduction ops go through the
functions below, which accept an optional mesh axis name so the SAME code
runs per-device inside `shard_map` (the local-then-MPI-collective pattern of
DistributedVector.C:327-726 becomes local-then-psum).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from pips_ipmpp_tpu.core.lp import _register


@_register
@dataclass
class XVec:
    """Variable-space vector: first-stage part + batched block parts."""
    first: jax.Array    # [n0]
    blocks: jax.Array   # [N, n]


@_register
@dataclass
class RVec:
    """Row-space vector: block-0 rows + batched block rows + linking rows."""
    first: jax.Array    # [m0]
    blocks: jax.Array   # [N, m]
    link: jax.Array     # [ml]


def _is_space(x) -> bool:
    return isinstance(x, (XVec, RVec))


# ----------------------------------------------------------------------
# Generic reductions.  `axis` is a mesh axis name when running inside
# shard_map (local reduce + psum/pmax, mirroring the reference's
# local-work-then-MPI_Allreduce pattern); None on a single device.
#
# Replication convention under shard_map: `first` and `link` parts are
# REPLICATED across the mesh axis while `blocks` is sharded.  Reductions
# therefore psum only the block contribution and add the replicated part
# once.
# ----------------------------------------------------------------------

def _blk_leaves(blocks):
    """Leaves of a `blocks` field: one array in the uniform batched layout,
    a tuple of per-bucket arrays in the bucketed heterogeneous layout
    (core/bucketed.py) — reductions handle both transparently."""
    return jax.tree.leaves(blocks)


def _psum(val, axis):
    return jax.lax.psum(val, axis) if axis is not None else val


def _pmax(val, axis):
    return jax.lax.pmax(val, axis) if axis is not None else val


def _pmin(val, axis):
    return jax.lax.pmin(val, axis) if axis is not None else val


def dot(a, b, axis: str | None = None) -> jax.Array:
    """Sum of elementwise products over a pytree of space vectors."""
    leaves_a = jax.tree.leaves(a, is_leaf=_is_space)
    leaves_b = jax.tree.leaves(b, is_leaf=_is_space)
    rep, shard = jnp.zeros(()), jnp.zeros(())
    for la, lb in zip(leaves_a, leaves_b):
        if isinstance(la, (XVec, RVec)):
            rep = rep + jnp.vdot(la.first, lb.first)
            for ba, bb in zip(_blk_leaves(la.blocks), _blk_leaves(lb.blocks)):
                shard = shard + jnp.vdot(ba, bb)
            if isinstance(la, RVec):
                rep = rep + jnp.vdot(la.link, lb.link)
        else:
            rep = rep + jnp.vdot(la, lb)
    return rep + _psum(shard, axis)


def total_sum(a, axis: str | None = None) -> jax.Array:
    leaves = jax.tree.leaves(a, is_leaf=_is_space)
    rep, shard = jnp.zeros(()), jnp.zeros(())
    for l in leaves:
        if isinstance(l, (XVec, RVec)):
            rep = rep + jnp.sum(l.first)
            for bl_ in _blk_leaves(l.blocks):
                shard = shard + jnp.sum(bl_)
            if isinstance(l, RVec):
                rep = rep + jnp.sum(l.link)
        else:
            rep = rep + jnp.sum(l)
    return rep + _psum(shard, axis)


def norm_inf(a, axis: str | None = None) -> jax.Array:
    leaves = jax.tree.leaves(a, is_leaf=_is_space)
    rep, shard = jnp.zeros(()), jnp.zeros(())

    def mx(x):
        return jnp.max(jnp.abs(x)) if x.size else jnp.zeros(())

    for l in leaves:
        if isinstance(l, (XVec, RVec)):
            rep = jnp.maximum(rep, mx(l.first))
            for bl_ in _blk_leaves(l.blocks):
                shard = jnp.maximum(shard, mx(bl_))
            if isinstance(l, RVec):
                rep = jnp.maximum(rep, mx(l.link))
        else:
            rep = jnp.maximum(rep, mx(l))
    return jnp.maximum(rep, _pmax(shard, axis))


def min_reduce(a, axis: str | None = None) -> jax.Array:
    """Global minimum over all entries (used by step bound computations)."""
    leaves = jax.tree.leaves(a, is_leaf=_is_space)
    rep = jnp.asarray(jnp.inf)
    shard = jnp.asarray(jnp.inf)

    def mn(x):
        return jnp.min(x) if x.size else jnp.asarray(jnp.inf)

    for l in leaves:
        if isinstance(l, (XVec, RVec)):
            rep = jnp.minimum(rep, mn(l.first))
            for bl_ in _blk_leaves(l.blocks):
                shard = jnp.minimum(shard, mn(bl_))
            if isinstance(l, RVec):
                rep = jnp.minimum(rep, mn(l.link))
        else:
            rep = jnp.minimum(rep, mn(l))
    return jnp.minimum(rep, _pmin(shard, axis))


# Elementwise helpers --------------------------------------------------

def tmap(fn, *trees):
    """tree_map over space pytrees (elementwise op on every array leaf)."""
    return jax.tree.map(fn, *trees)


def axpy(alpha, x, y):
    """y + alpha * x elementwise."""
    return jax.tree.map(lambda xe, ye: ye + alpha * xe, x, y)


def scale(alpha, x):
    return jax.tree.map(lambda e: alpha * e, x)


def zeros_like(x):
    return jax.tree.map(jnp.zeros_like, x)
