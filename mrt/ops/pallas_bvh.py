"""Pallas TPU kernel: packet BVH traversal over sphere sets.

The XLA traversal (`geometry.bvh.intersect_bvh_spheres`) gathers node
AABBs per ray per step from HBM.  This kernel keeps the whole flattened
BVH and the sphere SoA resident in VMEM and traverses it *packet-style*:
all 1024 rays of a grid program walk one shared DFS cursor; node data
loads are scalar broadcasts (no gathers at all), the slab test runs on
the VPU across the packet, and a subtree is skipped via its escape index
when no lane's slab test passes.

Coherent packets (camera/shadow rays) visit ~the per-ray node count;
fully incoherent packets degrade toward a full DFS sweep — still cheap
per node (one broadcast slab test) but more nodes.  Use for sphere sets
whose BVH + primitives fit VMEM (several hundred thousand spheres).

Semantics identical to the XLA traversal (root selection of
geom.rs:64-75; best-t shrinking; lowest index wins ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spheres import LANE, BLOCK_ROWS

INF = float("inf")
from ..geometry.bvh import LEAF_SIZE  # single source of truth

import os as _os

# Ordered (front-to-back) traversal: at each inner node descend the
# child nearer along the node's split axis for the packet's majority
# ray direction, pushing the far child on a per-packet SMEM stack.
# Early near hits shrink best-t, so far subtrees fail their slab test
# when popped — the packet analogue of the reference's recursive
# "left first, shrink t_max, then right" order (geom.rs:185-200).
# The deterministic tie rule makes results bit-identical to the
# DFS/escape order, so this is a pure scheduling choice.
#
# Per-scene rule (hardware A/B, commit c282bf1 + VERDICT r3 #7):
# ordered wins on coherent-majority packets (rtiow +4.6%, cornell
# +17%, sphere_grid +13%) but LOSES on big instanced TLAS scenes
# whose mid-path packets have no majority direction (lucy -1.5%,
# eve -3%) — the same scenes the lane-sort rule fires for.  So
# single-level BVHs default ordered; the TLAS kernel goes ordered
# only below the sort threshold.  MRT_ORDERED=0/1 forces globally.
_ORD_ENV = _os.environ.get("MRT_ORDERED", "auto")
ORDERED = _ORD_ENV != "0"
TLAS_ORDERED_MAX_INST = 32  # == Scene.SORT_MIN_INSTANCES


def tlas_ordered(n_instances: int) -> bool:
    if _ORD_ENV in ("0", "1"):
        return _ORD_ENV == "1"
    return n_instances < TLAS_ORDERED_MAX_INST
# Median-split trees are balanced: depth <= ceil(log2(T)) <= 31 for any
# i32 primitive count, and only inner-node descents push.
STACK_DEPTH = 64


def _majority_negs(dx, dy, dz, t_max, t_min):
    """Per-packet majority direction sign along each axis, counting
    only live lanes (pad lanes carry t_max == t_min)."""
    valid = t_max > t_min
    nv = jnp.sum(valid.astype(jnp.int32))
    neg = lambda c: jnp.sum(((c < 0.0) & valid).astype(jnp.int32)) * 2 > nv
    return neg(dx), neg(dy), neg(dz)


def _pick_neg(ax, negx, negy, negz):
    return jnp.where(ax == 0, negx, jnp.where(ax == 1, negy, negz))


def _kernel(scalars_ref, nodes_ref, meta_ref, sph_ref, o_ref, d_ref,
            tmax_ref, t_out, i_out, stack_ref, *, n_nodes, ordered):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    t_min = scalars_ref[0]
    t_max = tmax_ref[:]
    if ordered:
        negx, negy, negz = _majority_negs(dx, dy, dz, t_max, t_min)

    def slab(lo, hi, o_c, inv_c, near, far):
        t0 = (lo - o_c) * inv_c
        t1 = (hi - o_c) * inv_c
        return (jnp.maximum(near, jnp.minimum(t0, t1)),
                jnp.minimum(far, jnp.maximum(t0, t1)))

    def sphere_test(s, bt, bi):
        cx = sph_ref[0, s]
        cy = sph_ref[1, s]
        cz = sph_ref[2, s]
        r = sph_ref[3, s]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        half_b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r0 = (-half_b - sq) * inv_a
        r1 = (-half_b + sq) * inv_a
        lim = jnp.minimum(bt, t_max)
        ok0 = ok & (r0 >= t_min) & (r0 <= lim)
        ok1 = ok & (r1 >= t_min) & (r1 <= lim)
        root = jnp.where(ok0, r0, jnp.where(ok1, r1, INF))
        # Tie rule: equal root -> lower index (order-invariant; matches
        # geometry.bvh.intersect_bvh_spheres bit-exactly).
        better = (root < bt) | ((root == bt) & (s < bi))
        return jnp.where(better, root, bt), jnp.where(better, s, bi)

    def cond(carry):
        node = carry[0]
        return node < n_nodes

    def body(carry):
        node, sp, bt, bi = carry
        # nodes layout (8, M): bminx/y/z, bmaxx/y/z rows (f32).
        near = jnp.full_like(bt, t_min)
        far = jnp.minimum(bt, t_max)
        near, far = slab(nodes_ref[0, node], nodes_ref[3, node],
                         ox, inv_dx, near, far)
        near, far = slab(nodes_ref[1, node], nodes_ref[4, node],
                         oy, inv_dy, near, far)
        near, far = slab(nodes_ref[2, node], nodes_ref[5, node],
                         oz, inv_dz, near, far)
        any_hit = jnp.any(near <= far)

        first = meta_ref[0, node]
        count = meta_ref[1, node]
        is_leaf = count > 0

        def test_leaf(carry):
            bt, bi = carry
            for j in range(LEAF_SIZE):
                s = jnp.minimum(first + j, sph_ref.shape[1] - 1)
                tj, ij = sphere_test(s, bt, bi)
                take = j < count
                bt = jnp.where(take, tj, bt)
                bi = jnp.where(take, ij, bi)
            return bt, bi

        do_leaf = any_hit & is_leaf
        bt, bi = jax.lax.cond(do_leaf, test_leaf, lambda c: c, (bt, bi))

        descend = any_hit & ~is_leaf
        if ordered:
            c1 = node + 1
            c2 = meta_ref[2, jnp.minimum(c1, n_nodes - 1)]
            neg = _pick_neg(meta_ref[3, node], negx, negy, negz)
            near_c = jnp.where(neg, c2, c1)
            far_c = jnp.where(neg, c1, c2)
            popped = stack_ref[jnp.maximum(sp - 1, 0)]

            @pl.when(descend)
            def _():
                stack_ref[sp] = far_c

            node = jnp.where(descend, near_c,
                             jnp.where(sp > 0, popped, n_nodes))
            sp = jnp.where(descend, sp + 1, jnp.maximum(sp - 1, 0))
        else:
            node = jnp.where(descend, node + 1, meta_ref[2, node])
        return node, sp, bt, bi

    init = (jnp.int32(0), jnp.int32(0), jnp.full_like(a, INF),
            jnp.zeros_like(a, dtype=jnp.int32))
    _, _, bt, bi = jax.lax.while_loop(cond, body, init)
    t_out[:] = bt
    i_out[:] = bi


@functools.partial(jax.jit, static_argnames=("interpret", "ordered"))
def _traverse(nodes, meta, sph, o3, d3, t_min, t_max2, interpret=False,
              ordered=ORDERED):
    r = o3.shape[1]
    m = nodes.shape[1]
    grid = (pl.cdiv(r, BLOCK_ROWS),)
    scalars = jnp.stack([jnp.asarray(t_min, jnp.float32)])

    kernel = functools.partial(_kernel, n_nodes=m, ordered=ordered)
    t, i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # Node/meta/sphere tables in SMEM: read via dynamic
                # scalar indices (forbidden on VMEM lane dims).
                pl.BlockSpec((8, m), lambda g, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4, m), lambda g, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4, sph.shape[1]), lambda g, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((3, BLOCK_ROWS, LANE),
                             lambda g, c: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, BLOCK_ROWS, LANE),
                             lambda g, c: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_ROWS, LANE), lambda g, c: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BLOCK_ROWS, LANE), lambda g, c: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BLOCK_ROWS, LANE), lambda g, c: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, nodes, meta, sph, o3, d3, t_max2)
    return t, i


def intersect_bvh_spheres(spheres, bvh, o, d, t_min, t_max,
                          interpret=False):
    """Drop-in Pallas replacement for geometry.bvh.intersect_bvh_spheres.
    Returns a Hits record."""
    import numpy as np

    from ..geometry.spheres import make_hits

    n = o.shape[0]
    m = bvh.n_nodes

    # Node SoA: rows bmin xyz / bmax xyz, padded 8 rows.
    nodes = jnp.zeros((8, m), jnp.float32)
    nodes = nodes.at[0:3].set(bvh.bmin.T)
    nodes = nodes.at[3:6].set(bvh.bmax.T)
    meta = jnp.zeros((4, m), jnp.int32)
    meta = meta.at[0].set(bvh.first)
    meta = meta.at[1].set(bvh.count)
    meta = meta.at[2].set(bvh.escape)
    # Row 3: the split axis (the build's widest-axis rule over the
    # node's own bounds) — drives ordered front-to-back descent.
    meta = meta.at[3].set(jnp.argmax(bvh.bmax - bvh.bmin,
                                     axis=1).astype(jnp.int32))

    s = spheres.count
    s_pad = max(8, -(-s // 8) * 8)
    sph = jnp.zeros((4, s_pad), jnp.float32)
    sph = sph.at[:3, :s].set(spheres.center.T)
    sph = sph.at[3, :s].set(spheres.radius)

    block = BLOCK_ROWS * LANE
    n_pad = -(-n // block) * block
    rows = n_pad // LANE

    def to3(x, fill):
        pad = jnp.full((n_pad, 3), fill, x.dtype).at[:n].set(x)
        return pad.T.reshape(3, rows, LANE)

    o3 = to3(o, 0.0)
    d3 = to3(jnp.where(jnp.sum(d * d, axis=-1, keepdims=True) > 0.0,
                       d, 1.0), 1.0)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # Pad lanes get t_max = t_min so they can't extend the traversal.
    t_max2 = jnp.full((n_pad,), jnp.float32(t_min)).at[:n].set(
        t_max_b).reshape(rows, LANE)

    t, i = _traverse(nodes, meta, sph, o3, d3,
                     jnp.asarray(t_min, jnp.float32), t_max2,
                     interpret=interpret)
    t = t.reshape(-1)[:n]
    i = i.reshape(-1)[:n]
    return make_hits(spheres, o, d, t, i)


# ---------------------------------------------------------------------------
# Triangle packet traversal: same shared-DFS-cursor scheme, leaves run
# Moller-Trumbore on scalar-broadcast triangle data (geom.rs:504-534).
# Used for mesh BVHs that fit VMEM alongside the node arrays.
# ---------------------------------------------------------------------------


def _tri_kernel(scalars_ref, nodes_ref, meta_ref, tri_ref, o_ref, d_ref,
                tmin_ref, tmax_ref, t_out, i_out, u_out, v_out,
                stack_ref, *, n_nodes, ordered):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    # Per-lane t_min (the alpha re-cast rounds pass a vector; pad
    # lanes carry t_min 1 > t_max 0 so they can't extend traversal).
    t_min = tmin_ref[:]
    det_eps = scalars_ref[0]
    t_max = tmax_ref[:]
    if ordered:
        negx, negy, negz = _majority_negs(dx, dy, dz, t_max, t_min)

    def slab(lo, hi, o_c, inv_c, near, far):
        t0 = (lo - o_c) * inv_c
        t1 = (hi - o_c) * inv_c
        return (jnp.maximum(near, jnp.minimum(t0, t1)),
                jnp.minimum(far, jnp.maximum(t0, t1)))

    def tri_test(s, carry):
        bt, bi, bu, bv = carry
        # tri layout (9, T): va.xyz, e_ab.xyz, e_ac.xyz
        vax, vay, vaz = tri_ref[0, s], tri_ref[1, s], tri_ref[2, s]
        abx, aby, abz = tri_ref[3, s], tri_ref[4, s], tri_ref[5, s]
        acx, acy, acz = tri_ref[6, s], tri_ref[7, s], tri_ref[8, s]
        # p = d x ac
        px = dy * acz - dz * acy
        py = dz * acx - dx * acz
        pz = dx * acy - dy * acx
        det = abx * px + aby * py + abz * pz
        det_ok = jnp.abs(det) >= det_eps
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvx, tvy, tvz = ox - vax, oy - vay, oz - vaz
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        # q = tv x ab
        qx = tvy * abz - tvz * aby
        qy = tvz * abx - tvx * abz
        qz = tvx * aby - tvy * abx
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (acx * qx + acy * qy + acz * qz) * inv_det
        # Tie rule: equal t -> lower triangle index (order-invariant;
        # matches geometry.bvh.intersect_bvh_tris bit-exactly).
        ok = (det_ok & (u >= 0.0) & (u <= 1.0)
              & (v >= 0.0) & (u + v <= 1.0)
              & (t >= t_min) & (t <= t_max)
              & ((t < bt) | ((t == bt) & (s < bi))))
        return (jnp.where(ok, t, bt), jnp.where(ok, s, bi),
                jnp.where(ok, u, bu), jnp.where(ok, v, bv))

    def cond(carry):
        return carry[0] < n_nodes

    def body(carry):
        node, sp, bt, bi, bu, bv = carry
        near = t_min
        far = jnp.minimum(bt, t_max)
        near, far = slab(nodes_ref[0, node], nodes_ref[3, node],
                         ox, inv_dx, near, far)
        near, far = slab(nodes_ref[1, node], nodes_ref[4, node],
                         oy, inv_dy, near, far)
        near, far = slab(nodes_ref[2, node], nodes_ref[5, node],
                         oz, inv_dz, near, far)
        any_hit = jnp.any(near <= far)

        first = meta_ref[0, node]
        count = meta_ref[1, node]
        is_leaf = count > 0

        def test_leaf(c):
            bt, bi, bu, bv = c
            for j in range(LEAF_SIZE):
                s = jnp.minimum(first + j, tri_ref.shape[1] - 1)
                tj = tri_test(s, (bt, bi, bu, bv))
                take = j < count
                bt = jnp.where(take, tj[0], bt)
                bi = jnp.where(take, tj[1], bi)
                bu = jnp.where(take, tj[2], bu)
                bv = jnp.where(take, tj[3], bv)
            return bt, bi, bu, bv

        bt, bi, bu, bv = jax.lax.cond(any_hit & is_leaf, test_leaf,
                                      lambda c: c, (bt, bi, bu, bv))
        descend = any_hit & ~is_leaf
        if ordered:
            c1 = node + 1
            c2 = meta_ref[2, jnp.minimum(c1, n_nodes - 1)]
            neg = _pick_neg(meta_ref[3, node], negx, negy, negz)
            near_c = jnp.where(neg, c2, c1)
            far_c = jnp.where(neg, c1, c2)
            popped = stack_ref[jnp.maximum(sp - 1, 0)]

            @pl.when(descend)
            def _():
                stack_ref[sp] = far_c

            node = jnp.where(descend, near_c,
                             jnp.where(sp > 0, popped, n_nodes))
            sp = jnp.where(descend, sp + 1, jnp.maximum(sp - 1, 0))
        else:
            node = jnp.where(descend, node + 1, meta_ref[2, node])
        return node, sp, bt, bi, bu, bv

    zero = jnp.zeros_like(t_max)
    init = (jnp.int32(0), jnp.int32(0), jnp.full_like(t_max, INF),
            jnp.zeros_like(t_max, dtype=jnp.int32), zero, zero)
    _, _, bt, bi, bu, bv = jax.lax.while_loop(cond, body, init)
    t_out[:] = bt
    i_out[:] = bi
    u_out[:] = bu
    v_out[:] = bv


@functools.partial(jax.jit, static_argnames=("interpret", "ordered"))
def _traverse_tris(nodes, meta, tri, o3, d3, t_min2, det_eps, t_max2,
                   interpret=False, ordered=ORDERED):
    r = o3.shape[1]
    m = nodes.shape[1]
    grid = (pl.cdiv(r, BLOCK_ROWS),)
    scalars = jnp.stack([jnp.asarray(det_eps, jnp.float32)])

    kernel = functools.partial(_tri_kernel, n_nodes=m, ordered=ordered)
    ray_spec = pl.BlockSpec((3, BLOCK_ROWS, LANE), lambda g, c: (0, g, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda g, c: (g, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, m), lambda g, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((4, m), lambda g, c: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((9, tri.shape[1]), lambda g, c: (0, 0),
                             memory_space=pltpu.SMEM),
                ray_spec, ray_spec, out_spec, out_spec,
            ],
            out_specs=[out_spec] * 4,
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.int32),
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, nodes, meta, tri, o3, d3, t_min2, t_max2)
    return outs


def intersect_bvh_tris(tris, bvh, o, d, t_min, t_max, interpret=False):
    """Drop-in Pallas replacement for geometry.bvh.intersect_bvh (mesh
    BVHs small enough for VMEM).  Returns a Hits record."""
    from ..geometry.triangles import make_hits

    t, i, u, v = traverse_bvh_tris(tris, bvh, o, d, t_min, t_max,
                                   interpret=interpret)
    return make_hits(jax.tree.map(jnp.asarray, tris), o, d, t, i, u, v)


def traverse_bvh_tris(tris, bvh, o, d, t_min, t_max, interpret=False):
    """Raw single-level packet traversal: per-ray winner
    (t, triangle, u, v) without Hits expansion — the flat-parts TLAS
    path folds several of these before one shared expansion.
    `t_min` may be scalar or per-lane (the alpha re-cast rounds)."""
    from ..geometry.triangles import DET_EPS

    tris = jax.tree.map(jnp.asarray, tris)
    bvh = jax.tree.map(jnp.asarray, bvh)
    n = o.shape[0]
    m = bvh.n_nodes

    nodes = jnp.zeros((8, m), jnp.float32)
    nodes = nodes.at[0:3].set(bvh.bmin.T)
    nodes = nodes.at[3:6].set(bvh.bmax.T)
    meta = jnp.zeros((4, m), jnp.int32)
    meta = meta.at[0].set(bvh.first)
    meta = meta.at[1].set(bvh.count)
    meta = meta.at[2].set(bvh.escape)
    meta = meta.at[3].set(jnp.argmax(bvh.bmax - bvh.bmin,
                                     axis=1).astype(jnp.int32))

    t_cnt = tris.count
    t_pad = max(8, -(-t_cnt // 8) * 8)
    tri = jnp.zeros((9, t_pad), jnp.float32)
    tri = tri.at[0:3, :t_cnt].set(tris.va.T)
    tri = tri.at[3:6, :t_cnt].set(tris.e_ab.T)
    tri = tri.at[6:9, :t_cnt].set(tris.e_ac.T)

    block = BLOCK_ROWS * LANE
    n_pad = -(-n // block) * block
    rows = n_pad // LANE

    def to3(x, fill):
        pad = jnp.full((n_pad, 3), fill, x.dtype).at[:n].set(x)
        return pad.T.reshape(3, rows, LANE)

    o3 = to3(o, 0.0)
    d3 = to3(jnp.where(jnp.sum(d * d, axis=-1, keepdims=True) > 0.0,
                       d, 1.0), 1.0)
    # Pad lanes carry (t_min 1, t_max 0): an empty interval that can't
    # extend the packet traversal or accept a hit.
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_min2 = jnp.full((n_pad,), jnp.float32(1.0)).at[:n].set(
        t_min_b).reshape(rows, LANE)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_max2 = jnp.full((n_pad,), jnp.float32(0.0)).at[:n].set(
        t_max_b).reshape(rows, LANE)

    t, i, u, v = _traverse_tris(nodes, meta, tri, o3, d3, t_min2,
                                jnp.asarray(DET_EPS, jnp.float32),
                                t_max2, interpret=interpret)
    flat = lambda x: x.reshape(-1)[:n]
    return flat(t), flat(i), flat(u), flat(v)


# ---------------------------------------------------------------------------
# Two-level (TLAS/BLAS) packet traversal: the packet shares a scalar
# cursor over the instance hierarchy; entering a TLAS leaf warps the
# whole packet by the instance's inverse transform (12 SMEM scalars) and
# sweeps that mesh's BLAS subtree, then resumes the TLAS at the saved
# escape.  All tables in SMEM; zero gathers.
# ---------------------------------------------------------------------------


def _tlas_kernel(scalars_ref, tnodes_ref, tmeta_ref, inst_ref, imeta_ref,
                 bnodes_ref, bmeta_ref, tri_ref, o_ref, d_ref, tmin_ref,
                 tmax_ref,
                 t_out, inst_out, tri_out, u_out, v_out, stack_ref, *,
                 n_tlas):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    # Inverse directions hoisted: the ray only changes on instance
    # enter, but an in-slab divide costs 3 vector divides per NODE.
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    # Per-lane t_min (alpha re-cast vectors; pad lanes carry
    # t_min 1 > t_max 0 so they can't extend traversal).
    t_min = tmin_ref[:]
    det_eps = scalars_ref[0]
    t_max = tmax_ref[:]

    def slab(lo, hi, o_c, inv_c, near, far):
        t0 = (lo - o_c) * inv_c
        t1 = (hi - o_c) * inv_c
        return (jnp.maximum(near, jnp.minimum(t0, t1)),
                jnp.minimum(far, jnp.maximum(t0, t1)))

    def cond(carry):
        tnode, inst = carry[0], carry[1]
        return (inst >= 0) | (tnode < n_tlas)

    def body(carry):
        (tnode, inst, resume, bnode,
         lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
         bt, b_inst, b_tri, bu, bv) = carry

        def tlas_phase(c):
            (tnode, inst, resume, bnode,
             lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
             bt, b_inst, b_tri, bu, bv) = c
            n = tnode
            near = t_min
            far = jnp.minimum(bt, t_max)
            near, far = slab(tnodes_ref[0, n], tnodes_ref[3, n],
                             ox, inv_dx, near, far)
            near, far = slab(tnodes_ref[1, n], tnodes_ref[4, n],
                             oy, inv_dy, near, far)
            near, far = slab(tnodes_ref[2, n], tnodes_ref[5, n],
                             oz, inv_dz, near, far)
            any_hit = jnp.any(near <= far)
            leaf_inst = tmeta_ref[0, n]
            escape = tmeta_ref[1, n]
            enter = any_hit & (leaf_inst >= 0)

            def do_enter(_):
                i = leaf_inst
                # inv rows: R00 R01 R02 R10 R11 R12 R20 R21 R22 t0 t1 t2
                r = [inst_ref[k, i] for k in range(12)]
                nlox = r[0] * ox + r[1] * oy + r[2] * oz + r[9]
                nloy = r[3] * ox + r[4] * oy + r[5] * oz + r[10]
                nloz = r[6] * ox + r[7] * oy + r[8] * oz + r[11]
                nldx = r[0] * dx + r[1] * dy + r[2] * dz
                nldy = r[3] * dx + r[4] * dy + r[5] * dz
                nldz = r[6] * dx + r[7] * dy + r[8] * dz
                return (escape, i, imeta_ref[0, i],
                        nlox, nloy, nloz, nldx, nldy, nldz,
                        1.0 / nldx, 1.0 / nldy, 1.0 / nldz)

            def no_enter(_):
                nxt = jnp.where(any_hit, n + 1, escape)
                return (nxt, jnp.int32(-1), jnp.int32(0),
                        lox, loy, loz, ldx, ldy, ldz, lix, liy, liz)

            (tnode2, inst2, bnode2, lox2, loy2, loz2, ldx2, ldy2,
             ldz2, lix2, liy2, liz2) = jax.lax.cond(enter, do_enter,
                                                    no_enter, None)
            # On enter: resume holds the TLAS continuation (escape) and
            # tnode2 (=escape) is where we come back to; bnode starts at
            # the mesh root.
            return (tnode2, inst2, tnode2, bnode2,
                    lox2, loy2, loz2, ldx2, ldy2, ldz2,
                    lix2, liy2, liz2,
                    bt, b_inst, b_tri, bu, bv)

        def blas_phase(c):
            (tnode, inst, resume, bnode,
             lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
             bt, b_inst, b_tri, bu, bv) = c
            n = bnode
            near = t_min
            far = jnp.minimum(bt, t_max)
            near, far = slab(bnodes_ref[0, n], bnodes_ref[3, n],
                             lox, lix, near, far)
            near, far = slab(bnodes_ref[1, n], bnodes_ref[4, n],
                             loy, liy, near, far)
            near, far = slab(bnodes_ref[2, n], bnodes_ref[5, n],
                             loz, liz, near, far)
            any_hit = jnp.any(near <= far)
            first = bmeta_ref[0, n]
            count = bmeta_ref[1, n]
            escape = bmeta_ref[2, n]
            is_leaf = count > 0

            def tri_test(s, carry):
                bt, b_inst, b_tri, bu, bv = carry
                vax, vay, vaz = tri_ref[0, s], tri_ref[1, s], tri_ref[2, s]
                abx, aby, abz = tri_ref[3, s], tri_ref[4, s], tri_ref[5, s]
                acx, acy, acz = tri_ref[6, s], tri_ref[7, s], tri_ref[8, s]
                px = ldy * acz - ldz * acy
                py = ldz * acx - ldx * acz
                pz = ldx * acy - ldy * acx
                det = abx * px + aby * py + abz * pz
                det_ok = jnp.abs(det) >= det_eps
                inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                tvx, tvy, tvz = lox - vax, loy - vay, loz - vaz
                u = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * abz - tvz * aby
                qy = tvz * abx - tvx * abz
                qz = tvx * aby - tvy * abx
                v = (ldx * qx + ldy * qy + ldz * qz) * inv_det
                t = (acx * qx + acy * qy + acz * qz) * inv_det
                # Tie rule: equal t -> lexicographic lower
                # (instance, triangle) — order-invariant; matches
                # geometry.instance.intersect_tlas bit-exactly.
                ok = (det_ok & (u >= 0.0) & (u <= 1.0)
                      & (v >= 0.0) & (u + v <= 1.0)
                      & (t >= t_min) & (t <= t_max)
                      & ((t < bt) | ((t == bt)
                                     & ((inst < b_inst)
                                        | ((inst == b_inst)
                                           & (s < b_tri))))))
                return (jnp.where(ok, t, bt),
                        jnp.where(ok, inst, b_inst),
                        jnp.where(ok, s, b_tri),
                        jnp.where(ok, u, bu), jnp.where(ok, v, bv))

            def test_leaf(carry):
                for j in range(LEAF_SIZE):
                    s = jnp.minimum(first + j, tri_ref.shape[1] - 1)
                    res = tri_test(s, carry)
                    take = j < count
                    carry = tuple(jnp.where(take, r, c)
                                  for r, c in zip(res, carry))
                return carry

            bt, b_inst, b_tri, bu, bv = jax.lax.cond(
                any_hit & is_leaf, test_leaf, lambda c: c,
                (bt, b_inst, b_tri, bu, bv))

            nxt = jnp.where(any_hit & ~is_leaf, n + 1, escape)
            done = nxt >= imeta_ref[1, inst]   # blas_end
            inst2 = jnp.where(done, -1, inst)
            tnode2 = jnp.where(done, resume, tnode)
            bnode2 = jnp.where(done, 0, nxt)
            return (tnode2, inst2, resume, bnode2,
                    lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                    bt, b_inst, b_tri, bu, bv)

        return jax.lax.cond(inst >= 0, blas_phase, tlas_phase, carry)

    zero = jnp.zeros_like(t_max)
    izero = jnp.zeros_like(t_max, dtype=jnp.int32)
    init = (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
            zero, zero, zero, zero, zero, zero, zero, zero, zero,
            jnp.full_like(t_max, INF), izero - 1, izero, zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    t_out[:] = out[13]
    inst_out[:] = out[14]
    tri_out[:] = out[15]
    u_out[:] = out[16]
    v_out[:] = out[17]


def _tlas_kernel_ordered(scalars_ref, tnodes_ref, tmeta_ref, inst_ref,
                         imeta_ref, bnodes_ref, bmeta_ref, tri_ref,
                         o_ref, d_ref, tmin_ref, tmax_ref, t_out, inst_out,
                         tri_out, u_out, v_out, stack_ref, *, n_tlas):
    """Front-to-back two-level traversal with one tagged SMEM stack.

    Stack entries >= 0 are TLAS nodes; BLAS far children are pushed as
    -(node+1).  Popping a TLAS-tagged entry while inside an instance
    exits it (all BLAS entries of the current instance live above the
    last TLAS entry, so LIFO order makes this exact).  Entering an
    instance pushes nothing: its continuation is simply the next pop.
    Results are bit-identical to `_tlas_kernel` (deterministic tie
    rule); only the visit schedule differs.
    """
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    # Per-lane t_min (alpha re-cast vectors; pad lanes carry
    # t_min 1 > t_max 0 so they can't extend traversal).
    t_min = tmin_ref[:]
    det_eps = scalars_ref[0]
    t_max = tmax_ref[:]
    wnegx, wnegy, wnegz = _majority_negs(dx, dy, dz, t_max, t_min)

    def slab(lo, hi, o_c, inv_c, near, far):
        t0 = (lo - o_c) * inv_c
        t1 = (hi - o_c) * inv_c
        return (jnp.maximum(near, jnp.minimum(t0, t1)),
                jnp.minimum(far, jnp.maximum(t0, t1)))

    def cond(c):
        cur, inst = c[0], c[1]
        return (inst >= 0) | (cur < n_tlas)

    def body(c):
        (cur, inst, sp,
         lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
         lnegx, lnegy, lnegz,
         bt, b_inst, b_tri, bu, bv) = c

        # Each phase returns:
        #  (do_push, push_val, do_pop, cur_n, inst_n,
        #   local ray 9, local negs 3, bt, b_inst, b_tri, bu, bv)
        def tlas_phase(_):
            n = cur
            near = t_min
            far = jnp.minimum(bt, t_max)
            near, far = slab(tnodes_ref[0, n], tnodes_ref[3, n],
                             ox, inv_dx, near, far)
            near, far = slab(tnodes_ref[1, n], tnodes_ref[4, n],
                             oy, inv_dy, near, far)
            near, far = slab(tnodes_ref[2, n], tnodes_ref[5, n],
                             oz, inv_dz, near, far)
            any_hit = jnp.any(near <= far)
            leaf_inst = tmeta_ref[0, n]
            is_leaf = leaf_inst >= 0
            enter = any_hit & is_leaf
            descend = any_hit & ~is_leaf

            def do_enter(_):
                i = leaf_inst
                r = [inst_ref[k, i] for k in range(12)]
                nlox = r[0] * ox + r[1] * oy + r[2] * oz + r[9]
                nloy = r[3] * ox + r[4] * oy + r[5] * oz + r[10]
                nloz = r[6] * ox + r[7] * oy + r[8] * oz + r[11]
                nldx = r[0] * dx + r[1] * dy + r[2] * dz
                nldy = r[3] * dx + r[4] * dy + r[5] * dz
                nldz = r[6] * dx + r[7] * dy + r[8] * dz
                lnx, lny, lnz = _majority_negs(nldx, nldy, nldz,
                                               t_max, t_min)
                return (imeta_ref[0, i], i,
                        nlox, nloy, nloz, nldx, nldy, nldz,
                        1.0 / nldx, 1.0 / nldy, 1.0 / nldz,
                        lnx, lny, lnz)

            def no_enter(_):
                return (cur, jnp.int32(-1),
                        lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                        lnegx, lnegy, lnegz)

            (e_cur, inst_n, nlox, nloy, nloz, nldx, nldy, nldz,
             nlix, nliy, nliz, lnx, lny, lnz) = jax.lax.cond(
                enter, do_enter, no_enter, None)

            c1 = n + 1
            c2 = tmeta_ref[1, jnp.minimum(c1, n_tlas - 1)]
            neg = _pick_neg(tmeta_ref[2, n], wnegx, wnegy, wnegz)
            near_c = jnp.where(neg, c2, c1)
            far_c = jnp.where(neg, c1, c2)
            cur_n = jnp.where(enter, e_cur, near_c)
            return (descend, far_c, ~enter & ~descend, cur_n, inst_n,
                    nlox, nloy, nloz, nldx, nldy, nldz,
                    nlix, nliy, nliz, lnx, lny, lnz,
                    bt, b_inst, b_tri, bu, bv)

        def blas_phase(_):
            n = cur
            near = t_min
            far = jnp.minimum(bt, t_max)
            near, far = slab(bnodes_ref[0, n], bnodes_ref[3, n],
                             lox, lix, near, far)
            near, far = slab(bnodes_ref[1, n], bnodes_ref[4, n],
                             loy, liy, near, far)
            near, far = slab(bnodes_ref[2, n], bnodes_ref[5, n],
                             loz, liz, near, far)
            any_hit = jnp.any(near <= far)
            first = bmeta_ref[0, n]
            count = bmeta_ref[1, n]
            is_leaf = count > 0

            def tri_test(s, carry):
                bt, b_inst, b_tri, bu, bv = carry
                vax, vay, vaz = tri_ref[0, s], tri_ref[1, s], tri_ref[2, s]
                abx, aby, abz = tri_ref[3, s], tri_ref[4, s], tri_ref[5, s]
                acx, acy, acz = tri_ref[6, s], tri_ref[7, s], tri_ref[8, s]
                px = ldy * acz - ldz * acy
                py = ldz * acx - ldx * acz
                pz = ldx * acy - ldy * acx
                det = abx * px + aby * py + abz * pz
                det_ok = jnp.abs(det) >= det_eps
                inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                tvx, tvy, tvz = lox - vax, loy - vay, loz - vaz
                u = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * abz - tvz * aby
                qy = tvz * abx - tvx * abz
                qz = tvx * aby - tvy * abx
                v = (ldx * qx + ldy * qy + ldz * qz) * inv_det
                t = (acx * qx + acy * qy + acz * qz) * inv_det
                ok = (det_ok & (u >= 0.0) & (u <= 1.0)
                      & (v >= 0.0) & (u + v <= 1.0)
                      & (t >= t_min) & (t <= t_max)
                      & ((t < bt) | ((t == bt)
                                     & ((inst < b_inst)
                                        | ((inst == b_inst)
                                           & (s < b_tri))))))
                return (jnp.where(ok, t, bt),
                        jnp.where(ok, inst, b_inst),
                        jnp.where(ok, s, b_tri),
                        jnp.where(ok, u, bu), jnp.where(ok, v, bv))

            def test_leaf(carry):
                for j in range(LEAF_SIZE):
                    s = jnp.minimum(first + j, tri_ref.shape[1] - 1)
                    res = tri_test(s, carry)
                    take = j < count
                    carry = tuple(jnp.where(take, r, c)
                                  for r, c in zip(res, carry))
                return carry

            nbt, nb_inst, nb_tri, nbu, nbv = jax.lax.cond(
                any_hit & is_leaf, test_leaf, lambda c: c,
                (bt, b_inst, b_tri, bu, bv))

            descend = any_hit & ~is_leaf
            c1 = n + 1
            c2 = bmeta_ref[2, jnp.minimum(c1, bmeta_ref.shape[1] - 1)]
            neg = _pick_neg(bmeta_ref[3, n], lnegx, lnegy, lnegz)
            near_c = jnp.where(neg, c2, c1)
            far_c = jnp.where(neg, c1, c2)
            return (descend, -(far_c + 1), ~descend,
                    jnp.where(descend, near_c, cur), inst,
                    lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                    lnegx, lnegy, lnegz,
                    nbt, nb_inst, nb_tri, nbu, nbv)

        (do_push, push_val, do_pop, cur_n, inst_n,
         lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
         lnegx, lnegy, lnegz,
         bt, b_inst, b_tri, bu, bv) = jax.lax.cond(
            inst >= 0, blas_phase, tlas_phase, None)

        popped = stack_ref[jnp.maximum(sp - 1, 0)]

        @pl.when(do_push)
        def _():
            stack_ref[sp] = push_val

        have = sp > 0
        isb = popped < 0
        cur2 = jnp.where(do_pop,
                         jnp.where(have,
                                   jnp.where(isb, -(popped + 1), popped),
                                   n_tlas),
                         cur_n)
        inst2 = jnp.where(do_pop,
                          jnp.where(have & isb, inst_n, jnp.int32(-1)),
                          inst_n)
        sp2 = jnp.where(do_push, sp + 1,
                        jnp.where(do_pop, jnp.maximum(sp - 1, 0), sp))
        return (cur2, inst2, sp2,
                lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                lnegx, lnegy, lnegz,
                bt, b_inst, b_tri, bu, bv)

    zero = jnp.zeros_like(t_max)
    izero = jnp.zeros_like(t_max, dtype=jnp.int32)
    f = jnp.bool_(False)
    init = (jnp.int32(0), jnp.int32(-1), jnp.int32(0),
            zero, zero, zero, zero, zero, zero, zero, zero, zero,
            f, f, f,
            jnp.full_like(t_max, INF), izero - 1, izero, zero, zero)
    out = jax.lax.while_loop(cond, body, init)
    t_out[:] = out[15]
    inst_out[:] = out[16]
    tri_out[:] = out[17]
    u_out[:] = out[18]
    v_out[:] = out[19]


@functools.partial(jax.jit, static_argnames=("interpret", "ordered"))
def _traverse_tlas(tnodes, tmeta, inst, imeta, bnodes, bmeta, tri,
                   o3, d3, t_min2, det_eps, t_max2, interpret=False,
                   ordered=ORDERED):
    r = o3.shape[1]
    mt = tnodes.shape[1]
    grid = (pl.cdiv(r, BLOCK_ROWS),)
    scalars = jnp.stack([jnp.asarray(det_eps, jnp.float32)])

    kernel = functools.partial(
        _tlas_kernel_ordered if ordered else _tlas_kernel, n_tlas=mt)
    smem = lambda shape: pl.BlockSpec(shape, lambda g, c: tuple(
        0 for _ in shape), memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((3, BLOCK_ROWS, LANE), lambda g, c: (0, g, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda g, c: (g, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                smem(tnodes.shape), smem(tmeta.shape), smem(inst.shape),
                smem(imeta.shape), smem(bnodes.shape), smem(bmeta.shape),
                smem(tri.shape),
                ray_spec, ray_spec, out_spec, out_spec,
            ],
            out_specs=[out_spec] * 5,
            # One tagged stack: TLAS depth + BLAS depth (balanced
            # median-split trees are <= 31 deep each).
            scratch_shapes=[pltpu.SMEM((96,), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.int32),
            jax.ShapeDtypeStruct((r, LANE), jnp.int32),
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, tnodes, tmeta, inst, imeta, bnodes, bmeta, tri,
      o3, d3, t_min2, t_max2)
    return outs


def intersect_tlas(tlas, o, d, t_min, t_max, interpret=False):
    """Drop-in Pallas replacement for geometry.instance.intersect_tlas
    (instance hierarchies whose tables fit SMEM)."""
    from ..geometry.instance import expand_winner
    from ..geometry.triangles import DET_EPS

    n = o.shape[0]
    mt = tlas.n_tlas_nodes
    mb = tlas.bmin.shape[0]
    tris = tlas.tris

    tnodes = jnp.zeros((8, mt), jnp.float32)
    tnodes = tnodes.at[0:3].set(tlas.t_bmin.T)
    tnodes = tnodes.at[3:6].set(tlas.t_bmax.T)
    tmeta = jnp.zeros((3, mt), jnp.int32)
    tmeta = tmeta.at[0].set(tlas.t_inst)
    tmeta = tmeta.at[1].set(tlas.t_escape)
    tmeta = tmeta.at[2].set(jnp.argmax(tlas.t_bmax - tlas.t_bmin,
                                       axis=1).astype(jnp.int32))

    inv = tlas.inv_transform
    inst = jnp.concatenate(
        [inv[:, :3, :3].reshape(-1, 9).T, inv[:, :3, 3].T],
        axis=0)                                           # (12, I)
    imeta = jnp.stack([tlas.blas_root, tlas.blas_end])    # (2, I)

    bnodes = jnp.zeros((8, mb), jnp.float32)
    bnodes = bnodes.at[0:3].set(tlas.bmin.T)
    bnodes = bnodes.at[3:6].set(tlas.bmax.T)
    bmeta = jnp.zeros((4, mb), jnp.int32)
    bmeta = bmeta.at[0].set(tlas.first)
    bmeta = bmeta.at[1].set(tlas.count)
    bmeta = bmeta.at[2].set(tlas.escape)
    bmeta = bmeta.at[3].set(jnp.argmax(tlas.bmax - tlas.bmin,
                                       axis=1).astype(jnp.int32))

    t_cnt = tris.count
    tri = jnp.zeros((9, max(8, t_cnt)), jnp.float32)
    tri = tri.at[0:3, :t_cnt].set(tris.va.T)
    tri = tri.at[3:6, :t_cnt].set(tris.e_ab.T)
    tri = tri.at[6:9, :t_cnt].set(tris.e_ac.T)

    block = BLOCK_ROWS * LANE
    n_pad = -(-n // block) * block
    rows = n_pad // LANE

    def to3(x, fill):
        pad = jnp.full((n_pad, 3), fill, x.dtype).at[:n].set(x)
        return pad.T.reshape(3, rows, LANE)

    o3 = to3(o, 0.0)
    d3 = to3(jnp.where(jnp.sum(d * d, axis=-1, keepdims=True) > 0.0,
                       d, 1.0), 1.0)
    # Pad lanes carry (t_min 1, t_max 0): an empty interval that can't
    # extend the packet traversal or accept a hit.  t_min may be a
    # per-lane vector (alpha re-cast rounds).
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_min2 = jnp.full((n_pad,), jnp.float32(1.0)).at[:n].set(
        t_min_b).reshape(rows, LANE)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_max2 = jnp.full((n_pad,), jnp.float32(0.0)).at[:n].set(
        t_max_b).reshape(rows, LANE)

    t, bi, btri, u, v = _traverse_tlas(
        tnodes, tmeta, inst, imeta, bnodes, bmeta, tri, o3, d3,
        t_min2,
        jnp.asarray(DET_EPS, jnp.float32), t_max2, interpret=interpret,
        ordered=tlas_ordered(int(tlas.transform.shape[0])))
    flat = lambda x: x.reshape(-1)[:n]
    return expand_winner(tlas, o, d, flat(t), flat(bi), flat(btri),
                         flat(u), flat(v))
