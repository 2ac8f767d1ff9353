"""Pallas TPU kernel: wavefront ray-sphere nearest hit.

The XLA scan in `geometry.spheres.nearest_t` materialises (chunk, N)
temporaries in HBM between fusion boundaries; this kernel keeps the
whole working set on-chip — the sphere SoA lives in VMEM, each grid
program owns an (8,128)-tiled block of rays in registers, and the
sphere loop runs entirely on the VPU with no HBM traffic besides the
ray load and the (t, index) store.

Layouts:
  rays     (3, R, 128) float32 — component-major so each component of a
           ray block is a native 8x128 VREG tile.
  spheres  (4, S) float32 — rows cx, cy, cz, radius; S padded to 8.

Semantics identical to geometry.spheres.nearest_t (near-then-far root
selection of geom.rs:64-75, lowest index wins ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
# Rays per packet program = BLOCK_ROWS * LANE.  8 rows = 1024 rays =
# one (8,128) f32 vreg per elementwise op.  Larger packets amortise
# the scalar traversal control (SMEM node loads, cursor updates) over
# more rays — on union-saturated divergent scenes (eve/lucy mid-path
# packets visit ~the whole tree regardless of packet size) total
# traversal iterations scale ~1/packet-size while per-iteration vector
# cost grows, so the optimum is hardware-measured
# (tools/probe_block_rows.py).  Env override is read at import.
import os as _os
BLOCK_ROWS = int(_os.environ.get("MRT_BLOCK_ROWS", "8"))
INF = float('inf')  # python float: jnp scalars would be captured consts in the kernel


def _kernel(count_ref, sph_ref, o_ref, d_ref, tmax_ref, t_out, i_out,
            *, n_spheres):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]        # (BR,128)
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    od = ox * dx + oy * dy + oz * dz
    t_min = count_ref[1]
    n_real = count_ref[0].astype(jnp.int32)
    t_max = tmax_ref[:]

    def body(s, carry):
        bt, bi = carry
        cx = sph_ref[0, s]
        cy = sph_ref[1, s]
        cz = sph_ref[2, s]
        r = sph_ref[3, s]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        half_b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a * c
        ok = (disc >= 0.0) & (s < n_real)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r0 = (-half_b - sq) * inv_a
        r1 = (-half_b + sq) * inv_a
        lim = jnp.minimum(bt, t_max)
        ok0 = ok & (r0 >= t_min) & (r0 <= lim)
        ok1 = ok & (r1 >= t_min) & (r1 <= lim)
        root = jnp.where(ok0, r0, jnp.where(ok1, r1, INF))
        better = root < bt
        return (jnp.where(better, root, bt),
                jnp.where(better, s, bi))

    init = (jnp.full_like(a, INF), jnp.zeros_like(a, dtype=jnp.int32))
    bt, bi = jax.lax.fori_loop(0, n_spheres, body, init)
    t_out[:] = bt
    i_out[:] = bi


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def nearest_t_pallas(sph, count, o3, d3, t_min, t_max2, interpret=False):
    """Low-level entry.

    sph: (4, S) sphere SoA (S multiple of 8);
    count: () int32 real sphere count;
    o3/d3: (3, R, 128) rays; t_max2: (R, 128).
    Returns (t (R,128), i (R,128)).
    """
    r = o3.shape[1]
    grid = (pl.cdiv(r, BLOCK_ROWS),)
    s_pad = sph.shape[1]
    scalars = jnp.stack([count.astype(jnp.float32),
                         jnp.asarray(t_min, jnp.float32)])

    kernel = functools.partial(_kernel, n_spheres=s_pad)
    t, i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # Sphere SoA in SMEM: the kernel reads it with dynamic
                # scalar indices, which Mosaic forbids on VMEM lanes.
                pl.BlockSpec((4, s_pad), lambda g, c: (0, 0),
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
        ),
        out_shape=[
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, sph, o3, d3, t_max2)
    return t, i


def _kernel_x(sph_ref, o_ref, d_ref, tmin_ref, tmax_ref, t_out, i_out,
              *, n_spheres):
    """Expanded-form variant: the same per-pair arithmetic as the XLA
    chunk scan in geometry.spheres.nearest_t (half_b = o.d - c.d,
    c_term = (o.o - 2 c.o) + (c.c - r^2)), agreeing to FMA-contraction
    ulps (near-tangent hits amplify through sqrt; tested at the same
    tolerance as the direct-form kernel).  Differences from `_kernel`:
    per-sphere constants are precomputed (ccrr), padding spheres are
    poisoned with ccrr=+inf instead of a count mask, the far root is
    only taken when the near root is below t_min (winner-equivalent:
    any candidate the tighter rule rejects exceeds the running best),
    and the sphere loop is unrolled 4x to pipeline SMEM scalar
    loads."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]        # (BR,128)
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    od = ox * dx + oy * dy + oz * dz
    oo = ox * ox + oy * oy + oz * oz
    t_min = tmin_ref[:]
    t_max = tmax_ref[:]

    def one(s, bt, bi):
        cx = sph_ref[0, s]
        cy = sph_ref[1, s]
        cz = sph_ref[2, s]
        ccrr = sph_ref[3, s]
        cd = cx * dx + cy * dy + cz * dz
        co = cx * ox + cy * oy + cz * oz
        half_b = od - cd
        c_term = (oo - 2.0 * co) + ccrr
        disc = half_b * half_b - a * c_term
        ok = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        nhb = -half_b
        r0 = (nhb - sq) * inv_a
        r1 = (nhb + sq) * inv_a
        root = jnp.where(r0 >= t_min, r0, r1)
        valid = ok & (root >= t_min) & (root <= t_max)
        root = jnp.where(valid, root, INF)
        better = root < bt
        return (jnp.where(better, root, bt),
                jnp.where(better, s, bi))

    def body(k, carry):
        bt, bi = carry
        s = k * 4
        bt, bi = one(s, bt, bi)
        bt, bi = one(s + 1, bt, bi)
        bt, bi = one(s + 2, bt, bi)
        bt, bi = one(s + 3, bt, bi)
        return bt, bi

    init = (jnp.full_like(a, INF), jnp.zeros_like(a, dtype=jnp.int32))
    bt, bi = jax.lax.fori_loop(0, n_spheres // 4, body, init)
    t_out[:] = bt
    i_out[:] = bi


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_t_pallas_x(sph, o3, d3, t_min2, t_max2, interpret=False):
    """Expanded-form entry.  sph: (4, S) rows cx cy cz ccrr, S multiple
    of 4 with padding rows ccrr=+inf; o3/d3: (3, R, 128); t_min2/t_max2:
    (R, 128).  Returns (t (R,128), i (R,128))."""
    r = o3.shape[1]
    grid = (pl.cdiv(r, BLOCK_ROWS),)
    s_pad = sph.shape[1]

    kernel = functools.partial(_kernel_x, n_spheres=s_pad)
    t, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, s_pad), lambda g: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, BLOCK_ROWS, LANE), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK_ROWS, LANE), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, LANE), jnp.float32),
            jax.ShapeDtypeStruct((r, LANE), jnp.int32),
        ],
        interpret=interpret,
    )(sph, o3, d3, t_min2, t_max2)
    return t, i


def nearest_t_x(spheres, o, d, t_min, t_max, interpret=False):
    """Expanded-form drop-in for geometry.spheres.nearest_t (FMA-ulp
    agreement; winners >99% identical, near-ties may swap)."""
    n = o.shape[0]
    s = spheres.count
    s_pad = max(8, -(-s // 8) * 8)

    c = spheres.center
    ccrr = (jnp.sum(c * c, axis=-1)
            - spheres.radius * spheres.radius)
    sph = jnp.full((4, s_pad), jnp.inf, jnp.float32)
    sph = sph.at[:3, :s].set(c.T)
    sph = sph.at[:3, s:].set(0.0)
    sph = sph.at[3, :s].set(ccrr)

    block = BLOCK_ROWS * LANE
    n_pad = -(-n // block) * block
    rows = n_pad // LANE

    def to3(x):
        pad = jnp.zeros((n_pad, 3), x.dtype).at[:n].set(x)
        return pad.T.reshape(3, rows, LANE)

    o3 = to3(o)
    d3 = to3(jnp.where(jnp.sum(d * d, axis=-1, keepdims=True) > 0.0,
                       d, 1.0))
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_min2 = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        t_min_b).reshape(rows, LANE)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_max2 = jnp.full((n_pad,), INF).at[:n].set(
        t_max_b).reshape(rows, LANE)

    t, i = nearest_t_pallas_x(sph, o3, d3, t_min2, t_max2,
                              interpret=interpret)
    return t.reshape(-1)[:n], i.reshape(-1)[:n]


def nearest_t(spheres, o, d, t_min, t_max, interpret=False):
    """Drop-in replacement for geometry.spheres.nearest_t backed by the
    Pallas kernel.  o, d: (N,3); returns (t (N,), i (N,))."""
    n = o.shape[0]
    s = spheres.count
    s_pad = max(8, -(-s // 8) * 8)

    sph = jnp.zeros((4, s_pad), jnp.float32)
    sph = sph.at[:3, :s].set(spheres.center.T)
    sph = sph.at[3, :s].set(spheres.radius)

    block = BLOCK_ROWS * LANE
    n_pad = -(-n // block) * block
    rows = n_pad // LANE

    def to3(x):
        pad = jnp.zeros((n_pad, 3), x.dtype).at[:n].set(x)
        # pad rays point +x from far away: never hit real spheres... in
        # fact their results are sliced off, values irrelevant.
        return pad.T.reshape(3, rows, LANE)

    o3 = to3(o)
    d3 = to3(jnp.where(jnp.sum(d * d, axis=-1, keepdims=True) > 0.0,
                       d, 1.0))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_max2 = jnp.full((n_pad,), INF).at[:n].set(
        t_max_b).reshape(rows, LANE)

    t, i = nearest_t_pallas(sph, jnp.asarray(s, jnp.int32), o3, d3,
                            jnp.asarray(t_min, jnp.float32), t_max2,
                            interpret=interpret)
    return t.reshape(-1)[:n], i.reshape(-1)[:n]
