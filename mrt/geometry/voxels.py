"""Voxel-grid geometry: hierarchical DDA over unit-cell occupancy.

The reference's largest scene builds the level-5 Menger sponge as 20^5 =
3.2M instanced cubes and BVH-traverses them (reference:
src/scenes/menger.rs:68-124).  Pointer-chasing a multi-megabyte BVH is
the worst possible TPU program: every traversal step is a dependent
scalar load (our HBM-streamed packet kernel renders it correctly but
DMA-latency-bound, see mrt/ops/pallas_stream.py).  The TPU-first
observation is that the sponge's cubes exactly tile cells of a regular
3^level grid whose occupancy is a *closed-form digit rule* — so the
closest hit is a 3-DDA walk with purely arithmetic occupancy tests:
zero tables, zero gathers, per-lane cursors (no packet divergence), all
elementwise XLA that fuses straight into the integrator step.

`VoxelGrid` is the general component: an axis-aligned grid of solid
unit cells with occupancy either

  rule="menger":  cell solid iff at no base-3 digit position do >= 2 of
                  the 3 coordinates have digit 1 (the 20-of-27 pattern,
                  menger.rs:105-126) — fully procedural, and
                  hierarchical: a failed digit at position q empties the
                  whole 3^q-cell block, which the DDA skips in one step.
  rule="dense":   an explicit (n,n,n) bool array; a host-built any-
                  occupancy mip pyramid provides the same hierarchical
                  empty-block skipping (lookups are one-hot matmuls, so
                  no TPU gather pathology; sized for moderate grids).

Hit semantics equal the interior-face-culled cube surface that
scenes/menger.sponge_block_mesh bakes (and, for rays that never start
inside a solid, the reference's per-cube triangle set): the hit is the
first cell boundary along the ray where occupancy flips, with the
axis-aligned normal stored flipped against the ray (geom.rs:17-24) and
front_face = (empty -> solid) crossing.  Rays that begin inside a solid
march to the first solid -> empty boundary and register a back-face hit
there, exactly where the culled mesh's exposed face is.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .hit import Hits, INF

_BIG = jnp.float32(3.4e38)


@struct.dataclass
class VoxelGrid:
    origin: jnp.ndarray      # (3,) world min corner of cell (0,0,0)
    cell: jnp.ndarray        # ()   cell edge length
    material: jnp.ndarray    # ()   int32 MaterialTable row
    levels: int = struct.field(pytree_node=False, default=1)
    rule: str = struct.field(pytree_node=False, default="menger")
    # rule="dense" only: mip[0] = (n,n,n) occupancy, mip[q] = 3^q-block
    # any-reduction, ..., each stored as float 0/1 flattened to
    # (n_q * n_q, n_q) for one-hot row lookups.
    mips: Optional[Any] = None

    @property
    def n(self) -> int:
        return 3 ** self.levels

    @property
    def side(self):
        return self.n * self.cell

    def world_bounds(self):
        return self.origin, self.origin + self.side

    @classmethod
    def create(cls, origin, cell, levels, material, rule="menger",
               occupancy=None):
        if rule == "dense":
            occ = np.asarray(occupancy, bool)
            n = 3 ** levels
            if occ.shape != (n, n, n):
                raise ValueError(f"dense occupancy must be {(n, n, n)}, "
                                 f"got {occ.shape}")
            mips = []
            cur = occ
            for _ in range(levels + 1):
                m = cur.shape[0]
                mips.append(jnp.asarray(
                    cur.reshape(m * m, m).astype(np.float32)))
                if m > 1:
                    cur = cur.reshape(m // 3, 3, m // 3, 3, m // 3, 3) \
                             .any(axis=(1, 3, 5))
            mips = tuple(mips)
        elif rule == "menger":
            mips = None
        else:
            raise ValueError(f"unknown voxel rule {rule!r}")
        return cls(origin=jnp.asarray(origin, jnp.float32),
                   cell=jnp.float32(cell),
                   material=jnp.int32(material),
                   levels=int(levels), rule=rule, mips=mips)


def _menger_levels(grid, cx, cy, cz):
    """(occupied, skip_pow) for fine cell coords (N,) int32.

    occupied: the fine cell is solid.  skip_pow: 3**q of the COARSEST
    digit position q whose triple fails (>= 2 digits == 1) — the whole
    3^q-cell block is empty and can be skipped in one DDA step; 1 when
    only the fine cell fails or the cell is solid.
    """
    occupied = jnp.ones(cx.shape, bool)
    skip = jnp.ones(cx.shape, jnp.int32)
    x, y, z = cx, cy, cz
    for q in range(grid.levels):
        bad = ((x % 3 == 1).astype(jnp.int32)
               + (y % 3 == 1).astype(jnp.int32)
               + (z % 3 == 1).astype(jnp.int32)) >= 2
        occupied &= ~bad
        skip = jnp.where(bad, jnp.int32(3 ** q), skip)
        x, y, z = x // 3, y // 3, z // 3
    return occupied, skip


def _dense_lookup(mip, m, cx, cy, cz):
    """mip[(cx*m + cy), cz] for (N,) coords, gather-free.

    One-hot matmul row pick (see mrt/ops/rowlookup.py for why: XLA
    lowers table gathers to a serial per-row loop on TPU) then a one-hot
    dot over the lane axis; exact because entries are 0/1.
    """
    rows = mip.shape[0]
    ridx = cx * m + cy
    oh_r = (ridx[:, None] == jnp.arange(rows, dtype=jnp.int32)[None, :])
    row = jnp.dot(oh_r.astype(jnp.float32), mip,
                  preferred_element_type=jnp.float32)     # (N, m)
    oh_c = (cz[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :])
    return jnp.sum(row * oh_c.astype(jnp.float32), axis=-1) > 0.5


def _dense_levels(grid, cx, cy, cz):
    """Dense-rule analogue of _menger_levels via the mip pyramid."""
    occupied = _dense_lookup(grid.mips[0], 3 ** grid.levels, cx, cy, cz)
    skip = jnp.ones(cx.shape, jnp.int32)
    x, y, z = cx, cy, cz
    for q in range(1, grid.levels + 1):
        x, y, z = x // 3, y // 3, z // 3
        blk_occ = _dense_lookup(grid.mips[q], 3 ** (grid.levels - q),
                                x, y, z)
        skip = jnp.where(blk_occ, skip, jnp.int32(3 ** q))
    return occupied, skip


def _occupancy(grid, cx, cy, cz):
    if grid.rule == "menger":
        return _menger_levels(grid, cx, cy, cz)
    return _dense_levels(grid, cx, cy, cz)


def intersect(grid: VoxelGrid, o, d, t_min, t_max) -> Hits:
    """Closest occupancy-flip boundary along each ray.

    o, d: (N, 3); d may be unnormalised.  t_min/t_max: scalar or (N,).
    """
    n = grid.n
    N = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (N,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def axis_data(oc, dc, k):
        lo = grid.origin[k]
        hi = lo + grid.side
        inv = jnp.where(dc != 0.0, 1.0 / jnp.where(dc != 0.0, dc, 1.0),
                        _BIG)
        # Parallel rays: inside the slab -> (-inf, +inf), else empty.
        para_in = (oc >= lo) & (oc <= hi)
        t0 = jnp.where(dc != 0.0, (lo - oc) * inv,
                       jnp.where(para_in, -_BIG, _BIG))
        t1 = jnp.where(dc != 0.0, (hi - oc) * inv,
                       jnp.where(para_in, _BIG, -_BIG))
        return inv, jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    inv_x, nx_, fx_ = axis_data(ox, dx, 0)
    inv_y, ny_, fy_ = axis_data(oy, dy, 1)
    inv_z, nz_, fz_ = axis_data(oz, dz, 2)

    near_raw = jnp.maximum(nx_, jnp.maximum(ny_, nz_))
    far = jnp.minimum(t_max, jnp.minimum(fx_, jnp.minimum(fy_, fz_)))
    # Entry axis (x-first tie break) — the crossing axis when the grid
    # box itself is entered from outside.
    enter_axis = jnp.where(
        near_raw == nx_, 0, jnp.where(near_raw == ny_, 1, 2)
    ).astype(jnp.int32)
    started_in_box = near_raw < t_min
    near = jnp.maximum(near_raw, t_min)
    alive0 = (near <= far)

    inv3 = jnp.stack([inv_x, inv_y, inv_z], axis=-1)     # (N,3)
    dsign = jnp.stack([dx, dy, dz], axis=-1) > 0.0       # (N,3) bool

    # Initial cell: disambiguate exact-boundary starts by d sign (a
    # point exactly on boundary b belongs to cell b going +, b-1
    # going -); mid-cell points are unaffected (faces only live at
    # integer cell coords).  Coords stay UNclamped: out-of-range coords
    # are how box exit is detected.
    p0 = o + near[:, None] * d
    cf0 = (p0 - grid.origin[None, :]) / grid.cell
    c0 = jnp.floor(cf0).astype(jnp.int32)
    on_b = cf0 == jnp.floor(cf0)
    c0 = jnp.where(on_b & ~dsign, c0 - 1, c0)
    # Entering through a box face: that axis's cell is exactly 0 (going
    # +) or n-1 (going -) — floor() of the crossing point can be an ulp
    # off the face, which would kill the lane as out-of-box.
    entry_cell = jnp.where(dsign, 0, n - 1)
    enter_oh = (jnp.arange(3, dtype=jnp.int32)[None, :]
                == enter_axis[:, None])
    c0 = jnp.where(enter_oh & ~started_in_box[:, None], entry_cell, c0)
    in0 = jnp.all((c0 >= 0) & (c0 < n), axis=-1)

    occ0, _ = _occupancy(grid, c0[:, 0], c0[:, 1], c0[:, 2])
    occ0 &= in0
    # A solid start cell is "inside" (march to the exposed exit face)
    # only when the ray origin itself is in the box; entering the box
    # straight into a solid cell is a front hit on its boundary face.
    inside0 = started_in_box & occ0

    # Loop-carry inits must derive from varying inputs (shard_map
    # varying-axes typing — the vzero pattern, integrator/persistent):
    # plain jnp.zeros is unvarying and fails while_loop carry typing
    # when the body's outputs are varying.
    vzero_f = jnp.sum(o * 0.0, axis=-1)                   # (N,) zeros
    vzero_i = vzero_f.astype(jnp.int32)
    state = dict(
        t=near, c=c0, axis=enter_axis, inside=inside0,
        alive=alive0,
        hit=vzero_i.astype(bool),
        hit_t=vzero_f + INF,
        hit_axis=vzero_i,
        hit_front=vzero_i.astype(bool),
        steps=jnp.int32(0),
    )

    max_steps = 6 * n + 3 * grid.levels + 8

    def cond(s):
        return jnp.any(s["alive"]) & (s["steps"] < max_steps)

    def body(s):
        c, t = s["c"], s["t"]
        in_geom = jnp.all((c >= 0) & (c < n), axis=-1)
        in_range = t <= far  # beyond = t_max/box truncation: never a hit
        occ, skip = _occupancy(grid, c[:, 0], c[:, 1], c[:, 2])
        occ &= in_geom

        # Boundary-flip hits: empty->solid = front face; solid->empty =
        # the exposed back face (incl. solid ending at the grid box
        # face, where in_geom goes False).  Truncation by t_max is not
        # a surface: no hit past `far`.
        front_hit = s["alive"] & occ & ~s["inside"] & in_range
        back_hit = s["alive"] & ~occ & s["inside"] & in_range
        newly = front_hit | back_hit

        hit = s["hit"] | newly
        hit_t = jnp.where(newly, t, s["hit_t"])
        hit_axis = jnp.where(newly, s["axis"], s["hit_axis"])
        hit_front = jnp.where(newly, front_hit, s["hit_front"])

        alive = s["alive"] & ~newly & in_geom & in_range
        inside = occ  # marching through solid keeps inside=True

        # Advance: skip the coarsest-empty block (skip=1 while solid).
        blk = jnp.where(occ, jnp.int32(1), skip)[:, None]  # (N,1)
        b = c // blk
        bound_cell = jnp.where(dsign, (b + 1) * blk, b * blk)
        bound_w = grid.origin[None, :] + bound_cell * grid.cell
        t_ax = (bound_w - o) * inv3
        t_ax = jnp.where(jnp.abs(inv3) >= _BIG, _BIG, t_ax)
        t_next = jnp.minimum(t_ax[:, 0],
                             jnp.minimum(t_ax[:, 1], t_ax[:, 2]))
        exit_axis = jnp.where(
            t_next == t_ax[:, 0], 0,
            jnp.where(t_next == t_ax[:, 1], 1, 2)).astype(jnp.int32)
        bc = jnp.where(dsign, bound_cell, bound_cell - 1)
        exit_val = jnp.where(
            exit_axis == 0, bc[:, 0],
            jnp.where(exit_axis == 1, bc[:, 1], bc[:, 2]))
        # Non-exit axes recompute from the crossing point (they may have
        # crossed many fine boundaries inside a skipped block); the exit
        # axis is set to its exact integer so progress is guaranteed
        # even when t_next rounds to t.
        p_nxt = o + t_next[:, None] * d
        c_new = jnp.floor(
            (p_nxt - grid.origin[None, :]) / grid.cell).astype(jnp.int32)
        onehot = (jnp.arange(3, dtype=jnp.int32)[None, :]
                  == exit_axis[:, None])
        c_new = jnp.where(onehot, exit_val[:, None], c_new)

        return dict(
            t=jnp.where(alive, t_next, t),
            c=jnp.where(alive[:, None], c_new, c),
            axis=jnp.where(alive, exit_axis, s["axis"]),
            inside=jnp.where(s["alive"], inside, s["inside"]),
            alive=alive,
            hit=hit, hit_t=hit_t, hit_axis=hit_axis, hit_front=hit_front,
            steps=s["steps"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)

    hit = out["hit"]
    t = jnp.where(hit, out["hit_t"], INF)
    axis_onehot = (jnp.arange(3, dtype=jnp.int32)[None, :]
                   == out["hit_axis"][:, None])
    # Stored (flipped-against-ray) normal is -sign(d) on the crossing
    # axis for both crossing senses; front_face distinguishes them.
    nsign = jnp.where(dsign, -1.0, 1.0)
    normal = jnp.where(axis_onehot, nsign, 0.0)
    point = o + t[:, None] * d
    zeros3 = jnp.zeros((N, 3), jnp.float32)
    return Hits(
        t=t,
        point=jnp.where(hit[:, None], point, zeros3),
        normal=jnp.where(hit[:, None], normal, zeros3),
        front_face=out["hit_front"] & hit,
        uv=jnp.zeros((N, 2), jnp.float32),
        material=jnp.where(hit, grid.material,
                           jnp.zeros((N,), jnp.int32)),
        hit=hit,
        tangent=zeros3,
        bitangent=zeros3,
        prim_area=jnp.zeros((N,), jnp.float32),
    )
