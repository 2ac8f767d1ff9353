"""HBM-streamed packet TLAS traversal (tables of ANY size).

The resident packet kernel (mrt/ops/pallas_bvh.py) keeps all traversal
tables in SMEM, which caps scene size at SMEM_TABLE_BUDGET
(mrt/ops/budget.py).  This kernel removes the cap: each table *group*
  A: TLAS nodes+meta    B: instance transforms+meta
  C: BLAS nodes+meta    D: triangles
independently either stays SMEM-resident (if it fits its share of the
budget) or lives in HBM and is read through a direct-mapped-ish page
cache in SMEM scratch: accesses look up the entry's page in a small tag
array (unrolled compare), and on a miss DMA the (rows, PAGE) page slice
HBM->SMEM (double semaphore so the f32 and i32 planes of a group fly
together), round-robin over the slots.

Traversal order is depth-first with escape indices, so accesses cluster
heavily within pages; coherent packets take a handful of misses per
entered subtree.  The packet shares one scalar cursor exactly like the
resident kernel — semantics are identical (same winner, same tie rules),
verified against the XLA traversal in tests/test_stream.py.

This is what renders the reference's largest scene at reference scale:
Menger level 5 (src/scenes/menger.rs:86-124) builds a TLAS whose node +
instance tables alone are ~1 MB; group A and B stream while the baked
sponge-block BLAS (group C/D, ~70 KB) stays resident and keeps the hot
leaf loop at full speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_spheres import LANE, BLOCK_ROWS
from . import budget

INF = float("inf")
from ..geometry.bvh import LEAF_SIZE  # single source of truth

PAGE = 256      # entries per cached page (lane-dim slice of the table)

# (f32 rows, i32 rows) per group.
GROUPS = {
    "tlas": (8, 2),
    "inst": (12, 2),
    "blas": (8, 4),
    "tri": (9, 0),
}
_ORDER = ("tlas", "inst", "blas", "tri")

# Cache slots per streamed group: at least MIN so double-buffering
# works, grown up to MAX from leftover SMEM (choose_streaming); MAX
# bounds the unrolled tag-compare / lax.switch fill bodies.
MIN_SLOTS = 2
DEFAULT_SLOTS = 4
MAX_SLOTS = 8

# Packet size (rays = rows * LANE) for the streamed kernel.  Streamed
# scenes are the incoherent-instanced ones where the shared per-packet
# cursor pays the union of subtree visits; smaller packets keep the
# union tight (hardware A/B in tools/probe_menger_block.py).
# Floor 8: Mosaic requires the sublane block dim divisible by 8
# (verified via tools/aot_check.py — rows<8 fails TPU compilation), so
# 1024 lanes is the smallest packet this layout supports; sub-1024
# packets would need multiple cursors per program instead.
import os as _os

STREAM_BLOCK_ROWS = max(8, int(_os.environ.get("MRT_STREAM_BLOCK_ROWS",
                                               "8")))


def _row_pad(rows):
    """HBM->SMEM DMA slices must be 8-sublane aligned in dim 0 (Mosaic
    tiling (8,128) for 32-bit types): streamed tables pad their row
    count to a multiple of 8, and the page-cache slots match."""
    return -(-rows // 8) * 8


def _page_bytes(name):
    frows, irows = GROUPS[name]
    rows = _row_pad(frows) + (_row_pad(irows) if irows else 0)
    return rows * PAGE * 4


def _make_reader(name, n_slots, f_ref, i_ref, f_cache, i_cache, tags,
                 rr, sems, nodma=False):
    """Returns entry(idx) -> (readf(row), readi(row)) for one group.

    Resident groups (n_slots == 0) read SMEM directly.  Streamed groups
    resolve the entry's page ONCE per entry() through the tag array
    (unrolled compare), DMA-filling a round-robin slot on miss; the
    returned closures then read cached scalars with no further lookups.

    nodma=True is a PROFILING ABLATION: the miss path claims the slot
    and updates the tag but skips the HBM DMA (reads stale data) —
    times the kernel's cost floor with the miss-DMA cost removed.
    """
    frows, irows = GROUPS[name]
    if not n_slots:
        def entry(idx):
            return (lambda row: f_ref[row, idx]), \
                   (lambda row: i_ref[row, idx])
        return entry

    def locate(idx):
        page = idx // PAGE
        slot = jnp.int32(-1)
        for s in range(n_slots):
            slot = jnp.where(tags[s] == page, jnp.int32(s), slot)

        def miss(_):
            target = rr[0] % n_slots
            rr[0] = rr[0] + 1

            def fill(s):
                def go(_):
                    if not nodma:
                        src = f_ref.at[:, pl.ds(page * PAGE, PAGE)]
                        d1 = pltpu.make_async_copy(src, f_cache.at[s],
                                                   sems.at[0])
                        d1.start()
                        if irows:
                            d2 = pltpu.make_async_copy(
                                i_ref.at[:, pl.ds(page * PAGE, PAGE)],
                                i_cache.at[s], sems.at[1])
                            d2.start()
                        d1.wait()
                        if irows:
                            d2.wait()
                    tags[s] = page
                    return jnp.int32(s)
                return go

            return jax.lax.switch(target,
                                  [fill(s) for s in range(n_slots)], None)

        slot = jax.lax.cond(slot < 0, miss, lambda _: slot, None)
        return slot, idx - page * PAGE

    def entry(idx):
        slot, off = locate(idx)
        return (lambda row: f_cache[slot, row, off]), \
               (lambda row: i_cache[slot, row, off])
    return entry


def _build_kernel(streamed, n_tlas, nodma=False):
    """streamed: dict name -> bool (static); returns the kernel fn."""

    def kernel(scalars_ref, tnodes, tmeta, inst, imeta, bnodes, bmeta,
               tri, o_ref, d_ref, tmin_ref, tmax_ref,
               t_out, inst_out, tri_out, u_out, v_out, *scratch):
        # ---- unpack scratch: per streamed group (f_cache, i_cache?,
        # tags, rr), then the shared DMA semaphore pair ----------------
        refs = {"tlas": (tnodes, tmeta), "inst": (inst, imeta),
                "blas": (bnodes, bmeta), "tri": (tri, None)}
        it = iter(scratch)
        readers = {}
        init_tags = []
        for name in _ORDER:
            frows, irows = GROUPS[name]
            n_slots = streamed[name]
            if n_slots:
                f_cache = next(it)
                i_cache = next(it) if irows else None
                tags = next(it)
                rr = next(it)
                sems = next(it)
                init_tags.append((tags, n_slots, rr))
                readers[name] = _make_reader(
                    name, n_slots, refs[name][0], refs[name][1],
                    f_cache, i_cache, tags, rr, sems, nodma=nodma)
            else:
                readers[name] = _make_reader(
                    name, 0, refs[name][0], refs[name][1],
                    None, None, None, None, None)
        for tags, n_slots, rr in init_tags:
            for s in range(n_slots):
                tags[s] = jnp.int32(-1)
            rr[0] = jnp.int32(0)

        tn_entry = readers["tlas"]
        in_entry = readers["inst"]
        bn_entry = readers["blas"]
        tr_entry = readers["tri"]
        tri_last = tri.shape[1] - 1  # DMA-safe clamp for leaf reads

        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        # Hoisted inverse directions: an in-slab divide costs 3 vector
        # divides per node; the ray only changes on instance enter.
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
            tnode, inst_c = carry[0], carry[1]
            return (inst_c >= 0) | (tnode < n_tlas)

        def body(carry):
            (tnode, inst_c, resume, bnode, bend,
             lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
             bt, b_inst, b_tri, bu, bv) = carry

            def tlas_phase(c):
                (tnode, inst_c, resume, bnode, bend,
                 lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                 bt, b_inst, b_tri, bu, bv) = c
                n = tnode
                tf, ti = tn_entry(n)
                near = t_min
                far = jnp.minimum(bt, t_max)
                near, far = slab(tf(0), tf(3), ox, inv_dx, near, far)
                near, far = slab(tf(1), tf(4), oy, inv_dy, near, far)
                near, far = slab(tf(2), tf(5), oz, inv_dz, near, far)
                any_hit = jnp.any(near <= far)
                leaf_inst = ti(0)
                escape = ti(1)
                enter = any_hit & (leaf_inst >= 0)

                def do_enter(_):
                    i = leaf_inst
                    inf, ini = in_entry(i)
                    r = [inf(k) for k in range(12)]
                    nlox = r[0] * ox + r[1] * oy + r[2] * oz + r[9]
                    nloy = r[3] * ox + r[4] * oy + r[5] * oz + r[10]
                    nloz = r[6] * ox + r[7] * oy + r[8] * oz + r[11]
                    nldx = r[0] * dx + r[1] * dy + r[2] * dz
                    nldy = r[3] * dx + r[4] * dy + r[5] * dz
                    nldz = r[6] * dx + r[7] * dy + r[8] * dz
                    return (escape, i, ini(0), ini(1),
                            nlox, nloy, nloz, nldx, nldy, nldz,
                            1.0 / nldx, 1.0 / nldy, 1.0 / nldz)

                def no_enter(_):
                    nxt = jnp.where(any_hit, n + 1, escape)
                    return (nxt, jnp.int32(-1), jnp.int32(0),
                            jnp.int32(0),
                            lox, loy, loz, ldx, ldy, ldz, lix, liy, liz)

                (tnode2, inst2, bnode2, bend2, lox2, loy2, loz2, ldx2,
                 ldy2, ldz2, lix2, liy2, liz2) = jax.lax.cond(
                     enter, do_enter, no_enter, None)
                return (tnode2, inst2, tnode2, bnode2, bend2,
                        lox2, loy2, loz2, ldx2, ldy2, ldz2,
                        lix2, liy2, liz2,
                        bt, b_inst, b_tri, bu, bv)

            def blas_phase(c):
                (tnode, inst_c, resume, bnode, bend,
                 lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                 bt, b_inst, b_tri, bu, bv) = c
                n = bnode
                bf, bi_ = bn_entry(n)
                near = t_min
                far = jnp.minimum(bt, t_max)
                near, far = slab(bf(0), bf(3), lox, lix, near, far)
                near, far = slab(bf(1), bf(4), loy, liy, near, far)
                near, far = slab(bf(2), bf(5), loz, liz, near, far)
                any_hit = jnp.any(near <= far)
                first = bi_(0)
                count = bi_(1)
                escape = bi_(2)
                is_leaf = count > 0

                def tri_test(s, carry):
                    bt, b_inst, b_tri, bu, bv = carry
                    trf, _ = tr_entry(s)
                    vax, vay, vaz = trf(0), trf(1), trf(2)
                    abx, aby, abz = trf(3), trf(4), trf(5)
                    acx, acy, acz = trf(6), trf(7), trf(8)
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
                    # (instance, triangle); matches instance.py and the
                    # SMEM-resident TLAS kernel bit-exactly.
                    ok = (det_ok & (u >= 0.0) & (u <= 1.0)
                          & (v >= 0.0) & (u + v <= 1.0)
                          & (t >= t_min) & (t <= t_max)
                          & ((t < bt) | ((t == bt)
                                         & ((inst_c < b_inst)
                                            | ((inst_c == b_inst)
                                               & (s < b_tri))))))
                    return (jnp.where(ok, t, bt),
                            jnp.where(ok, inst_c, b_inst),
                            jnp.where(ok, s, b_tri),
                            jnp.where(ok, u, bu), jnp.where(ok, v, bv))

                def test_leaf(carry):
                    for j in range(LEAF_SIZE):
                        s = jnp.minimum(first + j, tri_last)
                        carry = jax.lax.cond(
                            j < count,
                            functools.partial(tri_test, s),
                            lambda c: c, carry)
                    return carry

                bt, b_inst, b_tri, bu, bv = jax.lax.cond(
                    any_hit & is_leaf, test_leaf, lambda c: c,
                    (bt, b_inst, b_tri, bu, bv))

                nxt = jnp.where(any_hit & ~is_leaf, n + 1, escape)
                done = nxt >= bend
                inst2 = jnp.where(done, -1, inst_c)
                tnode2 = jnp.where(done, resume, tnode)
                bnode2 = jnp.where(done, 0, nxt)
                return (tnode2, inst2, resume, bnode2, bend,
                        lox, loy, loz, ldx, ldy, ldz, lix, liy, liz,
                        bt, b_inst, b_tri, bu, bv)

            return jax.lax.cond(inst_c >= 0, blas_phase, tlas_phase,
                                carry)

        zero = jnp.zeros_like(t_max)
        izero = jnp.zeros_like(t_max, dtype=jnp.int32)
        init = (jnp.int32(0), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
                jnp.int32(0),
                zero, zero, zero, zero, zero, zero, zero, zero, zero,
                jnp.full_like(t_max, INF), izero - 1, izero, zero, zero)
        out = jax.lax.while_loop(cond, body, init)
        t_out[:] = out[14]
        inst_out[:] = out[15]
        tri_out[:] = out[16]
        u_out[:] = out[17]
        v_out[:] = out[18]

    return kernel


def _pad_lane(x, mult, fill):
    n = x.shape[1]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)


def choose_streaming(tlas) -> dict:
    """Greedy static plan: name -> cache slots (0 = SMEM-resident).

    Keep the hottest groups resident while the running total (tables +
    page caches of streamed groups) fits the budget — priority tri,
    blas (the leaf-test inner loop), then inst, then tlas — then grow
    the streamed groups' caches round-robin with whatever budget is
    left (more slots = fewer DMA misses on wide traversals)."""
    g = budget.tlas_group_bytes(tlas)
    plan = {name: MIN_SLOTS for name in _ORDER}
    used = sum(MIN_SLOTS * _page_bytes(n) for n in _ORDER)
    for name in ("tri", "blas", "inst", "tlas"):
        candidate = used - plan[name] * _page_bytes(name) + g[name]
        if candidate < budget.SMEM_TABLE_BUDGET:
            plan[name] = 0
            used = candidate
    grew = True
    while grew:
        grew = False
        for name in ("tri", "blas", "inst", "tlas"):
            if (0 < plan[name] < MAX_SLOTS
                    and used + _page_bytes(name)
                    < budget.SMEM_TABLE_BUDGET):
                plan[name] += 1
                used += _page_bytes(name)
                grew = True
    return plan


def _normalize_plan(streamed) -> dict:
    """Accept bools (True = DEFAULT_SLOTS) or explicit slot counts."""
    out = {}
    for name in _ORDER:
        v = streamed[name]
        out[name] = (DEFAULT_SLOTS if v is True
                     else 0 if v is False else int(v))
    return out


@functools.partial(jax.jit, static_argnames=("streamed_key", "n_tlas",
                                             "interpret", "block_rows",
                                             "nodma"))
def _traverse(tnodes, tmeta, inst, imeta, bnodes, bmeta, tri,
              o3, d3, t_min2, det_eps, t_max2, streamed_key, n_tlas,
              interpret=False, block_rows=BLOCK_ROWS, nodma=False):
    streamed = dict(zip(_ORDER, streamed_key))
    r = o3.shape[1]
    grid = (pl.cdiv(r, block_rows),)
    scalars = jnp.stack([jnp.asarray(det_eps, jnp.float32)])

    # n_tlas is the UNPADDED node count: escape indices terminate at it,
    # so lane-pad nodes are never visited (and never DMA'd).
    kernel = _build_kernel(streamed, n_tlas=n_tlas, nodma=nodma)

    def table_spec(shape, is_streamed):
        if is_streamed:
            return pl.BlockSpec(memory_space=pl.ANY)
        return pl.BlockSpec(shape, lambda g, c: tuple(0 for _ in shape),
                            memory_space=pltpu.SMEM)

    ray_spec = pl.BlockSpec((3, block_rows, LANE), lambda g, c: (0, g, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block_rows, LANE), lambda g, c: (g, 0),
                            memory_space=pltpu.VMEM)

    scratch = []
    for name in _ORDER:
        frows, irows = GROUPS[name]
        n_slots = streamed[name]
        if n_slots:
            scratch.append(pltpu.SMEM((n_slots, _row_pad(frows), PAGE),
                                      jnp.float32))
            if irows:
                scratch.append(pltpu.SMEM((n_slots, _row_pad(irows),
                                           PAGE), jnp.int32))
            scratch.append(pltpu.SMEM((n_slots,), jnp.int32))  # tags
            scratch.append(pltpu.SMEM((1,), jnp.int32))        # rr
            scratch.append(pltpu.SemaphoreType.DMA((2,)))

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                table_spec(tnodes.shape, streamed["tlas"]),
                table_spec(tmeta.shape, streamed["tlas"]),
                table_spec(inst.shape, streamed["inst"]),
                table_spec(imeta.shape, streamed["inst"]),
                table_spec(bnodes.shape, streamed["blas"]),
                table_spec(bmeta.shape, streamed["blas"]),
                table_spec(tri.shape, streamed["tri"]),
                ray_spec, ray_spec, out_spec, out_spec,
            ],
            out_specs=[out_spec] * 5,
            scratch_shapes=scratch,
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


def intersect_tlas(tlas, o, d, t_min, t_max, interpret=False,
                   streamed=None, block_rows=None):
    """Drop-in replacement for pallas_bvh.intersect_tlas with no table
    size limit (streams oversized groups from HBM).

    block_rows: rays per packet = block_rows * LANE.  The packet shares
    one traversal cursor, so on diverged rays its cost is the UNION of
    the rays' subtree visits — smaller packets trade vector width for
    tighter unions.  Default: STREAM_BLOCK_ROWS (env
    MRT_STREAM_BLOCK_ROWS), tuned for incoherent instanced scenes.
    """
    from ..geometry.instance import expand_winner
    from ..geometry.triangles import DET_EPS

    n = o.shape[0]
    mt = tlas.n_tlas_nodes
    mb = tlas.bmin.shape[0]
    tris = tlas.tris

    if streamed is None:
        streamed = choose_streaming(tlas)
    streamed = _normalize_plan(streamed)
    streamed_key = tuple(streamed[k] for k in _ORDER)

    def padf(x, fill=0.0):
        return _pad_lane(x, PAGE, fill)

    tnodes = jnp.zeros((8, mt), jnp.float32)
    tnodes = tnodes.at[0:3].set(tlas.t_bmin.T)
    tnodes = tnodes.at[3:6].set(tlas.t_bmax.T)
    tmeta = jnp.zeros((2, mt), jnp.int32)
    tmeta = tmeta.at[0].set(tlas.t_inst)
    tmeta = tmeta.at[1].set(tlas.t_escape)
    # Lane padding: pad TLAS nodes as "dead leaves" that escape past the
    # end (never reached: cond() stops at n_tlas == mt).
    tnodes = padf(tnodes)
    tmeta = _pad_lane(tmeta, PAGE, 0)

    inv = tlas.inv_transform
    inst = jnp.concatenate(
        [inv[:, :3, :3].reshape(-1, 9).T, inv[:, :3, 3].T], axis=0)
    imeta = jnp.stack([tlas.blas_root, tlas.blas_end])
    inst = padf(inst)
    imeta = _pad_lane(imeta, PAGE, 0)

    bnodes = jnp.zeros((8, mb), jnp.float32)
    bnodes = bnodes.at[0:3].set(tlas.bmin.T)
    bnodes = bnodes.at[3:6].set(tlas.bmax.T)
    bmeta = jnp.zeros((4, mb), jnp.int32)
    bmeta = bmeta.at[0].set(tlas.first)
    bmeta = bmeta.at[1].set(tlas.count)
    bmeta = bmeta.at[2].set(tlas.escape)
    bnodes = padf(bnodes)
    bmeta = _pad_lane(bmeta, PAGE, 0)

    t_cnt = tris.count
    tri = jnp.zeros((9, t_cnt), jnp.float32)
    tri = tri.at[0:3].set(tris.va.T)
    tri = tri.at[3:6].set(tris.e_ab.T)
    tri = tri.at[6:9].set(tris.e_ac.T)
    tri = padf(tri)

    # Streamed tables live in HBM and are DMA'd as (rows, PAGE) slices;
    # Mosaic requires dim-0 slices 8-sublane aligned, so pad their row
    # counts (rows are indexed by constant < logical rows, so the pad
    # rows are dead weight only).
    def pad_rows(x):
        pad = _row_pad(x.shape[0]) - x.shape[0]
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    if streamed["tlas"]:
        tnodes, tmeta = pad_rows(tnodes), pad_rows(tmeta)
    if streamed["inst"]:
        inst, imeta = pad_rows(inst), pad_rows(imeta)
    if streamed["blas"]:
        bnodes, bmeta = pad_rows(bnodes), pad_rows(bmeta)
    if streamed["tri"]:
        tri = pad_rows(tri)

    if block_rows is None:
        block_rows = STREAM_BLOCK_ROWS
    block = block_rows * LANE
    n_pad = -(-n // block) * block
    rows = n_pad // LANE

    def to3(x, fill):
        pad = jnp.full((n_pad, 3), fill, x.dtype).at[:n].set(x)
        return pad.T.reshape(3, rows, LANE)

    o3 = to3(o, 0.0)
    d3 = to3(jnp.where(jnp.sum(d * d, axis=-1, keepdims=True) > 0.0,
                       d, 1.0), 1.0)
    # Pad lanes carry (t_min 1, t_max 0): an empty interval.  t_min
    # may be a per-lane vector (alpha re-cast rounds).
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_min2 = jnp.full((n_pad,), jnp.float32(1.0)).at[:n].set(
        t_min_b).reshape(rows, LANE)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    t_max2 = jnp.full((n_pad,), jnp.float32(0.0)).at[:n].set(
        t_max_b).reshape(rows, LANE)

    t, bi, btri, u, v = _traverse(
        tnodes, tmeta, inst, imeta, bnodes, bmeta, tri, o3, d3,
        t_min2,
        jnp.asarray(DET_EPS, jnp.float32), t_max2, streamed_key, mt,
        interpret=interpret, block_rows=block_rows)
    flat = lambda x: x.reshape(-1)[:n]
    return expand_winner(tlas, o, d, flat(t), flat(bi), flat(btri),
                         flat(u), flat(v))
