"""Pallas TPU megakernel: a full persistent-integrator step block.

The persistent step (integrator/persistent.py) is latency-bound, not
compute-bound: at pool 2^16 its ~2.4 ms splits into packet-BVH
traversal (~1.0), shading (~0.65), the film scatter (~0.95, a serial
per-row XLA loop) and claim/regen bookkeeping — while the actual
arithmetic is ~100 us of VPU work.  The costs are XLA lowering
artifacts (fusion boundaries, serial scatters/gathers), so this kernel
fuses the ENTIRE step — packet-BVH sphere intersection, winner-carry
material parameters, branch-free shading, PCG4D sampling, work-queue
claims with camera-ray regeneration, and the film deposit — and runs
FLUSH_STEPS of them per launch with every per-lane state array resident
on-chip.

Scope (gated by `supports()`): sphere-only scenes with {Lambertian,
Metal, Dielectric, DiffuseLight, Specular, Null} materials, solid or
sky-gradient background, optional Russian roulette, single-chip or
tile x spp sharded — no atlas/Mix/volumes/NEE.  Everything else stays
on the XLA step.

Reference semantics preserved (all the same file:line anchors as the
XLA path): sphere root selection geom.rs:64-75, Lambertian
material.rs:204-220, Metal material.rs:261-284, Dielectric
material.rs:296-329, sky background material.rs:55-63, camera
world.rs:53-63.  Every random draw is the same pure PCG4D function of
(seed, ray_id, bounce, draw) as mrt.math.rng.Sampler, so the estimator
is unchanged; only float association (FMA contraction, per-item
accumulation before deposit) differs.

Key TPU moves:
  - Grid over 1024-lane ray blocks; each block runs all K steps with
    its state in registers (state HBM traffic: one load + one store per
    launch, not per step).
  - BVH nodes / sphere SoA / per-sphere material rows in SMEM (Mosaic
    forbids dynamic lane-indexed VMEM loads); the packet cursor loop is
    scalar-broadcast exactly like ops/pallas_bvh.
  - Winner material parameters are carried THROUGH the traversal
    (selected at each leaf test), so shading needs no table lookup at
    all — no gather, no one-hot matmul.
  - The film deposit is per-item: contributions accumulate in a per-lane
    register and are deposited once at path death via a predicated
    serial read-modify-write into the VMEM-resident slot accumulator
    (rows = deaths ~ pool/3, vs the XLA scatter's pool rows every step).
    dest is the (slots,4) slot accumulator reshaped (slots//32, 128) so
    rows are full lanes (a (slots,4) VMEM array would lane-pad 32x);
    the lane offset inside a row is built with iota compares — no
    dynamic lane indexing.
  - Work-queue claims run on (q = pixel, s = sample) pairs with exact
    small-integer division via f32 reciprocal + correction (vector i32
    division is unavailable; all operands < 2^23 so one +-1 fix is
    exact).  The claim prefix-sum is an MXU matmul with an upper
    triangular one-hot (exact in bf16 x bf16 -> f32 for 0/1 masks).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK_ROWS = 8                 # 1024 rays per grid program
BLOCK = BLOCK_ROWS * LANE
# Single source of truth (a hardcoded copy here silently missed 12 of
# 16 leaf spheres when the default leaf size moved 4 -> 16).
from ..geometry.bvh import LEAF_SIZE
INF = float("inf")
TAU = float(2.0 * np.pi)
NEAR_ZERO_EPS = 1e-5           # math/vec.py NEAR_ZERO_EPS

# Material type ids (materials/table.py) as exact f32 constants.
_LAM, _METAL, _DIEL, _LIGHT, _SPEC = 0.0, 1.0, 2.0, 3.0, 5.0


def _i32c(v):
    """Python int (u32 bit pattern) -> int32 constant (numpy scalar:
    a jnp array here would be captured as a pallas kernel const)."""
    return np.uint32(v).astype(np.int32)


_MUL = _i32c(1664525)
_INC = _i32c(1013904223)
_GOLD = _i32c(0x9E3779B9)
_RIDM = _i32c(0x85EBCA6B)
_INV_2_24 = np.float32(1.0 / 16777216.0)
_SHR = jax.lax.shift_right_logical


def _pcg4d(x, y, z, w):
    """PCG4D in int32 (wraparound mul/add == uint32; logical shifts).
    Bit-identical to math.rng.pcg4d."""
    x = x * _MUL + _INC
    y = y * _MUL + _INC
    z = z * _MUL + _INC
    w = w * _MUL + _INC
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ _SHR(x, 16)
    y = y ^ _SHR(y, 16)
    z = z ^ _SHR(z, 16)
    w = w ^ _SHR(w, 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _unit_f(u):
    return _SHR(u, 8).astype(jnp.float32) * _INV_2_24


def _draw4(rid, salt, seed, draw):
    """Sampler(seed, rid, salt) at draw counter `draw` (static int)."""
    with np.errstate(over="ignore"):  # u32 wraparound is the algorithm
        d = _i32c(draw) if isinstance(draw, int) else draw
        x, y, z, w = _pcg4d(rid,
                            salt + _GOLD * d,
                            jnp.broadcast_to(seed, rid.shape),
                            jnp.broadcast_to(d ^ (seed << 8), rid.shape))
    return _unit_f(x), _unit_f(y), _unit_f(z), _unit_f(w)


def _idiv(x, s_f, inv_s, s_i):
    """Exact floor(x / s) for int32 x in [0, 2^23), s >= 1.

    f32 reciprocal multiply errs by at most 1; one correction step
    lands exactly (all intermediates integral and < 2^23)."""
    q = jnp.floor(x.astype(jnp.float32) * inv_s).astype(jnp.int32)
    r = x - q * s_i
    q = q + (r >= s_i).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _sds(shape, dtype, vma):
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)




def _cbrt(u):
    """cbrt for u in [0,1) via exp/log (Mosaic-safe), exact at 0."""
    v = jnp.exp(jnp.log(jnp.maximum(u, 1e-38)) * (1.0 / 3.0))
    return jnp.where(u > 0.0, v, 0.0)


def _prefix_lanes(mask_f32):
    """Inclusive prefix sum of a (8,128) 0/1 mask in pool (row-major)
    order.  Lane prefix via MXU upper-triangular matmul (exact for 0/1
    in bf16 x bf16 -> f32), row offsets via 3 masked roll passes."""
    li = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    ut = (li <= lj).astype(jnp.bfloat16)
    p = jax.lax.dot_general(mask_f32.astype(jnp.bfloat16), ut,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_tot = jnp.broadcast_to(p[:, LANE - 1:LANE],
                               (BLOCK_ROWS, LANE))
    ri = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANE), 0)
    inc = row_tot
    for sh in (1, 2, 4):
        rolled = pltpu.roll(inc, sh, 0)
        inc = inc + jnp.where(ri >= sh, rolled, 0.0)
    excl_rows = inc - row_tot
    total = excl_rows[BLOCK_ROWS - 1, 0] + row_tot[BLOCK_ROWS - 1, 0]
    return excl_rows + p, total


def _kernel(si_ref, sf_ref, nodes_ref, meta_ref, sph_ref, smat_ref,
            o_in, d_in, tp_in, qsb_in, rid_in, acc_in, dest_in,
            o_out, d_out, tp_out, qsb_out, rid_out, acc_out, dest_out,
            qs_out, base_ref, tbuf_ref, sbuf_ref, dep_sem,
            *, n_nodes, k_steps, nblk, npix, width, slots_eff, big_mode,
            max_depth, bg_kind, s_pad, n_real, rr_depth, ablate=None,
            isect="bvh"):
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        base_ref[0] = si_ref[0]   # q0 (queue head pixel)
        base_ref[1] = si_ref[1]   # s0 (queue head sample)

    samples_i = si_ref[2]
    flushed_q = si_ref[3]
    seed = si_ref[4]
    sample_start = si_ref[5]
    pixel_offset = si_ref[6]
    stride = si_ref[7]
    samples_f = samples_i.astype(jnp.float32)
    inv_samples = 1.0 / samples_f
    qlim = jnp.minimum(jnp.int32(npix), flushed_q + jnp.int32(slots_eff))

    cam_o = [sf_ref[0], sf_ref[1], sf_ref[2]]
    cam_ll = [sf_ref[3], sf_ref[4], sf_ref[5]]
    cam_h = [sf_ref[6], sf_ref[7], sf_ref[8]]
    cam_v = [sf_ref[9], sf_ref[10], sf_ref[11]]
    cam_u3 = [sf_ref[12], sf_ref[13], sf_ref[14]]
    cam_v3 = [sf_ref[15], sf_ref[16], sf_ref[17]]
    lens_r = sf_ref[18]
    neut_o = [sf_ref[19], sf_ref[20], sf_ref[21]]
    neut_d = [sf_ref[22], sf_ref[23], sf_ref[24]]
    bg_c = [sf_ref[25], sf_ref[26], sf_ref[27]]
    t_min = sf_ref[28]
    inv_w = sf_ref[29]
    inv_h = sf_ref[30]

    # ---- load block state ------------------------------------------------
    ox, oy, oz = o_in[0], o_in[1], o_in[2]
    dx, dy, dz = d_in[0], d_in[1], d_in[2]
    tx, ty, tz = tp_in[0], tp_in[1], tp_in[2]
    q = qsb_in[0]
    s_idx = qsb_in[1]
    bounce = qsb_in[2]
    rid = rid_in[:]
    a0, a1, a2, a3 = acc_in[0], acc_in[1], acc_in[2], acc_in[3]

    def slab(lo, hi, o_c, inv_c, near, far):
        t0 = (lo - o_c) * inv_c
        t1 = (hi - o_c) * inv_c
        return (jnp.maximum(near, jnp.minimum(t0, t1)),
                jnp.minimum(far, jnp.maximum(t0, t1)))

    def step(_, carry):
        (ox, oy, oz, dx, dy, dz, tx, ty, tz, q, s_idx, bounce, rid,
         a0, a1, a2, a3) = carry
        active = q < npix

        # ---- packet BVH traversal with winner-parameter carry ----------
        # (structure: ops/pallas_bvh._kernel; root selection geom.rs:64-75)
        inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz
        a = dx * dx + dy * dy + dz * dz
        inv_a = 1.0 / a

        def sphere_test(s, carry):
            (bt, cx0, cy0, cz0, r0_, al0, al1, al2, fz, io, mt,
             e0, e1, e2, bi) = carry
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
            rt0 = (-half_b - sq) * inv_a
            rt1 = (-half_b + sq) * inv_a
            ok0 = ok & (rt0 >= t_min) & (rt0 <= bt)
            ok1 = ok & (rt1 >= t_min) & (rt1 <= bt)
            root = jnp.where(ok0, rt0, jnp.where(ok1, rt1, INF))
            # Tie rule: equal root -> lower index (matches the XLA
            # step's traversal bit-exactly; see geometry/bvh.py).
            better = (root < bt) | ((root == bt) & (s < bi))
            sel = lambda new, old: jnp.where(better, new, old)
            return (sel(root, bt),
                    sel(cx, cx0), sel(cy, cy0), sel(cz, cz0), sel(r, r0_),
                    sel(smat_ref[0, s], al0), sel(smat_ref[1, s], al1),
                    sel(smat_ref[2, s], al2), sel(smat_ref[3, s], fz),
                    sel(smat_ref[4, s], io), sel(smat_ref[5, s], mt),
                    sel(smat_ref[6, s], e0), sel(smat_ref[7, s], e1),
                    sel(smat_ref[8, s], e2), sel(s, bi))

        def t_cond(carry):
            return carry[0] < n_nodes

        def t_body(carry):
            node, leafc = carry
            near = jnp.full_like(a, 0.0) + t_min
            far = leafc[0]
            near, far = slab(nodes_ref[0, node], nodes_ref[3, node],
                             ox, inv_dx, near, far)
            near, far = slab(nodes_ref[1, node], nodes_ref[4, node],
                             oy, inv_dy, near, far)
            near, far = slab(nodes_ref[2, node], nodes_ref[5, node],
                             oz, inv_dz, near, far)
            any_hit = jnp.any(near <= far)
            first = meta_ref[0, node]
            count = meta_ref[1, node]
            escape = meta_ref[2, node]
            is_leaf = count > 0

            def test_leaf(c):
                for j in range(LEAF_SIZE):
                    s = jnp.minimum(first + j, s_pad - 1)
                    new = sphere_test(s, c)
                    take = j < count
                    c = tuple(jnp.where(take, n, o_)
                              for n, o_ in zip(new, c))
                return c

            leafc = jax.lax.cond(any_hit & is_leaf, test_leaf,
                                 lambda c: c, leafc)
            node = jnp.where(any_hit & ~is_leaf, node + 1, escape)
            return node, leafc

        zf = jnp.zeros_like(a)
        init_leaf = (jnp.full_like(a, INF), zf, zf, zf, zf + 1.0,
                     zf, zf, zf, zf, zf + 1.0, zf - 1.0, zf, zf, zf,
                     jnp.zeros_like(a, dtype=jnp.int32))
        if isect == "dense":
            # Flat sweep over every sphere (no BVH): constant work per
            # step regardless of ray coherence — the packet BVH pays
            # the union of its lanes' subtrees on incoherent bounce
            # rays, so at few-hundred-sphere scales the dense loop can
            # win (hardware A/B: MRT_MEGA_ISECT, tools/probe_megastep).
            def d_body(k, c):
                s2 = k * 2
                c = sphere_test_n(s2, c)
                c = sphere_test_n(s2 + 1, c)
                return c

            def sphere_test_n(s2, c):
                new = sphere_test(s2, c)
                take = s2 < n_real
                return tuple(jnp.where(take, n, o_)
                             for n, o_ in zip(new, c))

            leafc = jax.lax.fori_loop(0, s_pad // 2, d_body, init_leaf)
        else:
            _, leafc = jax.lax.while_loop(t_cond, t_body,
                                          (jnp.int32(0), init_leaf))
        (bt, cx, cy, cz, rr, al0, al1, al2, fuzz, ior, mt,
         e0, e1, e2, _) = leafc

        hit = bt < INF
        t_safe = jnp.where(hit, bt, 0.0)
        px_, py_, pz_ = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe
        owx, owy, owz = (px_ - cx) / rr, (py_ - cy) / rr, (pz_ - cz) / rr
        front = dx * owx + dy * owy + dz * owz < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = owx * sgn, owy * sgn, owz * sgn

        # ---- shading draws: Sampler(seed, rid, 3b+1), skip(4) ----------
        salt_sc = bounce * 3 + 1
        u1, u2, u3, uf = _draw4(rid, salt_sc, seed, 4)

        # unit_vector(u1,u2) / in_unit_sphere(u1,u2,u3) (math/sampling.py)
        zc = 1.0 - 2.0 * u1
        rc = jnp.sqrt(jnp.maximum(0.0, 1.0 - zc * zc))
        phi = TAU * u2
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        rux, ruy, ruz = rc * cphi, rc * sphi, zc
        # cbrt is unimplemented in Mosaic; exp/log matches within ulps
        # (exact at 0).  sampling.in_unit_sphere uses jnp.cbrt — the
        # ulp difference only perturbs metal-fuzz directions.
        ball = _cbrt(u3)
        usx, usy, usz = rux * ball, ruy * ball, ruz * ball

        dlen = jnp.sqrt(a)
        udx, udy, udz = dx / dlen, dy / dlen, dz / dlen

        # Lambertian (material.rs:204-220)
        lmx, lmy, lmz = nx + rux, ny + ruy, nz + ruz
        degen = ((jnp.abs(lmx) <= NEAR_ZERO_EPS)
                 & (jnp.abs(lmy) <= NEAR_ZERO_EPS)
                 & (jnp.abs(lmz) <= NEAR_ZERO_EPS))
        lmx = jnp.where(degen, nx, lmx)
        lmy = jnp.where(degen, ny, lmy)
        lmz = jnp.where(degen, nz, lmz)

        # Metal (material.rs:261-284)
        dn = udx * nx + udy * ny + udz * nz
        rfx, rfy, rfz = (udx - 2.0 * dn * nx, udy - 2.0 * dn * ny,
                         udz - 2.0 * dn * nz)
        mtx, mty, mtz = (rfx + usx * fuzz, rfy + usy * fuzz,
                         rfz + usz * fuzz)
        metal_ok = mtx * nx + mty * ny + mtz * nz > 0.0

        # Dielectric (material.rs:296-329)
        ratio = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-(udx * nx + udy * ny + udz * nz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        cannot = ratio * sin_t > 1.0
        r0s = ((1.0 - ratio) / (1.0 + ratio)) ** 2
        schlick = r0s + (1.0 - r0s) * (1.0 - cos_t) ** 5
        refl_ch = cannot | (schlick > uf)
        # refract (math/vec.py refract)
        ppx = (udx + nx * cos_t) * ratio
        ppy = (udy + ny * cos_t) * ratio
        ppz = (udz + nz * cos_t) * ratio
        kk = jnp.abs(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz))
        sq_k = jnp.sqrt(jnp.where(kk > 0.0, kk, 1.0))
        par = -jnp.where(kk > 0.0, sq_k, 0.0)
        rrx, rry, rrz = ppx + nx * par, ppy + ny * par, ppz + nz * par
        dix = jnp.where(refl_ch, rfx, rrx)
        diy = jnp.where(refl_ch, rfy, rry)
        diz = jnp.where(refl_ch, rfz, rrz)

        is_lam = mt == _LAM
        is_met = mt == _METAL
        is_die = mt == _DIEL
        is_lit = mt == _LIGHT
        is_spc = mt == _SPEC

        # Specular: Fresnel-gated mirror else inner Lambertian
        # (material.rs:352-383).
        spx = jnp.where(refl_ch, rfx, lmx)
        spy = jnp.where(refl_ch, rfy, lmy)
        spz = jnp.where(refl_ch, rfz, lmz)

        sel3 = lambda m, xs, ys: tuple(jnp.where(m, x, y)
                                       for x, y in zip(xs, ys))
        ndir = sel3(is_lam, (lmx, lmy, lmz),
                    sel3(is_met, (mtx, mty, mtz),
                         sel3(is_die, (dix, diy, diz),
                              sel3(is_spc, (spx, spy, spz),
                                   (nx, ny, nz)))))
        one3 = (jnp.ones_like(al0),) * 3
        att = sel3(is_die | (is_spc & refl_ch), one3, (al0, al1, al2))
        scattered = hit & (is_lam | is_die | is_spc
                           | (is_met & metal_ok))

        # emission + background -> per-item accumulator
        emx = jnp.where(is_lit, e0, 0.0)
        emy = jnp.where(is_lit, e1, 0.0)
        emz = jnp.where(is_lit, e2, 0.0)
        if bg_kind == 1:  # sky gradient (material.rs:55-63)
            tbg = 0.5 * (udy + 1.0)
            bgx = (1.0 - tbg) + tbg * 0.5
            bgy = (1.0 - tbg) + tbg * 0.7
            bgz = (1.0 - tbg) + tbg * 1.0
        else:
            bgx = jnp.zeros_like(udy) + bg_c[0]
            bgy = jnp.zeros_like(udy) + bg_c[1]
            bgz = jnp.zeros_like(udy) + bg_c[2]
        radx = jnp.where(hit, emx, bgx)
        rady = jnp.where(hit, emy, bgy)
        radz = jnp.where(hit, emz, bgz)
        act_f = active.astype(jnp.float32)
        a0 = a0 + act_f * tx * radx
        a1 = a1 + act_f * ty * rady
        a2 = a2 + act_f * tz * radz

        scat = hit & scattered & active
        cont = scat & (bounce + 1 < max_depth)
        at0, at1, at2 = att
        if rr_depth is not None:
            # Russian roulette (integrator/persistent.py step): applied
            # to scat so bounce counts match the XLA integrator.
            roll_u, _, _, _ = _draw4(rid, _i32c(1 << 29) + bounce, seed,
                                     0)
            tpn = jnp.maximum(jnp.maximum(tx * at0, ty * at1),
                              tz * at2)
            p_srv = jnp.clip(tpn, 0.05, 1.0)
            roll = roll_u < p_srv
            apply_rr = scat & (bounce >= rr_depth)
            scat = scat & (~apply_rr | roll)
            cont = cont & scat
            inv_p = 1.0 / p_srv
            at0 = jnp.where(apply_rr, at0 * inv_p, at0)
            at1 = jnp.where(apply_rr, at1 * inv_p, at1)
            at2 = jnp.where(apply_rr, at2 * inv_p, at2)
        a3 = a3 + scat.astype(jnp.float32)
        die = active & ~cont

        # ---- film deposit: per-death predicated RMW into dest ----------
        if big_mode:
            slot = q & jnp.int32(slots_eff - 1)
        else:
            slot = q
        slot = jnp.where(die, slot, 0)
        dep = die & ((a0 != 0.0) | (a1 != 0.0) | (a2 != 0.0)
                     | (a3 != 0.0))
        if ablate == "nodep":  # timing ablation: skip the deposit RMW
            dep = dep & (a3 < 0.0)
        # Transpose to (128, 8): lane index becomes the (dynamic-ok)
        # sublane index; the 8-wide minor dim is statically unrolled.
        dep_t = jnp.transpose(dep.astype(jnp.float32), (1, 0))
        slot_t = jnp.transpose(slot.astype(jnp.float32), (1, 0))
        v0_t = jnp.transpose(a0, (1, 0))
        v1_t = jnp.transpose(a1, (1, 0))
        v2_t = jnp.transpose(a2, (1, 0))
        v3_t = jnp.transpose(a3, (1, 0))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

        tbuf_ref[0:LANE, 0:8] = dep_t
        tbuf_ref[0:LANE, 8:16] = slot_t
        tbuf_ref[0:LANE, 16:24] = v0_t
        tbuf_ref[0:LANE, 24:32] = v1_t
        tbuf_ref[0:LANE, 32:40] = v2_t
        tbuf_ref[0:LANE, 40:48] = v3_t
        # Scalar-addressable copy: dynamic-indexed SCALAR loads come
        # from SMEM (same rule that puts the BVH tables there); the
        # vector-shaped deposit data is staged through one small DMA.
        cp = pltpu.make_async_copy(tbuf_ref, sbuf_ref, dep_sem)
        cp.start()
        cp.wait()

        def drow(c, carry):
            anyd = jnp.sum(tbuf_ref[pl.ds(c, 1), 0:8]) > 0.0

            @pl.when(anyd)
            def _deposit_row():
                for r in range(BLOCK_ROWS):
                    do = sbuf_ref[c, r] != 0.0

                    @pl.when(do)
                    def _deposit_one():
                        sl = sbuf_ref[c, 8 + r].astype(jnp.int32)
                        row = _SHR(sl, 5)
                        sub = (sl & 31) * 4
                        w0 = sbuf_ref[c, 16 + r]
                        w1 = sbuf_ref[c, 24 + r]
                        w2 = sbuf_ref[c, 32 + r]
                        w3 = sbuf_ref[c, 40 + r]
                        vec = (jnp.where(lane_i == sub, w0, 0.0)
                               + jnp.where(lane_i == sub + 1, w1, 0.0)
                               + jnp.where(lane_i == sub + 2, w2, 0.0)
                               + jnp.where(lane_i == sub + 3, w3, 0.0))
                        cur = dest_out[pl.ds(row, 1), :]
                        dest_out[pl.ds(row, 1), :] = cur + vec
            return carry

        jax.lax.fori_loop(0, LANE, drow, 0)
        a0 = jnp.where(die, 0.0, a0)
        a1 = jnp.where(die, 0.0, a1)
        a2 = jnp.where(die, 0.0, a2)
        a3 = jnp.where(die, 0.0, a3)

        # ---- claims + regeneration -------------------------------------
        claim = die | ~active
        prefix, n_claim = _prefix_lanes(claim.astype(jnp.float32))
        off = prefix.astype(jnp.int32) - 1
        q0 = base_ref[0]
        s0 = base_ref[1]
        x = s0 + off                      # < samples + BLOCK: f32-exact
        dq = _idiv(x, samples_f, inv_samples, samples_i)
        new_q = q0 + dq
        new_s = x - dq * samples_i
        takes = claim & (new_q < qlim)
        n_takes = jnp.sum(takes.astype(jnp.float32)).astype(jnp.int32)
        x2 = s0 + n_takes
        dq2 = _idiv(x2, samples_f, inv_samples, samples_i)
        base_ref[0] = q0 + dq2
        base_ref[1] = x2 - dq2 * samples_i

        # camera rays for taken claims (core/camera.py rays;
        # RNG: Sampler(seed, pixel + GOLD*sample, 0xC0FFEE) draw 0)
        pix = pixel_offset + jnp.where(takes, new_q, 0)
        smp = sample_start + jnp.where(takes, new_s, 0) * stride
        rid_new = pix ^ (smp * _RIDM)
        jx, jy, du, dv = _draw4(pix + _GOLD * smp, _i32c(0xC0FFEE),
                                seed, 0)
        qw = _idiv(pix, np.float32(width), np.float32(1.0 / width),
                   jnp.int32(width))
        pxf = (pix - qw * width).astype(jnp.float32)
        pyf = qw.astype(jnp.float32)
        s_img = (pxf + jx) * inv_w
        t_img = (pyf + jy) * inv_h
        # Exact association order of core/camera.py rays():
        # blur = in_unit_disk * lens_radius; offset = u*bx + v*by;
        # dir = ll + h*s + v*t - origin - offset.
        br = jnp.sqrt(du)
        bphi = TAU * dv
        bx = (br * jnp.cos(bphi)) * lens_r
        by = (br * jnp.sin(bphi)) * lens_r
        ofx = cam_u3[0] * bx + cam_v3[0] * by
        ofy = cam_u3[1] * bx + cam_v3[1] * by
        ofz = cam_u3[2] * bx + cam_v3[2] * by
        nox = cam_o[0] + ofx
        noy = cam_o[1] + ofy
        noz = cam_o[2] + ofz
        ndx = (cam_ll[0] + cam_h[0] * s_img + cam_v[0] * t_img
               - cam_o[0] - ofx)
        ndy = (cam_ll[1] + cam_h[1] * s_img + cam_v[1] * t_img
               - cam_o[1] - ofy)
        ndz = (cam_ll[2] + cam_h[2] * s_img + cam_v[2] * t_img
               - cam_o[2] - ofz)

        # ---- state merge (cont / take / park) --------------------------
        q = jnp.where(cont, q, jnp.where(takes, new_q, npix))
        s_idx = jnp.where(cont, s_idx, jnp.where(takes, new_s, 0))
        pick = lambda c_, t_, n_: jnp.where(cont, c_,
                                            jnp.where(takes, t_, n_))
        ox = pick(px_, nox, neut_o[0])
        oy = pick(py_, noy, neut_o[1])
        oz = pick(pz_, noz, neut_o[2])
        dx_ = pick(ndir[0], ndx, neut_d[0])
        dy_ = pick(ndir[1], ndy, neut_d[1])
        dz_ = pick(ndir[2], ndz, neut_d[2])
        tx = jnp.where(cont, tx * at0, jnp.where(takes, 1.0, tx))
        ty = jnp.where(cont, ty * at1, jnp.where(takes, 1.0, ty))
        tz = jnp.where(cont, tz * at2, jnp.where(takes, 1.0, tz))
        rid = jnp.where(cont, rid, jnp.where(takes, rid_new, rid))
        bounce = jnp.where(cont, bounce + 1, 0)

        return (ox, oy, oz, dx_, dy_, dz_, tx, ty, tz, q, s_idx, bounce,
                rid, a0, a1, a2, a3)

    carry = (ox, oy, oz, dx, dy, dz, tx, ty, tz, q, s_idx, bounce, rid,
             a0, a1, a2, a3)
    carry = jax.lax.fori_loop(0, k_steps, step, carry)
    (ox, oy, oz, dx, dy, dz, tx, ty, tz, q, s_idx, bounce, rid,
     a0, a1, a2, a3) = carry

    o_out[0], o_out[1], o_out[2] = ox, oy, oz
    d_out[0], d_out[1], d_out[2] = dx, dy, dz
    tp_out[0], tp_out[1], tp_out[2] = tx, ty, tz
    qsb_out[0], qsb_out[1], qsb_out[2] = q, s_idx, bounce
    rid_out[:] = rid
    acc_out[0], acc_out[1], acc_out[2], acc_out[3] = a0, a1, a2, a3

    @pl.when(blk == nblk - 1)
    def _():
        qs_out[0] = base_ref[0]
        qs_out[1] = base_ref[1]


@functools.partial(
    jax.jit,
    static_argnames=("n_nodes", "k_steps", "npix", "width", "slots_eff",
                     "big_mode", "max_depth", "bg_kind", "rr_depth",
                     "ablate", "isect", "n_real", "interpret"))
def _launch(si, sf, nodes, meta, sph, smat, o3, d3, tp3, qsb, rid, acc,
            dest2, *, n_nodes, k_steps, npix, width, slots_eff, big_mode,
            max_depth, bg_kind, n_real, rr_depth=None, ablate=None,
            isect="bvh", interpret=False):
    rows = o3.shape[1]
    nblk = rows // BLOCK_ROWS
    s_pad = sph.shape[1]
    # Under shard_map pallas outputs must declare their varying mesh
    # axes; the union of the inputs' is correct (state and scalars vary
    # over both the tile and spp axes).  The sharded caller runs with
    # check_vma=False (interpret-mode kernels don't propagate vma
    # internally), so this is usually empty.
    vma = frozenset()
    for x in (si, sf, o3, d3, tp3, qsb, rid, acc, dest2):
        vma = vma | frozenset(getattr(jax.typeof(x), "vma", ()))
    kernel = functools.partial(
        _kernel, n_nodes=n_nodes, k_steps=k_steps, nblk=nblk, npix=npix,
        width=width, slots_eff=slots_eff, big_mode=big_mode,
        max_depth=max_depth, bg_kind=bg_kind, s_pad=s_pad,
        n_real=n_real, rr_depth=rr_depth, ablate=ablate, isect=isect)

    grid = (nblk,)
    vspec3 = lambda nr: pl.BlockSpec((nr, BLOCK_ROWS, LANE),
                                     lambda b: (0, b, 0),
                                     memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((dest2.shape[0], LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)
    smem = lambda shape: pl.BlockSpec(shape, lambda b: tuple(
        0 for _ in shape), memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((8,)), smem((32,)),
            smem(nodes.shape), smem(meta.shape), smem(sph.shape),
            smem(smat.shape),
            vspec3(3), vspec3(3), vspec3(3), vspec3(3), vspec,
            vspec3(4), dspec,
        ],
        out_specs=[
            vspec3(3), vspec3(3), vspec3(3), vspec3(3), vspec,
            vspec3(4), dspec, smem((2,)),
        ],
        out_shape=[
            _sds(o3.shape, jnp.float32, vma),
            _sds(d3.shape, jnp.float32, vma),
            _sds(tp3.shape, jnp.float32, vma),
            _sds(qsb.shape, jnp.int32, vma),
            _sds(rid.shape, jnp.int32, vma),
            _sds(acc.shape, jnp.float32, vma),
            _sds(dest2.shape, jnp.float32, vma),
            _sds((2,), jnp.int32, vma),
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3, 10: 4, 11: 5,
                              12: 6},
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32),
                        pltpu.VMEM((LANE, 48), jnp.float32),
                        pltpu.SMEM((LANE, 48), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(si, sf, nodes, meta, sph, smat, o3, d3, tp3, qsb, rid, acc, dest2)
    return outs


# ---------------------------------------------------------------------------
# XLA-side glue
# ---------------------------------------------------------------------------


# Auto-enable on TPU once hardware-validated (tools/probe_megastep.py);
# MRT_MEGASTEP=1/0 forces either way.
AUTO_ON = False


def supports_static(scene, *, rr_depth, sort_rays, pool):
    """Shape/structure-only qualification — safe to call on a traced
    scene pytree (e.g. when a caller forces mega inside jit)."""
    import os

    if os.environ.get("MRT_MEGASTEP") == "0":
        return False
    if scene.spheres is None:
        return False
    if (scene.triangles is not None or scene.tlas is not None
            or scene.volumes is not None or scene.mesh_volumes
            or scene.atlas is not None or scene.lights is not None
            or scene.has_mix or scene.needs_alpha):
        return False
    if sort_rays:
        return False
    if pool % BLOCK != 0 or pool < 2 * BLOCK:
        return False
    bg = scene.background
    if type(bg).__name__ not in ("SkyBackground", "SolidBackground"):
        return False
    from . import budget
    s = int(scene.spheres.count)
    s_pad = max(8, -(-s // 8) * 8)
    if scene.sphere_bvh is not None:
        m = int(scene.sphere_bvh.n_nodes)
    else:  # conservative bound for a BVH the driver will build
        m = 2 * (-(-s // LEAF_SIZE)) + 1
    tables = (8 * m + 4 * m + 4 * s_pad + 10 * s_pad) * 4
    if not budget.fits(tables):
        return False
    return True


def mtypes_ok(scene):
    """Value check (concrete arrays only): every material row is a
    class the kernel implements."""
    mt = np.asarray(scene.materials.mtype)
    return bool(np.isin(mt, [0, 1, 2, 3, 5, 7]).all())


def supports(scene, *, rr_depth, sort_rays, pool):
    """Full qualification (static + material values)."""
    return (supports_static(scene, rr_depth=rr_depth,
                            sort_rays=sort_rays, pool=pool)
            and mtypes_ok(scene))


def with_sphere_bvh(scene):
    """Attach a sphere BVH when the scene was built without one (e.g.
    the RTIOW scene constructs its Scene directly); the megakernel
    traverses packets over it.  Host-side build, call outside jit."""
    if scene.sphere_bvh is not None:
        return scene
    import jax.core as _core

    if isinstance(scene.spheres.center, _core.Tracer):
        raise ValueError(
            "megastep needs a sphere BVH and the scene is traced: call "
            "pallas_megastep.with_sphere_bvh(scene) before jit")
    from ..geometry.bvh import build_over_spheres

    bvh, sph = build_over_spheres(scene.spheres)
    return scene.replace(spheres=sph, sphere_bvh=bvh)


def _bg_kind(scene):
    if type(scene.background).__name__ == "SkyBackground":
        return 1, jnp.zeros((3,), jnp.float32)
    return 0, jnp.asarray(scene.background.color, jnp.float32)


def run_block(scene, camera, state, *, width, height, seed,
              sample_start, samples, max_depth, pool, slots_eff,
              big_mode, k_steps, t_min, neutral, pixel_offset=0,
              n_pixels=None, sample_stride=1, rr_depth=None,
              ablate=None, isect=None, interpret=False):
    """Run k_steps persistent wavefront steps through the megakernel.

    `state` is the integrator's tuple (item, bounce, o, d, throughput,
    ray_id, next_work, dest, flushed_q, prev_pdf, acc); returns the
    same tuple.  Semantically equivalent to k_steps of
    integrator.persistent step() (same RNG streams, same claims; film
    contributions are deposited per path death instead of per step).
    `pixel_offset`/`n_pixels`/`sample_stride` carry the shard_map tile
    x spp sharding (parallel/render.py): work queues are local, camera
    pixels global."""
    (item, bounce, o, d, tp, rid, next_work, dest, flushed_q, prev_pdf,
     acc) = state
    npix = n_pixels if n_pixels is not None else width * height
    samples_i = jnp.asarray(samples, jnp.int32)
    total = jnp.int32(npix) * samples_i

    # (q, s) work coordinates; parked/idle lanes (item >= total) -> npix.
    it = jnp.minimum(item, total)
    q = it // samples_i
    s_idx = it - q * samples_i
    rows = pool // LANE

    def to3(x):  # (pool, 3) -> (3, rows, LANE)
        return x.T.reshape(3, rows, LANE)

    o3, d3, tp3 = to3(o), to3(d), to3(tp)
    qsb = jnp.stack([q, s_idx, bounce]).reshape(3, rows, LANE)
    rid2 = rid.astype(jnp.int32).reshape(rows, LANE)
    acc3 = acc.T.reshape(4, rows, LANE)
    dest2 = dest.reshape(-1, LANE)  # (slots,4) -> (slots//32, 128)

    q0 = next_work // samples_i
    s0 = next_work - q0 * samples_i
    si = jnp.stack([q0, s0, samples_i,
                    jnp.asarray(flushed_q, jnp.int32),
                    jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
                    jnp.asarray(sample_start, jnp.uint32)
                       .astype(jnp.int32),
                    jnp.asarray(pixel_offset, jnp.int32),
                    jnp.asarray(sample_stride, jnp.int32)])
    bg_kind, bg_c = _bg_kind(scene)
    cam = camera
    sf = jnp.concatenate([
        cam.origin, cam.lower_left, cam.horizontal, cam.vertical,
        cam.u, cam.v, jnp.reshape(cam.lens_radius, (1,)),
        neutral[0], neutral[1], bg_c,
        jnp.asarray([t_min, 1.0 / width, 1.0 / height], jnp.float32),
        jnp.zeros((1,), jnp.float32)]).astype(jnp.float32)

    bvh = scene.sphere_bvh
    sph_set = scene.spheres
    m = int(bvh.n_nodes)
    nodes = jnp.zeros((8, m), jnp.float32)
    nodes = nodes.at[0:3].set(bvh.bmin.T)
    nodes = nodes.at[3:6].set(bvh.bmax.T)
    meta = jnp.zeros((4, m), jnp.int32)
    meta = meta.at[0].set(bvh.first)
    meta = meta.at[1].set(bvh.count)
    meta = meta.at[2].set(bvh.escape)
    s = int(sph_set.count)
    s_pad = max(8, -(-s // 8) * 8)
    sph = jnp.zeros((4, s_pad), jnp.float32)
    sph = sph.at[:3, :s].set(sph_set.center.T)
    sph = sph.at[3, :s].set(sph_set.radius)
    from .rowlookup import take_rows
    prm = take_rows(scene.materials.packed, sph_set.material)
    # columns: albedo rgb, fuzz, ior, mtype, emit rgb (+pad)
    from ..materials.table import MaterialTable as MT
    smat = jnp.zeros((10, s_pad), jnp.float32)
    smat = smat.at[0:3, :s].set(prm[:, 0:3].T)
    smat = smat.at[3, :s].set(prm[:, 4])
    smat = smat.at[4, :s].set(prm[:, 5])
    smat = smat.at[5, :s].set(prm[:, MT.C_MTYPE])
    smat = smat.at[5, s:].set(-1.0)
    smat = smat.at[6:9, :s].set(prm[:, 6:9].T)

    (o3, d3, tp3, qsb, rid2, acc3, dest2, qs) = _launch(
        si, sf, nodes, meta, sph, smat, o3, d3, tp3, qsb, rid2, acc3,
        dest2, n_nodes=m, k_steps=k_steps, npix=npix, width=width,
        slots_eff=slots_eff, big_mode=big_mode, max_depth=max_depth,
        bg_kind=bg_kind, n_real=s, rr_depth=rr_depth, ablate=ablate,
        isect=isect or os.environ.get("MRT_MEGA_ISECT", "bvh"),
        interpret=interpret)

    def from3(x3, w=3):
        return x3.reshape(w, pool).T

    o = from3(o3)
    d = from3(d3)
    tp = from3(tp3)
    qsb_f = qsb.reshape(3, pool)
    q, s_idx, bounce = qsb_f[0], qsb_f[1], qsb_f[2]
    item = q * samples_i + s_idx
    item = jnp.where(q >= npix, total, item)
    rid = rid2.reshape(pool).astype(jnp.uint32)
    acc = from3(acc3, 4)
    dest = dest2.reshape(dest.shape)
    next_work = qs[0] * samples_i + qs[1]
    return (item, bounce, o, d, tp, rid, next_work, dest, flushed_q,
            prev_pdf, acc)
