"""Persistent-wavefront integrator with ray regeneration.

The plain wavefront loop (`trace_wavefront`) keeps every lane occupied by
the same path until the whole batch dies, so at depth 50 with a mean
path length of ~3 most lanes idle ~94% of the iterations.  This module
is the TPU analogue of persistent-threads path tracing: a fixed pool of
P lanes consumes a queue of (pixel, sample) work items; the moment a
path terminates its lane claims the next item and generates that
sample's camera ray.

Film accumulation (round-2 redesign): scattering every step into the
full-frame film dominated the step (~5.2ms of 11.7ms at 1080p — the
cost is the size of the carried scatter DESTINATION, not the update
form; see tools/profile_scatter*.py).  Contributions now go into a
small rolling slot accumulator `dest` (SLOTS pixels, a few MB) indexed
by pixel % SLOTS; work items are claimed PIXEL-MAJOR so in-flight
pixels span a narrow moving window, claims are gated to pixels <
flushed + SLOTS, and once a slab of SLOTS/SLABS pixels is fully
claimed and passed by every live path it is flushed into the big film
with one contiguous dynamic-slice add (no scatter) and zeroed for
reuse.  The accumulator is capped at 2^18 rows (4MB) — the in-graph
scatter cost cliffs just above that (see SLOTS).  The window must
out-span the deepest path: claims advance at ~pool/avg_depth
items/step while a depth-50 straggler pins the flush frontier for 50
steps, so SLOTS*spp must exceed ~50*pool/avg_depth items — the driver
shrinks the POOL at low spp to keep this true.  When the whole film
fits in SLOTS (tests, sharded tiles) the accumulator IS the film
slice and nothing gates or flushes until the end.

Equivalence: every random draw is the same pure function of
(seed, pixel, sample, bounce) as the batched integrator, so this
produces the same estimator with the same streams — only the float
accumulation order differs (tested to ~1e-5 of the batch path).

Two drivers share the step function:
  - `render_samples_persistent`: one device-side while_loop — used
    inside jit/shard_map programs (the multi-chip path).
  - `render_samples_chunked`: Python-level loop over bounded-length
    dispatches — the single-chip default.  A dispatch never runs more
    than `chunk_steps` wavefront steps, so slow-traversal scenes cannot
    exceed the accelerator's execution watchdog (observed: unbounded
    dispatches on incoherent-ray scenes faulted the chip), and the host
    can observe progress between chunks.

The reference's analogue is its thread pool re-rendering whole frames
per pass (reference: src/main.rs:234-294); regeneration here plays the
role of the OS scheduler keeping CPU cores busy.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..math.rng import Sampler
from ..materials import shade
from .wavefront import MAX_DEPTH, T_MIN

POOL = 1 << 17
CHUNK_STEPS = 8
# (Round 5: in big-frame mode on TPU the per-step dest update runs
# scatter-free through ops/film_deposit — see _film_mm_enabled.)
# Rolling film-slot accumulator (pixels): the claim window.  Hard
# ceiling 2^18 rows: the in-graph scatter cost cliffs between 4.2MB
# and 4.7MB of destination (tools/profile_film2.py on v5e — 2^18 rows
# = 8.3ms/step, 288k rows = 12.1ms, same as the full film).  The
# window must also cover claim_rate * max_path_depth items or the
# deepest path stalls the flush frontier and starves claims (measured:
# 3% active) — with SLOTS capped, that constraint is met by shrinking
# the POOL instead (render.render_pass_persistent).
SLOTS = 1 << 18
SLABS = 8          # slabs per window: flush granularity (slots//SLABS)
FLUSH_STEPS = 8

_BIG = jnp.int32(2 ** 30)


def _slots_for(npix, slots, mm=False):
    """Static layout: (slots_eff, slab, npix_pad, big_mode).

    mm=True (scatter-free film deposit active) pads the small-mode
    film slice to a 32768 multiple so the one-hot ring-flush kernel's
    output blocks divide evenly; padding rows receive no
    contributions and are dropped at unpack."""
    slots = min(slots, SLOTS) if slots else SLOTS
    if npix <= slots:
        # Small mode: the accumulator IS the (padded) film slice.
        pad = -npix % (32768 if mm else 8)
        return npix + pad, npix + pad, npix + pad, False
    # Big-mode slot indexing is `q & (slots-1)`: power of two required.
    assert slots & (slots - 1) == 0, f"slots {slots} not a power of 2"
    slab = max(slots // SLABS, 8)
    npix_pad = -(-npix // slab) * slab
    return slots, slab, npix_pad, True


def _morton3(x, y, z):
    """Interleave three 6-bit uint32 coordinates into an 18-bit Morton
    code (unrolled shifts: 6 iterations on the whole lane vector)."""
    out = jnp.zeros_like(x)
    for b in range(6):
        out = (out
               | (((x >> b) & 1) << (3 * b))
               | (((y >> b) & 1) << (3 * b + 1))
               | (((z >> b) & 1) << (3 * b + 2)))
    return out


def _make_sorter(scene, total):
    """Lane permutation by ray-coherence key: Morton cell of the origin
    (6 bits/axis over the scene bounds, high bits) + Morton cell of the
    direction (4 bits/axis, low bits).  Packet kernels share one
    traversal cursor per 1024-lane packet; after a few bounces
    neighbouring lanes diverge and each packet pays the union of its
    rays' subtrees.  Sorting lanes every FLUSH_STEPS regroups them so
    packets stay spatially tight.  The direction bits matter most for
    freshly regenerated camera rays: a pinhole camera puts EVERY
    primary ray in the same origin cell, so without them bounce-0
    packets stay in scanline order — measured 64% slower than
    direction-tiled packets on Menger L5 (tools/probe_menger_block.py).
    Semantically free: every per-lane quantity rides the same
    permutation, the RNG is keyed on (ray_id, bounce), and film
    scatters index by work item.  Idle lanes sort to the end.

    Origin bounds: static scene bounds degenerate on scenes whose
    emissive set dwarfs the detailed geometry — lucy's sun sphere at
    (10000,4000,4800) r1500 makes a 64-cell grid ~195 units/cell, so
    the whole 33-unit statue field quantises to ONE cell and the key
    collapses to direction bits.  MRT_SORT_DYN=1 instead quantises
    over the ACTIVE wavefront's own per-sort origin bounds (two masked
    reductions; emissive hits terminate, so live origins concentrate
    on the detailed geometry).  Permutation-only either way — the film
    is bit-identical; only packet coherence changes."""
    import os as _os
    dynamic = _os.environ.get("MRT_SORT_DYN", "0") == "1"
    bmin, bmax = scene.world_bounds()
    inv_ext = 63.0 / jnp.maximum(bmax - bmin, 1e-6)

    def sort_lanes(state):
        (item, bounce, o, d, throughput, ray_id, next_work,
         dest, flushed_q, prev_pdf, *rest) = state
        active = item < total
        # Direction cell: 4 bits/axis on the (unnormalised-safe)
        # component signs+magnitudes; interleaved -> 12 bits.
        dn = d * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(d * d, axis=-1, keepdims=True), 1e-20))
        dcell = jnp.clip((dn + 1.0) * 8.0, 0.0, 15.0).astype(jnp.uint32)
        dkey = _morton3(dcell[:, 0], dcell[:, 1], dcell[:, 2])
        if dynamic:
            big = jnp.float32(3.4e38)
            act3 = active[:, None]
            lo = jnp.min(jnp.where(act3, o, big), axis=0)
            hi = jnp.max(jnp.where(act3, o, -big), axis=0)
            inv = 63.0 / jnp.maximum(hi - lo, 1e-6)
            cell = jnp.clip((o - lo) * inv, 0.0, 63.0).astype(jnp.uint32)
        else:
            cell = jnp.clip((o - bmin) * inv_ext, 0.0,
                            63.0).astype(jnp.uint32)
        key = (_morton3(cell[:, 0], cell[:, 1], cell[:, 2]) << 12) | dkey
        key = jnp.where(active, key, jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(key)
        g = lambda a: jnp.take(a, perm, axis=0)
        return (g(item), g(bounce), g(o), g(d), g(throughput), g(ray_id),
                next_work, dest, flushed_q, g(prev_pdf),
                *(g(r) for r in rest))  # pending accumulator (lane data)

    return sort_lanes



def _flush_block(step, sorter, cadence):
    """One FLUSH_STEPS block of wavefront steps with lane sorting every
    `cadence` steps.  Cadence matters: ~1/3 of lanes die and re-claim
    EVERY step, landing at scattered lane positions, so a sort only
    every FLUSH_STEPS leaves most packets scrambled most of the time —
    measured on Menger L5: per-8 sorting gives 0% over unsorted while
    coherently-ordered rays are 64% faster in the bare kernel
    (tools/probe_menger_{sort,block}.py)."""
    if sorter is None:
        return lambda st: jax.lax.fori_loop(
            0, FLUSH_STEPS, lambda i, s: step(s), st)
    cadence = max(1, min(int(cadence), FLUSH_STEPS))
    n_blk = FLUSH_STEPS // cadence

    def blk(st):
        def one(i, s):
            s = jax.lax.fori_loop(0, cadence, lambda k, x: step(x), s)
            return sorter(s)
        return jax.lax.fori_loop(0, n_blk, one, st)

    return blk


def _build(scene, camera, width, height, seed, sample_start, samples,
           max_depth, pool, pixel_offset, n_pixels, sample_stride,
           rr_depth, slots=None, pend=False, film_mm=0):
    """Returns (total, make_rays, step, layout) for the wavefront.

    Work items are PIXEL-MAJOR: item -> (pixel = item // samples,
    sample = item % samples), so claims sweep the frame front-to-back
    and in-flight pixels stay within a rolling window (the slot
    accumulator's reuse-safety precondition).
    """
    npix = n_pixels if n_pixels is not None else width * height
    total = npix * samples  # `samples` may be traced: total only feeds
    # comparisons/arithmetic, never shapes — one compile serves any spp.
    film_mm = int(film_mm)
    layout = _slots_for(npix, slots, mm=bool(film_mm))
    slots_eff, slab, npix_pad, big_mode = layout
    if film_mm:
        film_mm = min(film_mm, slots_eff)
        assert not pend, "film_mm and pend film modes are exclusive"
        assert film_mm <= slots_eff and film_mm % 128 == 0, (
            film_mm, slots_eff)

    inv_w = 1.0 / jnp.float32(width)
    inv_h = 1.0 / jnp.float32(height)

    # Idle lanes are parked on a NEUTRAL ray that starts past the scene
    # on every axis and points away, so the acceleration root's slab
    # test rejects it immediately.  Without this, a lane that dies with
    # no work left keeps re-traversing its stale ray every step; on
    # Menger L5 (depth 8, pool >= queue) ~70% of all traversal was
    # stale — and since packet kernels pay the union of their lanes'
    # subtrees, stale packets drowned any gain from coherence sorting.
    # Semantically free: every film contribution is `active`-gated.
    _bmin, _bmax = scene.world_bounds()
    neutral_o = _bmax + jnp.maximum(_bmax - _bmin, 1.0)
    neutral_d = jnp.full((3,), 0.57735027, jnp.float32)

    def make_rays(item):
        """Camera rays for work items, with the exact RNG stream of
        wavefront.render_sample."""
        q = item // samples
        s_idx = item - q * samples
        pixel = jnp.uint32(pixel_offset) + q.astype(jnp.uint32)
        sample = (jnp.uint32(sample_start)
                  + s_idx.astype(jnp.uint32) * jnp.uint32(sample_stride))
        px = (pixel % jnp.uint32(width)).astype(jnp.float32)
        py = (pixel // jnp.uint32(width)).astype(jnp.float32)
        cam = Sampler(seed, pixel + jnp.uint32(0x9E3779B9) * sample,
                      salt=0xC0FFEE)
        jx, jy, du, dv = cam.next4()
        s = (px + jx) * inv_w
        t = (py + jy) * inv_h
        o, d = camera.rays(s, t, du, dv)
        ray_id = pixel ^ (sample * jnp.uint32(0x85EBCA6B))
        return o, d, ray_id

    def step(state):
        (item, bounce, o, d, throughput, ray_id, next_work,
         dest, flushed_q, prev_pdf, *rest) = state
        active = item < total
        q = jnp.clip(item, 0, total - 1) // samples  # local pixel index

        b = bounce
        vol_sampler = Sampler(seed, ray_id, salt=3 * b + 2)
        hits = scene.intersect(o, d, t_min=T_MIN, sampler=vol_sampler)
        em_sampler = Sampler(seed, ray_id, salt=3 * b)
        sc_sampler = Sampler(seed, ray_id, salt=3 * b + 1)
        emitted, atten, new_dir, scattered, lobe = shade.shade_hit(
            scene, hits, d, em_sampler, sc_sampler)

        hit = hits.hit & active
        miss = ~hits.hit & active
        # Pre-masked (and, on TPU, miss-lane-compacted) background:
        # zeros on non-miss lanes, bit-exact either way.
        background = scene.background_eval_masked(d, miss)

        if scene.lights is not None:
            # NEE+MIS emission weighting (see wavefront._bounce).
            from ..materials import table as T
            from ..materials import lights as lights_mod

            from ..materials.shade import _icol, _rows_of
            is_light = (_icol(_rows_of(scene.materials, hits.material),
                              T.MaterialTable.C_MTYPE)
                        == T.DIFFUSE_LIGHT)
            w_b = lights_mod.mis_bsdf_weight(scene, hits, o, d,
                                             prev_pdf)
            emitted = emitted * jnp.where(is_light & (prev_pdf > 0.0),
                                          w_b, 1.0)[:, None]

        radiance_add = (background
                        + jnp.where(hit[:, None], emitted, 0.0))
        radiance_add = jnp.where(active[:, None],
                                 throughput * radiance_add, 0.0)

        next_pdf = jnp.zeros_like(prev_pdf)
        if scene.lights is not None:
            from ..materials import lights as lights_mod
            from ..math import vec

            nee_sampler = Sampler(seed, ray_id, salt=(1 << 30) + 3 * b)
            direct, did_nee = lights_mod.sample_direct(scene, hits,
                                                       nee_sampler,
                                                       lobe=lobe)
            did_nee = did_nee & hit
            radiance_add = radiance_add + jnp.where(
                did_nee[:, None], throughput * atten * direct, 0.0)
            next_pdf = lights_mod.bsdf_pdf(lobe, vec.unit(hits.normal),
                                           vec.unit(new_dir))

        scat = hit & scattered
        cont = scat & (b + 1 < max_depth)

        if rr_depth is not None:
            # Russian roulette (see wavefront._bounce).  Applied to
            # `scat` (not the depth-gated cont) so the bounce counts
            # match the batched integrator exactly.
            rr_sampler = Sampler(seed, ray_id, salt=(1 << 29) + b)
            tp_next = throughput * atten
            p_survive = jnp.clip(jnp.max(tp_next, axis=-1), 0.05, 1.0)
            roll = rr_sampler.next1() < p_survive
            apply_rr = scat & (b >= rr_depth)
            scat = scat & (~apply_rr | roll)
            cont = cont & scat
            atten = jnp.where(apply_rr[:, None],
                              atten / p_survive[:, None], atten)

        # Film contribution: radiance (3) + depth count (1) — into the
        # SMALL slot accumulator, never the full film (the in-loop
        # scatter cost scales with the carried destination size).
        slot = q & jnp.int32(slots_eff - 1) if big_mode else q
        contrib = jnp.concatenate(
            [radiance_add, scat.astype(jnp.float32)[:, None]], axis=-1)
        if os.environ.get("MRT_NAN_GUARD") == "1":
            # Opt-in film guard (VERDICT r4 #4): drop non-finite
            # contributions so one degenerate path cannot poison a
            # pixel's accumulation for the rest of a showcase render.
            # (The film_mm path sanitizes unconditionally below.)
            contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
        import os as _os
        if _os.environ.get("MRT_FILM_SKIP") == "1":
            # PROBE ONLY (wrong output): drop the film update entirely
            # to measure how much of the scatter's cost XLA actually
            # hides behind the rest of the step (tools/probe_film_mm).
            if film_mm:
                strag = jnp.zeros_like(active)
                acc, pslot, pacc = rest[0], rest[1], rest[2]
        elif film_mm:
            # Windowed one-hot MXU deposit (ops/film_deposit), window
            # riding the CLAIM FRONTIER: lanes claimed within the last
            # W pixels (the dense mass — claims are pixel-major)
            # deposit via the matmul; older "straggler" lanes (the
            # deep-path tail) accumulate per-lane into `acc` and flush
            # once at death below.  No claim gating: gating claims to
            # a min_live window starved the pool to 20-40% on hardware
            # (artifacts/film_mm_r05.json, v1).  Replaces the serial
            # per-row scatter; f32 add-reassociation only, and
            # non-finite contributions are dropped by the deposit.
            from ..ops import film_deposit

            claimed_q = (jnp.maximum(next_work, 1) - 1) // samples
            base = jnp.maximum(jnp.int32(0),
                               claimed_q - jnp.int32(film_mm - 1))
            strag = active & (q < base)
            contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
            dest = film_deposit.deposit_matmul(
                dest, q, jnp.where(strag[:, None], 0.0, contrib),
                base, film_mm)
            acc = rest[0] + jnp.where(strag[:, None], contrib, 0.0)
            pslot, pacc = rest[1], rest[2]
        elif pend:
            # Per-lane pending accumulator + predicated deposit kernel:
            # only dying lanes touch dest (~pool/avg_depth rows) instead
            # of a pool-row serial scatter every step.
            from ..ops import pallas_deposit

            acc = rest[0] + contrib
        else:
            dest = dest.at[slot].add(contrib)

        if pend:
            from ..ops import pallas_deposit

            dep = active & ~cont
            dest = pallas_deposit.deposit_add(
                dest, slot, acc, dep, interpret=(pend == "interpret"))
            acc = jnp.where(dep[:, None], 0.0, acc)

        # Regenerate dead lanes from the queue, gated so no claimed
        # pixel runs SLOTS ahead of the flush frontier (slot-reuse
        # safety; a gated lane idles and re-claims next step).
        dead = active & ~cont
        if film_mm:
            # Dying stragglers PARK their accumulator in the per-lane
            # pending register; the block driver flushes all pendings
            # once per FLUSH_STEPS (scatter-free MXU deposit).  A lane
            # can only need its register again after re-stragglering
            # (>= W/claim-rate steps), so in-step conflicts are rare —
            # the while_loop inside flush_pending costs zero
            # iterations when none fired.
            sd = strag & dead
            if _os.environ.get("MRT_MM_NOCONFLICT") == "1":
                # PROBE ONLY: drop the in-step conflict flush (a
                # conflicted overwrite would lose counts — verified
                # impossible under the W*spp ~ 4*pool rule by film
                # equality in the probe).
                pass
            else:
                conflict = sd & (pslot >= 0)
                dest, pslot, pacc = film_deposit.flush_pending(
                    dest, pslot, pacc, mask=conflict)
            pslot = jnp.where(sd, slot, pslot)
            pacc = jnp.where(sd[:, None], acc, pacc)
            acc = jnp.where(sd[:, None], 0.0, acc)
        idle = ~active
        claim = dead | idle
        offsets = jnp.cumsum(claim.astype(jnp.int32)) - 1
        new_item = next_work + offsets
        if big_mode:
            limit = jnp.minimum(total, (flushed_q + slots_eff) * samples)
        else:
            limit = total
        takes = claim & (new_item < limit)
        # takes is a prefix of claims (offsets increase), so advancing
        # by its count skips no items.
        next_work = next_work + jnp.sum(takes.astype(jnp.int32))

        item = jnp.where(cont, item,
                         jnp.where(takes, new_item, total))
        no, nd, nrid = make_rays(jnp.where(takes, new_item, 0))

        o = jnp.where(cont[:, None], hits.point,
                      jnp.where(takes[:, None], no, neutral_o))
        d = jnp.where(cont[:, None], new_dir,
                      jnp.where(takes[:, None], nd, neutral_d))
        throughput = jnp.where(
            cont[:, None], throughput * atten,
            jnp.where(takes[:, None], jnp.ones_like(throughput),
                      throughput))
        ray_id = jnp.where(cont, ray_id, jnp.where(takes, nrid, ray_id))
        bounce = jnp.where(cont, b + 1, 0)
        prev_pdf = jnp.where(cont, next_pdf, 0.0)

        out = (item, bounce, o, d, throughput, ray_id, next_work,
               dest, flushed_q, prev_pdf)
        if film_mm:
            out = out + (acc, pslot, pacc)
        elif pend:
            out = out + (acc,)
        return out

    def maybe_flush(state, film):
        """Flush the next slab [flushed_q, flushed_q+slab) of `dest`
        into `film` when it is fully claimed (or the queue is done) and
        every live path has moved past it.  One contiguous
        dynamic-slice add — no scatter touches the big film.

        Indexed state access: the pend film mode appends a per-lane
        pending accumulator to the tuple; positions 0-9 are shared."""
        if not big_mode:
            return state, film
        item, next_work, dest, flushed_q = (state[0], state[6],
                                            state[7], state[8])
        active = item < total
        q = jnp.clip(item, 0, total - 1) // samples
        min_live = jnp.min(jnp.where(active, q, _BIG))
        claimed_q = next_work // samples
        ready = (claimed_q >= flushed_q + slab) | (next_work >= total)
        clear = min_live >= flushed_q + slab
        can = ready & clear & (flushed_q < jnp.int32(npix))

        def do(args):
            film, dest = args
            s_idx = flushed_q & jnp.int32(slots_eff - 1)
            chunk = jax.lax.dynamic_slice(dest, (s_idx, 0), (slab, 4))
            cur = jax.lax.dynamic_slice(film, (flushed_q, 0), (slab, 4))
            film = jax.lax.dynamic_update_slice(film, cur + chunk,
                                                (flushed_q, 0))
            dest = jax.lax.dynamic_update_slice(
                dest, jnp.zeros((slab, 4), jnp.float32), (s_idx, 0))
            return film, dest

        film, dest = jax.lax.cond(can, do, lambda a: a, (film, dest))
        flushed_q = jnp.where(can, flushed_q + slab, flushed_q)
        return state[:7] + (dest, flushed_q) + state[9:], film

    def flush_pendings(state):
        """Release every parked straggler accumulator into the dest
        ring (film_mm only; scatter-free).  Runs once per FLUSH_STEPS
        block, BEFORE maybe_flush — a parked pixel no longer pins
        min_live, so its slab could otherwise flush to film first."""
        if not film_mm:
            return state
        from ..ops import film_deposit

        dest, pslot, pacc = state[7], state[11], state[12]
        dest, pslot, pacc = film_deposit.flush_pending(dest, pslot,
                                                       pacc)
        return state[:7] + (dest,) + state[8:11] + (pslot, pacc)

    def finalize(state, film):
        """Drain every remaining slab (the unflushed window is at most
        SLABS slabs wide, +1 for a partial tail)."""
        state = flush_pendings(state)
        if not big_mode:
            return film + state[7]
        for _ in range(slots_eff // slab + 2):
            state, film = maybe_flush(state, film)
        return film

    return (total, make_rays, step, maybe_flush, finalize, layout,
            (neutral_o, neutral_d), flush_pendings)


def _init_state(make_rays, pool, dest, vzero_f, vzero_i, init_limit,
                neutral=None, pending=False):
    """Initial claims honor the same slot-window gate as in-loop claims
    (`init_limit` = slots_eff*samples in big mode): lanes past the gate
    start idle and claim once flushing opens the window."""
    lane = jnp.arange(pool, dtype=jnp.int32) + vzero_i
    take = lane < init_limit
    init_item = jnp.where(take, lane, _BIG)
    o0, d0, rid0 = make_rays(jnp.where(take, lane, 0))
    if neutral is not None:
        o0 = jnp.where(take[:, None], o0, neutral[0])
        d0 = jnp.where(take[:, None], d0, neutral[1])
    state = (
        init_item,                                   # work item
        jnp.zeros((pool,), jnp.int32) + vzero_i,     # bounce
        o0, d0,
        jnp.ones_like(o0),                           # throughput
        rid0,
        jnp.minimum(jnp.int32(pool),                 # next_work
                    init_limit) + vzero_i,
        dest + vzero_f,                              # slot accumulator
        jnp.int32(0) + vzero_i,                      # flushed_q
        jnp.zeros((pool,), jnp.float32) + vzero_f,   # prev_pdf (MIS)
    )
    if pending:
        # Per-lane pending (radiance, bounce-count) accumulator: the
        # pend film mode deposits once per path death, not per step.
        state = state + (jnp.zeros((pool, 4), jnp.float32) + vzero_f,)
    if pending == "mm":
        # film_mm straggler registers: parked (slot, accumulator)
        # pairs, flushed scatter-free once per block.
        state = state + (
            jnp.full((pool,), -1, jnp.int32) + vzero_i,
            jnp.zeros((pool, 4), jnp.float32) + vzero_f,
        )
    return state


def _pack_film(film_sum, depth_sum, npix_pad):
    packed = jnp.concatenate(
        [film_sum, depth_sum.astype(jnp.float32)[:, None]], axis=-1)
    pad = npix_pad - packed.shape[0]
    if pad:
        packed = jnp.pad(packed, ((0, pad), (0, 0)))
    return packed


def _unpack_film(film, npix):
    film = film[:npix]
    return film[:, :3], jnp.round(film[:, 3]).astype(jnp.int32)


def render_samples_persistent(scene, camera, width, height, seed,
                              sample_start, samples,
                              max_depth=MAX_DEPTH, pool=POOL,
                              film_sum=None, depth_sum=None,
                              pixel_offset=0, n_pixels=None,
                              sample_stride=1, rr_depth=None,
                              slots=None, sort_rays=False,
                              pend=False, film_mm=0):
    """Single device-side while_loop (for use inside jit/shard_map).

    Returns (film_sum (n_pixels,3), depth_sum (n_pixels,)) — pass them
    back in to accumulate further passes.  `pend` must be resolved by
    the caller (static; `pixel_offset` may be traced under
    shard_map).
    """
    npix = n_pixels if n_pixels is not None else width * height
    if film_sum is None:
        film_sum = jnp.zeros((npix, 3), jnp.float32)
    if depth_sum is None:
        depth_sum = jnp.zeros((npix,), jnp.int32)

    # Varying-axes seed: loop-carry inits must inherit the varying type
    # of the shard inputs under shard_map (no-op zeros otherwise).
    vzero_f = (film_sum.ravel()[0] * 0.0
               + jnp.asarray(sample_start, jnp.float32) * 0.0)
    vzero_i = vzero_f.astype(jnp.int32)

    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral, flush_pendings) = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, pixel_offset, n_pixels, sample_stride, rr_depth,
        slots, pend=pend, film_mm=film_mm)
    slots_eff, slab, npix_pad, big_mode = layout

    film = _pack_film(film_sum, depth_sum, npix_pad) + vzero_f
    if big_mode:
        dest = jnp.zeros((slots_eff, 4), jnp.float32)
        work_film = film
        init_limit = jnp.int32(slots_eff) * jnp.asarray(samples, jnp.int32)
    else:
        dest = jnp.zeros((npix_pad, 4), jnp.float32)
        work_film = film  # untouched until the final add
        init_limit = _BIG
    state = _init_state(make_rays, pool, dest, vzero_f, vzero_i,
                        init_limit, neutral,
                        pending="mm" if film_mm
                        else bool(pend))

    def cond(carry):
        state, film = carry
        return jnp.any(state[0] < total) | (state[6] < total)

    sorter = _make_sorter(scene, total) if sort_rays else None
    run_block = _flush_block(step, sorter,
                             int(sort_rays) or FLUSH_STEPS)

    def body(carry):
        state, film = carry
        state = run_block(state)
        state = flush_pendings(state)
        state, film = maybe_flush(state, film)
        state, film = maybe_flush(state, film)
        return state, film

    state, film = jax.lax.while_loop(cond, body, (state, work_film))
    film = finalize(state, film)
    return _unpack_film(film, npix)


@partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                   "pool", "rr_depth", "slots",
                                   "sort_rays", "pend", "film_mm"))
def _chunk_init(scene, camera, film_sum, depth_sum, seed, sample_start,
                samples, *, width, height, max_depth, pool, rr_depth,
                slots=None, sort_rays=False, pend=False, film_mm=0):
    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral, flush_pendings) = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, 0, None, 1, rr_depth, slots, pend=pend,
        film_mm=film_mm)
    slots_eff, slab, npix_pad, big_mode = layout
    zero = jnp.float32(0.0)
    dest = jnp.zeros((slots_eff if big_mode else npix_pad, 4),
                     jnp.float32)
    film = _pack_film(film_sum, depth_sum, npix_pad)
    init_limit = (jnp.int32(slots_eff) * jnp.asarray(samples, jnp.int32)
                  if big_mode else _BIG)
    return (_init_state(make_rays, pool, dest, zero, jnp.int32(0),
                        init_limit, neutral,
                        pending="mm" if film_mm
                        else bool(pend)), film)


@partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                   "pool", "rr_depth", "slots",
                                   "sort_rays", "pend", "film_mm"))
def _chunk_run(scene, camera, state, film, seed, sample_start, samples,
               chunk_steps, *, width, height, max_depth, pool, rr_depth,
               slots=None, sort_rays=False, pend=False, film_mm=0):
    # chunk_steps is TRACED: the adaptive driver changes it per chunk
    # without recompiling (remote compiles cost minutes here).
    (total, _, step, maybe_flush, finalize, layout, neutral,
     flush_pendings) = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, 0, None, 1, rr_depth, slots, pend=pend,
        film_mm=film_mm)
    sorter = _make_sorter(scene, total) if sort_rays else None
    run_block = _flush_block(step, sorter,
                             int(sort_rays) or FLUSH_STEPS)

    def cond(carry):
        i, st, film = carry
        return ((i < chunk_steps)
                & (jnp.any(st[0] < total) | (st[6] < total)))

    def body(carry):
        i, st, film = carry
        st = run_block(st)
        st = flush_pendings(st)
        st, film = maybe_flush(st, film)
        st, film = maybe_flush(st, film)
        return i + FLUSH_STEPS, st, film

    _, state, film = jax.lax.while_loop(cond, body,
                                        (jnp.int32(0), state, film))
    more = jnp.any(state[0] < total) | (state[6] < total)
    return state, film, more


@partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                   "pool", "rr_depth", "slots",
                                   "sort_rays", "pend", "film_mm"))
def _chunk_finalize(scene, camera, state, film, seed, sample_start,
                    samples, *, width, height, max_depth, pool,
                    rr_depth, slots=None, sort_rays=False,
                    pend=False, film_mm=0):
    total, _, _, _, finalize, layout, _n, _fp = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, 0, None, 1, rr_depth, slots, pend=pend,
        film_mm=film_mm)
    npix = width * height
    film = finalize(state, film)
    return _unpack_film(film, npix)


# Adaptive chunking: target seconds of device time per dispatch — long
# enough to amortise the host/tunnel round-trip, far below the device
# execution watchdog.
CHUNK_TARGET_SECONDS = 10.0
CHUNK_MAX_STEPS = 4096


def _pend_enabled(pend, *, pool, width, height, slots):
    """Resolve the pending-deposit film mode: None = auto (off until
    hardware-validated; MRT_FILM_PEND=1 forces on TPU)."""
    if pend is False:
        return False
    from ..ops import pallas_deposit as pd

    npix = width * height
    slots_eff, slab, npix_pad, big_mode = _slots_for(npix, slots)
    rows = slots_eff if big_mode else npix_pad
    if not pd.usable(pool, rows):
        return False
    if pend is None:
        import os

        from ..geometry.spheres import _on_tpu
        flag = os.environ.get("MRT_FILM_PEND")
        if flag == "1":
            return True
        if flag == "0":
            return False
        return PEND_AUTO_ON and _on_tpu()
    return pend


# Flip after hardware timing shows the predicated deposit kernel beats
# the XLA pool-row scatter (tools/probe_deposit.py).
PEND_AUTO_ON = False


def _film_mm_enabled(film_mm, *, samples, width, height, slots,
                     pool=POOL, scene=None):
    """Resolve the one-hot MXU film-deposit mode: None = auto.

    Auto is TPU-only, big-frame-mode-only, samples >= MM_MIN_SPP, and
    OFF for voxel-DDA scenes: hardware A/B (artifacts/menger_mm_r05.json,
    menger 1080p spp16) measured the deposit losing ~15-30% at EVERY
    window width (off 84.6s; auto-W 112.6s; W=8192 97.6s; W=4096
    99.4s), restoring the r3 criterion timing.  The DDA step is one
    huge fused elementwise graph; inserting the deposit pallas_call
    breaks that fusion and the context cost exceeds the scatter saved.
    Window width: the frontier window must out-span the straggler
    tail's age in claim-items (~pool/avg_len per step), so
    W * samples ~ 4 * pool fits the hardware sweep
    (artifacts/film_mm_r05.json: spp64 best at W=8192 = 11.76M vs
    9.02 scatter, spp8 best at W=32768 = 9.80M vs 7.80).
    MRT_FILM_MM=1/0 forces; MRT_FILM_MM_W overrides the width."""
    if film_mm is False or film_mm == 0:
        return 0
    from ..ops import film_deposit as fd

    npix = width * height
    slots_eff, slab, npix_pad, big_mode = _slots_for(npix, slots,
                                                     mm=True)
    if film_mm and film_mm is not True and film_mm is not None:
        return min(int(film_mm), slots_eff)
    if os.environ.get("MRT_FILM_MM_W"):
        w = fd.DEFAULT_W
    else:
        w = 1 << max(13, min(15, (4 * pool // max(int(samples), 1))
                             .bit_length() - 1))
    w = min(w, slots_eff)
    flag = fd.mode()
    if flag == "0":
        return 0
    if flag == "1" or film_mm is True:
        return w
    from ..geometry.spheres import _on_tpu
    auto = MM_AUTO_ON if big_mode else MM_SMALL_AUTO
    if scene is not None and getattr(scene, "voxels", None):
        auto = False  # measured loss at every W (menger_mm_r05.json)
    if auto and _on_tpu() and samples >= MM_MIN_SPP:
        return w
    return 0


# Hardware-decided r5 (artifacts/film_mm_r05.json): the scatter-free
# deposit beats the serial scatter at every measured big-frame
# workload with samples >= 8 (+30% at the named spp64 workload, +26%
# at spp8).  Small-frame (zoo) mode pending its own A/B
# (tools/probe_zoo_mm.py).
MM_AUTO_ON = True
MM_SMALL_AUTO = False
MM_MIN_SPP = 8


def render_samples_chunked(scene, camera, width, height, seed,
                           sample_start, samples, max_depth=MAX_DEPTH,
                           pool=POOL, film_sum=None, depth_sum=None,
                           rr_depth=None, chunk_steps=CHUNK_STEPS,
                           slots=None, sort_rays=False, pend=None,
                           film_mm=None):
    """Python-driven chunked dispatches (single-chip fast path).

    Identical results to `render_samples_persistent`; each dispatch is
    bounded in wavefront steps, and the bound adapts to the measured
    step rate so dispatches stay near CHUNK_TARGET_SECONDS.
    """
    import time

    npix = width * height
    if film_sum is None:
        film_sum = jnp.zeros((npix, 3), jnp.float32)
    if depth_sum is None:
        depth_sum = jnp.zeros((npix,), jnp.int32)

    film_mm = _film_mm_enabled(film_mm, samples=samples, width=width,
                               height=height, slots=slots, pool=pool,
                               scene=scene)
    pend = False if film_mm else _pend_enabled(
        pend, pool=pool, width=width, height=height, slots=slots)
    statics = dict(width=width, height=height, max_depth=max_depth,
                   pool=pool, rr_depth=rr_depth, slots=slots,
                   sort_rays=sort_rays, pend=pend, film_mm=film_mm)
    state, film = _chunk_init(scene, camera, film_sum, depth_sum, seed,
                              sample_start, samples, **statics)
    steps = max(chunk_steps, FLUSH_STEPS)
    while True:
        t0 = time.perf_counter()
        state, film, more = _chunk_run(scene, camera, state, film, seed,
                                       sample_start, samples,
                                       jnp.int32(steps), **statics)
        more = bool(more)  # device sync: chunk has finished
        dt = time.perf_counter() - t0
        if not more:
            break
        per_step = max(dt / steps, 1e-4)
        steps = int(min(max(CHUNK_TARGET_SECONDS / per_step, CHUNK_STEPS),
                        CHUNK_MAX_STEPS))
    return _chunk_finalize(scene, camera, state, film, seed,
                           sample_start, samples, **statics)
