"""Persistent-wavefront integrator with ray regeneration.

The plain wavefront loop (`trace_wavefront`) keeps every lane occupied by
the same path until the whole batch dies, so at depth 50 with a mean
path length of ~3 most lanes idle ~94% of the iterations.  This module
is the TPU analogue of persistent-threads path tracing: a fixed pool of
P lanes consumes a queue of (pixel, sample) work items; the moment a
path terminates its lane claims the next item and generates that
sample's camera ray.  Contributions stream into the film with one
packed scatter-add per bounce, so no per-lane radiance accumulator and
no path ever waits on another.

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

from functools import partial

import jax
import jax.numpy as jnp

from ..math.rng import Sampler
from ..materials import shade
from .wavefront import MAX_DEPTH, T_MIN

POOL = 1 << 17
CHUNK_STEPS = 8


def _build(scene, camera, width, height, seed, sample_start, samples,
           max_depth, pool, pixel_offset, n_pixels, sample_stride,
           rr_depth):
    """Returns (total, make_rays, step) for the persistent wavefront."""
    npix = n_pixels if n_pixels is not None else width * height
    total = npix * samples  # `samples` may be traced: total only feeds
    # comparisons/arithmetic, never shapes — one compile serves any spp.

    inv_w = 1.0 / jnp.float32(width)
    inv_h = 1.0 / jnp.float32(height)

    def make_rays(item):
        """Camera rays for work items, with the exact RNG stream of
        wavefront.render_sample."""
        pixel = (jnp.uint32(pixel_offset)
                 + (item % npix).astype(jnp.uint32))
        sample = (jnp.uint32(sample_start)
                  + (item // npix).astype(jnp.uint32)
                  * jnp.uint32(sample_stride))
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
         packed, prev_pdf) = state
        active = item < total
        pixel = jnp.clip(item, 0, total - 1) % npix  # local index

        b = bounce
        vol_sampler = Sampler(seed, ray_id, salt=3 * b + 2)
        hits = scene.intersect(o, d, t_min=T_MIN, sampler=vol_sampler)
        em_sampler = Sampler(seed, ray_id, salt=3 * b)
        sc_sampler = Sampler(seed, ray_id, salt=3 * b + 1)
        emitted, atten, new_dir, scattered, lobe = shade.shade_hit(
            scene, hits, d, em_sampler, sc_sampler)
        background = scene.background_eval(d)

        hit = hits.hit & active
        miss = ~hits.hit & active

        if scene.lights is not None:
            # NEE+MIS emission weighting (see wavefront._bounce).
            from ..materials import table as T
            from ..materials import lights as lights_mod

            is_light = (scene.materials.mtype[hits.material]
                        == T.DIFFUSE_LIGHT)
            w_b = lights_mod.mis_bsdf_weight(scene, hits, o, d,
                                             prev_pdf)
            emitted = emitted * jnp.where(is_light & (prev_pdf > 0.0),
                                          w_b, 1.0)[:, None]

        radiance_add = (jnp.where(miss[:, None], background, 0.0)
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

        # Single packed scatter: radiance (3) + depth count (1).
        packed = packed.at[pixel].add(jnp.concatenate(
            [radiance_add, scat.astype(jnp.float32)[:, None]], axis=-1))

        # Regenerate dead lanes from the queue.
        dead = active & ~cont
        idle = ~active
        claim = dead | idle
        offsets = jnp.cumsum(claim.astype(jnp.int32)) - 1
        new_item = next_work + offsets
        takes = claim & (new_item < total)
        next_work = next_work + jnp.sum(claim.astype(jnp.int32))
        # next_work beyond total is harmless: later claims won't take.
        next_work = jnp.minimum(next_work, jnp.int32(2 ** 30))

        item = jnp.where(cont, item,
                         jnp.where(takes, new_item, total))
        no, nd, nrid = make_rays(jnp.where(takes, new_item, 0))

        o = jnp.where(cont[:, None], hits.point,
                      jnp.where(takes[:, None], no, o))
        d = jnp.where(cont[:, None], new_dir,
                      jnp.where(takes[:, None], nd, d))
        throughput = jnp.where(
            cont[:, None], throughput * atten,
            jnp.where(takes[:, None], jnp.ones_like(throughput),
                      throughput))
        ray_id = jnp.where(cont, ray_id, jnp.where(takes, nrid, ray_id))
        bounce = jnp.where(cont, b + 1, 0)
        prev_pdf = jnp.where(cont, next_pdf, 0.0)

        return (item, bounce, o, d, throughput, ray_id, next_work,
                packed, prev_pdf)

    return total, make_rays, step


def _init_state(make_rays, pool, film_sum, depth_sum, vzero_f, vzero_i):
    # Radiance + depth pack into one (npix, 4) accumulator so each step
    # issues ONE scatter-add.  Depth counts stay exact in f32 (bounded
    # by spp * max_depth << 2^24).
    packed = jnp.concatenate(
        [film_sum, depth_sum.astype(jnp.float32)[:, None]],
        axis=-1) + vzero_f
    init_item = jnp.arange(pool, dtype=jnp.int32) + vzero_i
    o0, d0, rid0 = make_rays(init_item)
    return (
        init_item,                                   # work item
        jnp.zeros((pool,), jnp.int32) + vzero_i,     # bounce
        o0, d0,
        jnp.ones_like(o0),                           # throughput
        rid0,
        jnp.int32(pool) + vzero_i,                   # next_work
        packed,
        jnp.zeros((pool,), jnp.float32) + vzero_f,   # prev_pdf (MIS)
    )


def _unpack(state):
    packed = state[7]
    return packed[:, :3], jnp.round(packed[:, 3]).astype(jnp.int32)


def render_samples_persistent(scene, camera, width, height, seed,
                              sample_start, samples,
                              max_depth=MAX_DEPTH, pool=POOL,
                              film_sum=None, depth_sum=None,
                              pixel_offset=0, n_pixels=None,
                              sample_stride=1, rr_depth=None):
    """Single device-side while_loop (for use inside jit/shard_map).

    Returns (film_sum (n_pixels,3), depth_sum (n_pixels,)) — pass them
    back in to accumulate further passes.
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

    total, make_rays, step = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, pixel_offset, n_pixels, sample_stride, rr_depth)
    state = _init_state(make_rays, pool, film_sum, depth_sum, vzero_f,
                        vzero_i)

    def cond(state):
        return jnp.any(state[0] < total)

    state = jax.lax.while_loop(cond, step, state)
    return _unpack(state)


@partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                   "pool", "rr_depth"))
def _chunk_init(scene, camera, film_sum, depth_sum, seed, sample_start,
                samples, *, width, height, max_depth, pool, rr_depth):
    total, make_rays, _ = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, 0, None, 1, rr_depth)
    zero = jnp.float32(0.0)
    return _init_state(make_rays, pool, film_sum, depth_sum, zero,
                       jnp.int32(0))


@partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                   "pool", "rr_depth"))
def _chunk_run(scene, camera, state, seed, sample_start, samples,
               chunk_steps, *, width, height, max_depth, pool, rr_depth):
    # chunk_steps is TRACED: the adaptive driver changes it per chunk
    # without recompiling (remote compiles cost minutes here).
    total, _, step = _build(
        scene, camera, width, height, seed, sample_start, samples,
        max_depth, pool, 0, None, 1, rr_depth)

    def cond(carry):
        i, st = carry
        return (i < chunk_steps) & jnp.any(st[0] < total)

    def body(carry):
        i, st = carry
        return i + 1, step(st)

    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state, jnp.any(state[0] < total)


# Adaptive chunking: target seconds of device time per dispatch — long
# enough to amortise the host/tunnel round-trip, far below the device
# execution watchdog.
CHUNK_TARGET_SECONDS = 10.0
CHUNK_MAX_STEPS = 4096


def render_samples_chunked(scene, camera, width, height, seed,
                           sample_start, samples, max_depth=MAX_DEPTH,
                           pool=POOL, film_sum=None, depth_sum=None,
                           rr_depth=None, chunk_steps=CHUNK_STEPS):
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

    statics = dict(width=width, height=height, max_depth=max_depth,
                   pool=pool, rr_depth=rr_depth)
    state = _chunk_init(scene, camera, film_sum, depth_sum, seed,
                        sample_start, samples, **statics)
    steps = chunk_steps
    while True:
        t0 = time.perf_counter()
        state, more = _chunk_run(scene, camera, state, seed,
                                 sample_start, samples,
                                 jnp.int32(steps), **statics)
        more = bool(more)  # device sync: chunk has finished
        dt = time.perf_counter() - t0
        if not more:
            break
        per_step = max(dt / steps, 1e-4)
        steps = int(min(max(CHUNK_TARGET_SECONDS / per_step, CHUNK_STEPS),
                        CHUNK_MAX_STEPS))
    return _unpack(state)
