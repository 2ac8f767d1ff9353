"""Ablation profile of the real persistent step (RTIOW 1080p).

Rebuilds the exact step with stages selectively stubbed, so stage costs
are measured inside the true compiled graph (microbenches of isolated
primitives all came back fast; the cost lives in the interactions).
"""
import time

import numpy as np

K = 64
POOL = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.integrator.wavefront import T_MIN

    W, H, DEPTH = 1920, 1080, 50
    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()
    npix = W * H
    pool = POOL
    seed = 1
    total = npix * 8

    inv_w = 1.0 / jnp.float32(W)
    inv_h = 1.0 / jnp.float32(H)

    def make_rays(item):
        pixel = (item % npix).astype(jnp.uint32)
        sample = (item // npix).astype(jnp.uint32)
        px = (pixel % jnp.uint32(W)).astype(jnp.float32)
        py = (pixel // jnp.uint32(W)).astype(jnp.float32)
        cam = Sampler(seed, pixel + jnp.uint32(0x9E3779B9) * sample,
                      salt=0xC0FFEE)
        jx, jy, du, dv = cam.next4()
        s = (px + jx) * inv_w
        t = (py + jy) * inv_h
        o, d = camera.rays(s, t, du, dv)
        ray_id = pixel ^ (sample * jnp.uint32(0x85EBCA6B))
        return o, d, ray_id

    def build_step(do_isect=True, do_shade=True, do_scatter=True,
                   do_regen=True, do_bg=True):
        def step(state):
            (item, bounce, o, d, throughput, ray_id, next_work,
             packed) = state
            active = item < total
            pixel = jnp.clip(item, 0, total - 1) % npix
            b = bounce
            if do_isect:
                vs = Sampler(seed, ray_id, salt=3 * b + 2)
                hits = scene.intersect(o, d, t_min=T_MIN, sampler=vs)
                hitmask, point = hits.hit, hits.point
            else:
                hitmask = (o[:, 1] + d[:, 1]) > 0.5
                point = o + d * 0.5

            if do_shade and do_isect:
                em = Sampler(seed, ray_id, salt=3 * b)
                sc = Sampler(seed, ray_id, salt=3 * b + 1)
                emitted, atten, new_dir, scattered, lobe = \
                    shade.shade_hit(scene, hits, d, em, sc)
            else:
                emitted = jnp.zeros_like(o)
                atten = jnp.full_like(o, 0.9)
                new_dir = -d
                scattered = hitmask

            if do_bg:
                background = scene.background_eval(d)
            else:
                background = jnp.zeros_like(o)

            hit = hitmask & active
            miss = ~hitmask & active
            radiance_add = (jnp.where(miss[:, None], background, 0.0)
                            + jnp.where(hit[:, None], emitted, 0.0))
            radiance_add = jnp.where(active[:, None],
                                     throughput * radiance_add, 0.0)
            scat = hit & scattered
            cont = scat & (b + 1 < DEPTH)

            if do_scatter:
                packed = packed.at[pixel].add(jnp.concatenate(
                    [radiance_add,
                     scat.astype(jnp.float32)[:, None]], axis=-1))

            dead = active & ~cont
            idle = ~active
            claim = dead | idle
            if do_regen:
                offsets = jnp.cumsum(claim.astype(jnp.int32)) - 1
                new_item = next_work + offsets
                takes = claim & (new_item < total)
                next_work = next_work + jnp.sum(claim.astype(jnp.int32))
                next_work = jnp.minimum(next_work, jnp.int32(2 ** 30))
                item = jnp.where(cont, item,
                                 jnp.where(takes, new_item, total))
                no, nd, nrid = make_rays(jnp.where(takes, new_item, 0))
                o = jnp.where(cont[:, None], point,
                              jnp.where(takes[:, None], no, o))
                d = jnp.where(cont[:, None], new_dir,
                              jnp.where(takes[:, None], nd, d))
                throughput = jnp.where(
                    cont[:, None], throughput * atten,
                    jnp.where(takes[:, None],
                              jnp.ones_like(throughput), throughput))
                ray_id = jnp.where(cont, ray_id,
                                   jnp.where(takes, nrid, ray_id))
                bounce = jnp.where(cont, b + 1, 0)
            else:
                o = jnp.where(cont[:, None], point, o)
                d = jnp.where(cont[:, None], new_dir, d)
                throughput = jnp.where(cont[:, None],
                                       throughput * atten, throughput)
                bounce = jnp.where(cont, b + 1, 0)
                item = jnp.where(cont, item, (item + pool) % total)

            return (item, bounce, o, d, throughput, ray_id, next_work,
                    packed)
        return step

    o0, d0, rid0 = jax.jit(make_rays)(jnp.arange(pool, dtype=jnp.int32))
    state0 = (jnp.arange(pool, dtype=jnp.int32),
              jnp.zeros((pool,), jnp.int32), o0, d0,
              jnp.ones_like(o0), rid0, jnp.int32(pool),
              jnp.zeros((npix, 4), jnp.float32))

    def timed(name, step):
        def fn(state):
            return jax.lax.fori_loop(0, K, lambda i, s: step(s), state)
        f = jax.jit(fn)
        jax.block_until_ready(f(state0))
        t0 = time.time()
        jax.block_until_ready(f(state0))
        dt = (time.time() - t0) / K
        print(f"{name:36s} {dt*1e3:7.3f} ms/step", flush=True)

    timed("full", build_step())
    timed("no scatter", build_step(do_scatter=False))
    timed("no regen", build_step(do_regen=False))
    timed("no shade", build_step(do_shade=False))
    timed("no background", build_step(do_bg=False))
    timed("no isect/shade", build_step(do_isect=False, do_shade=False))
    timed("isect only (+min merge)",
          build_step(do_shade=False, do_scatter=False, do_regen=False,
                     do_bg=False))
    print("ABLATE_OK", flush=True)


if __name__ == "__main__":
    main()
