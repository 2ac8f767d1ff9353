"""Scatter variants inside the REAL persistent step (isolated scatter
microbenches are fast; the 5.2ms cost only appears in the full graph).

Variants:
  base    : packed (npix,4), one width-4 scatter  (current code)
  split4  : four width-1 scatters into four (npix,) carries
  chan2   : two (npix,) carries? no -- r,g,b,depth separate = split4
  transp  : packed (4,npix), scatter columns
  wide8   : packed (npix,8), width-8 updates
  bcast   : width-4 scatter whose update row is a broadcast scalar
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

    def build_step(variant):
        def step(state):
            (item, bounce, o, d, throughput, ray_id, next_work,
             films) = state
            active = item < total
            pixel = jnp.clip(item, 0, total - 1) % npix
            b = bounce
            vs = Sampler(seed, ray_id, salt=3 * b + 2)
            hits = scene.intersect(o, d, t_min=T_MIN, sampler=vs)
            em = Sampler(seed, ray_id, salt=3 * b)
            sc = Sampler(seed, ray_id, salt=3 * b + 1)
            emitted, atten, new_dir, scattered, lobe = \
                shade.shade_hit(scene, hits, d, em, sc)
            background = scene.background_eval(d)
            hit = hits.hit & active
            miss = ~hits.hit & active
            radiance_add = (jnp.where(miss[:, None], background, 0.0)
                            + jnp.where(hit[:, None], emitted, 0.0))
            radiance_add = jnp.where(active[:, None],
                                     throughput * radiance_add, 0.0)
            scat = hit & scattered
            cont = scat & (b + 1 < DEPTH)
            scat_f = scat.astype(jnp.float32)

            if variant == "base":
                films = films.at[pixel].add(jnp.concatenate(
                    [radiance_add, scat_f[:, None]], axis=-1))
            elif variant == "split4":
                f0, f1, f2, f3 = films
                f0 = f0.at[pixel].add(radiance_add[:, 0])
                f1 = f1.at[pixel].add(radiance_add[:, 1])
                f2 = f2.at[pixel].add(radiance_add[:, 2])
                f3 = f3.at[pixel].add(scat_f)
                films = (f0, f1, f2, f3)
            elif variant == "transp":
                upd = jnp.concatenate(
                    [radiance_add.T, scat_f[None]], axis=0)
                films = films.at[:, pixel].add(upd)
            elif variant == "wide8":
                upd = jnp.concatenate(
                    [radiance_add, scat_f[:, None],
                     jnp.zeros((pool, 4), jnp.float32)], axis=-1)
                films = films.at[pixel].add(upd)
            elif variant == "bcast":
                films = films.at[pixel].add(
                    radiance_add[:, 0:1] * jnp.ones((1, 4)))

            offsets = jnp.cumsum((active & ~cont | ~active)
                                 .astype(jnp.int32)) - 1
            claim = (active & ~cont) | ~active
            new_item = next_work + offsets
            takes = claim & (new_item < total)
            next_work = jnp.minimum(
                next_work + jnp.sum(claim.astype(jnp.int32)),
                jnp.int32(2 ** 30))
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
            ray_id = jnp.where(cont, ray_id, jnp.where(takes, nrid,
                                                       ray_id))
            bounce = jnp.where(cont, b + 1, 0)
            return (item, bounce, o, d, throughput, ray_id, next_work,
                    films)
        return step

    o0, d0, rid0 = jax.jit(make_rays)(jnp.arange(pool, dtype=jnp.int32))

    def films_for(variant):
        if variant == "split4":
            return tuple(jnp.zeros((npix,), jnp.float32)
                         for _ in range(4))
        if variant == "transp":
            return jnp.zeros((4, npix), jnp.float32)
        if variant == "wide8":
            return jnp.zeros((npix, 8), jnp.float32)
        return jnp.zeros((npix, 4), jnp.float32)

    for variant in ("base", "split4", "transp", "wide8", "bcast"):
        state0 = (jnp.arange(pool, dtype=jnp.int32),
                  jnp.zeros((pool,), jnp.int32), o0, d0,
                  jnp.ones_like(o0), rid0, jnp.int32(pool),
                  films_for(variant))
        step = build_step(variant)

        def fn(state):
            return jax.lax.fori_loop(0, K, lambda i, s: step(s), state)
        f = jax.jit(fn)
        jax.block_until_ready(f(state0))
        t0 = time.time()
        jax.block_until_ready(f(state0))
        dt = (time.time() - t0) / K
        print(f"{variant:10s} {dt*1e3:7.3f} ms/step", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
