"""Exact decomposition of the RTIOW persistent step at pool 2^16.

profile_misc showed regen/cumsum/bg/rng are each ~free; this ablates
the three known blocks and the residual:

  full       : anchor (real-shaped step, dest 2^18, scatter every step)
  noisect    : scene.intersect replaced by synthetic fixed hits
  noshade    : shade_hit replaced by constant atten/dir
  noscatter  : dest update removed
  bare       : all three removed (pure bookkeeping floor)
"""
import time

import numpy as np

K = 64
POOL = 1 << 16
DEST = 1 << 18


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.geometry.hit import Hits
    from mrt.integrator.wavefront import T_MIN

    W, H, DEPTH = 1920, 1080, 50
    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()
    npix = W * H
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

    def fake_hits(o, d, rid):
        n = o.shape[0]
        coin = (rid & 3) != 0  # ~75% "hit", data-dependent-ish
        t = jnp.abs(jnp.sum(d, -1)) * 0.3 + 0.5
        point = o + d * t[:, None]
        normal = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
        return Hits(hit=coin, t=t, point=point, normal=normal,
                    front_face=coin,
                    material=(rid % 480).astype(jnp.int32),
                    uv=jnp.zeros((n, 2)),
                    tangent=jnp.zeros((n, 3)),
                    bitangent=jnp.zeros((n, 3)),
                    prim_area=jnp.zeros((n,)))

    def build_step(mode):
        no_isect = mode in ("noisect", "bare")
        no_shade = mode in ("noshade", "bare")
        no_scat = mode in ("noscatter", "bare")

        def step(i, state):
            (item, bounce, o, d, throughput, ray_id, next_work,
             films) = state
            active = item < total
            pixel = jnp.clip(item, 0, total - 1) % npix
            b = bounce
            if no_isect:
                hits = fake_hits(o, d, ray_id)
            else:
                vs = Sampler(seed, ray_id, salt=3 * b + 2)
                hits = scene.intersect(o, d, t_min=T_MIN, sampler=vs)
            if no_shade:
                emitted = jnp.zeros_like(o)
                atten = throughput * 0.9
                new_dir = -d
                scattered = (ray_id & 7) != 0
            else:
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
            if not no_scat:
                upd = jnp.concatenate(
                    [radiance_add, scat.astype(jnp.float32)[:, None]],
                    axis=-1)
                films = films.at[pixel % DEST].add(upd)
            else:
                films = films + jnp.sum(radiance_add) * 1e-30

            claim = (active & ~cont) | ~active
            offsets = jnp.cumsum(claim.astype(jnp.int32)) - 1
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

    pool = POOL
    o0, d0, rid0 = jax.jit(make_rays)(jnp.arange(pool, dtype=jnp.int32))

    for mode in ("full", "noisect", "noshade", "noscatter", "bare"):
        films0 = jnp.zeros((DEST, 4), jnp.float32)
        state0 = (jnp.arange(pool, dtype=jnp.int32),
                  jnp.zeros((pool,), jnp.int32), o0, d0,
                  jnp.ones_like(o0), rid0, jnp.int32(pool), films0)
        step = build_step(mode)

        def fn(state):
            return jax.lax.fori_loop(0, K, step, state)
        f = jax.jit(fn)
        jax.block_until_ready(f(state0))
        t0 = time.time()
        jax.block_until_ready(f(state0))
        dt = (time.time() - t0) / K
        print(f"{mode:10s} {dt*1e3:7.3f} ms/step", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
