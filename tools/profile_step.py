"""Per-stage timing of the persistent-integrator step (RTIOW 1080p).

Times K chained iterations of each stage combination on the real TPU,
so the per-step cost decomposes into intersect / shade / scatter-add /
regen(make_rays) — the breakdown VERDICT round-1 asked to persist.

  python tools/profile_step.py [pool_log2]
"""
import sys
import time

import numpy as np

K = 64


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.integrator.wavefront import T_MIN
    from mrt.integrator import persistent as P

    pool = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 17)
    W, H, DEPTH = 1920, 1080, 50
    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()
    npix = W * H

    total, make_rays, step = P._build(
        scene, camera, W, H, 1, 0, 8, DEPTH, pool, 0, None, 1, None)

    o0, d0, rid0 = jax.jit(make_rays)(jnp.arange(pool, dtype=jnp.int32))
    packed0 = jnp.zeros((npix, 4), jnp.float32)

    def timed(name, fn, *args):
        r = jax.block_until_ready(jax.jit(fn)(*args))   # compile
        t0 = time.time()
        r = jax.block_until_ready(jax.jit(fn)(*args))
        dt = (time.time() - t0) / K
        print(f"{name:28s} {dt*1e3:7.3f} ms/step "
              f"({dt*1e9/pool:6.1f} ns/ray)", flush=True)
        return r

    # --- full step (the ground truth) ---------------------------------
    def full(state):
        def body(i, st):
            return step(st)
        st = jax.lax.fori_loop(0, K, body, state)
        return st[7]

    state0 = P._init_state(make_rays, pool, packed0[:, :3],
                           jnp.zeros((npix,), jnp.int32),
                           jnp.float32(0), jnp.int32(0))
    timed("full step", full, state0)

    # --- intersect only (chained) -------------------------------------
    def isect(o, d, rid):
        def body(b, carry):
            o, d = carry
            s = Sampler(1, rid, salt=3 * b + 2)
            h = scene.intersect(o, d, t_min=T_MIN, sampler=s)
            o2 = jnp.where(h.hit[:, None], h.point, o)
            d2 = jnp.where(h.hit[:, None], -d, d)
            return o2, d2
        return jax.lax.fori_loop(0, K, body, (o, d))

    timed("intersect", isect, o0, d0, rid0)

    # --- intersect + shade --------------------------------------------
    def isect_shade(o, d, rid):
        def body(b, carry):
            o, d = carry
            s = Sampler(1, rid, salt=3 * b + 2)
            h = scene.intersect(o, d, t_min=T_MIN, sampler=s)
            em = Sampler(1, rid, salt=3 * b)
            sc = Sampler(1, rid, salt=3 * b + 1)
            emitted, atten, nd, scat, lobe = shade.shade_hit(
                scene, h, d, em, sc)
            o2 = jnp.where(h.hit[:, None], h.point, o)
            d2 = jnp.where(scat[:, None], nd, d)
            return o2, d2
        return jax.lax.fori_loop(0, K, body, (o, d))

    timed("intersect+shade", isect_shade, o0, d0, rid0)

    # --- scatter-add only ---------------------------------------------
    def scat_only(packed, rid):
        def body(b, carry):
            packed, v = carry
            pixel = (rid + jnp.uint32(b)).astype(jnp.int32) % npix
            add = jnp.stack([v, v, v, v], axis=-1)
            packed = packed.at[pixel].add(add)
            return packed, v + 1.0
        return jax.lax.fori_loop(
            0, K, body, (packed, jnp.zeros((pool,), jnp.float32)))

    timed("scatter-add", scat_only, packed0, rid0)

    # --- make_rays (regen) only ---------------------------------------
    def regen_only(item):
        def body(b, it):
            o, d, rid = make_rays(it)
            return it + jnp.round(o[:, 0] * 0 + 1).astype(jnp.int32)
        return jax.lax.fori_loop(0, K, body, item)

    timed("make_rays", regen_only, jnp.arange(pool, dtype=jnp.int32))

    # --- background eval ----------------------------------------------
    def bg_only(d):
        def body(b, carry):
            d, acc = carry
            c = scene.background_eval(d)
            return d * (1.0 + 1e-9), acc + c
        return jax.lax.fori_loop(
            0, K, body, (d, jnp.zeros((pool, 3), jnp.float32)))

    timed("background", bg_only, d0)

    print("PROFILE_OK", flush=True)


if __name__ == "__main__":
    main()
