"""Film-accumulator design experiments in the REAL step context.

Known (profile_pool/profile_scatter4, pool=2^17):
  - per-lane elementwise acc (no scatter): 6.37 ms/step  (compute floor)
  - scatter into 2^17-row dest: ~8.2  (+1.8 floor for any in-graph scatter)
  - scatter into 2^19-row dest: ~11.6 (+5.2: the big-dest cliff)

Unknowns this measures:
  - where between 2^18 (4MB) and 2^19 (8MB) rows the cliff sits
    (the claim window wants ~288k rows = 4.6MB)
  - whether a lax.cond-skipped scatter is free on the 7/8 steps that
    don't flush (amortization: per-lane acc + scatter every 8th step)
  - how scatter cost scales with index count (524k vs 131k indices)
"""
import time

import numpy as np

K = 32
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

    def build_step(pool, dest_rows, mode):
        """mode: 'every' = scatter each step into dest;
        'acc' = per-lane += only (floor);
        'amort' = per-lane += each step, cond-scatter every 8th;
        'amort4x' = like amort but scatter 4x-stacked indices."""
        def step(i, state):
            (item, bounce, o, d, throughput, ray_id, next_work,
             films, acc) = state
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
            upd = jnp.concatenate(
                [radiance_add, scat.astype(jnp.float32)[:, None]],
                axis=-1)
            slot = pixel % dest_rows
            if mode == "every":
                films = films.at[slot].add(upd)
            else:
                acc = acc + upd
                if mode in ("amort", "amort4x"):
                    def do(args):
                        films, acc = args
                        if mode == "amort4x":
                            films = films.at[
                                jnp.concatenate([slot] * 4)].add(
                                jnp.concatenate([acc] * 4) * 0.25)
                        else:
                            films = films.at[slot].add(acc)
                        return films, jnp.zeros_like(acc)
                    films, acc = jax.lax.cond(
                        (i & 7) == 7, do, lambda a: a, (films, acc))

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
                    films, acc)
        return step

    pool = POOL
    o0, d0, rid0 = jax.jit(make_rays)(jnp.arange(pool, dtype=jnp.int32))

    cases = [
        ("acc floor      (no scatter)", pool, "acc"),
        ("dest 2^17 rows (2.1MB) every", 1 << 17, "every"),
        ("dest 2^18 rows (4.2MB) every", 1 << 18, "every"),
        ("dest 288k rows (4.7MB) every", 294912, "every"),
        ("dest 320k rows (5.2MB) every", 327680, "every"),
        ("dest 384k rows (6.3MB) every", 393216, "every"),
        ("dest 2^19 rows (8.4MB) every", 1 << 19, "every"),
        ("dest 2^18 amortized cond 1/8", 1 << 18, "amort"),
        ("dest 2^18 amort 4x indices  ", 1 << 18, "amort4x"),
        ("dest 384k amortized cond 1/8", 393216, "amort"),
    ]
    for name, rows, mode in cases:
        films0 = jnp.zeros((rows, 4), jnp.float32)
        acc0 = jnp.zeros((pool, 4), jnp.float32)
        state0 = (jnp.arange(pool, dtype=jnp.int32),
                  jnp.zeros((pool,), jnp.int32), o0, d0,
                  jnp.ones_like(o0), rid0, jnp.int32(pool), films0, acc0)
        step = build_step(pool, rows, mode)

        def fn(state):
            return jax.lax.fori_loop(0, K, step, state)
        f = jax.jit(fn)
        jax.block_until_ready(f(state0))
        t0 = time.time()
        jax.block_until_ready(f(state0))
        dt = (time.time() - t0) / K
        print(f"{name}  {dt*1e3:7.3f} ms/step", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
