"""Where does shade's ~3.5ms/step go?  Ablate inside the real step
(pool=2^17, rtiow, per-lane acc so no scatter noise):

  full      : real shade_hit                     (expect ~6.4 total)
  nogather  : mtype/params gathers replaced by broadcast-with-dep
              (isolates the two table gathers)
  onehot    : gathers via one-hot bf16 matmul over the 488-row table
              (MXU replacement candidate)
  nomath    : gathers kept, scatter math replaced by trivial ops
              (isolates the VPU vector math)
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
    from mrt.materials import table as T
    from mrt.integrator.wavefront import T_MIN

    W, H, DEPTH = 1920, 1080, 50
    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()
    npix = W * H
    seed = 1
    total = npix * 8
    materials = scene.materials
    nrows = int(materials.mtype.shape[0])
    print("table rows:", nrows, flush=True)

    # One-hot matmul table: params (nrows, 10) + mtype column.
    params_tab = jnp.concatenate(
        [materials.params,
         materials.mtype.astype(jnp.float32)[:, None]], axis=-1)
    params_tab_bf = params_tab.astype(jnp.bfloat16)

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

    def shade_variant(mode, hits, d, em, sc):
        if mode == "full":
            return shade.shade_hit(scene, hits, d, em, sc)
        rows = hits.material
        if mode == "nogather":
            em.skip(T.MAX_MIX_DEPTH)
            sc.skip(T.MAX_MIX_DEPTH)
            mtype = (rows & 7).astype(jnp.int32)
            params = (materials.params[0][None, :]
                      + rows.astype(jnp.float32)[:, None] * 1e-30)
            e = shade._emitted_from(scene, rows, mtype, params[:, 6:9],
                                    hits)
            return (e,) + shade._scatter_from(scene, rows, mtype, params,
                                              hits, d, sc)
        if mode == "onehot":
            em.skip(T.MAX_MIX_DEPTH)
            sc.skip(T.MAX_MIX_DEPTH)
            onehot = (rows[:, None] == jnp.arange(nrows)[None, :]
                      ).astype(jnp.bfloat16)
            fused = jnp.dot(onehot, params_tab_bf,
                            preferred_element_type=jnp.float32)
            params = fused[:, :10]
            mtype = jnp.round(fused[:, 10]).astype(jnp.int32)
            e = shade._emitted_from(scene, rows, mtype, params[:, 6:9],
                                    hits)
            return (e,) + shade._scatter_from(scene, rows, mtype, params,
                                              hits, d, sc)
        if mode == "nomath":
            em.skip(T.MAX_MIX_DEPTH)
            sc.skip(T.MAX_MIX_DEPTH)
            mtype = materials.mtype[rows]
            params = materials.params[rows]
            # consume the same sampler draws
            u1, u2, u3, u4 = sc.next4()
            e = params[:, 6:9] * (mtype == T.DIFFUSE_LIGHT)[:, None]
            atten = params[:, :3] + u1[:, None] * 1e-30
            new_dir = hits.normal + jnp.stack([u2, u3, u4], -1) * 1e-30
            scattered = hits.hit & (mtype != T.DIFFUSE_LIGHT)
            lobe = jnp.zeros_like(rows)
            return e, atten, new_dir, scattered, lobe
        raise ValueError(mode)

    def build_step(mode):
        def step(i, state):
            (item, bounce, o, d, throughput, ray_id, next_work,
             acc) = state
            active = item < total
            b = bounce
            vs = Sampler(seed, ray_id, salt=3 * b + 2)
            hits = scene.intersect(o, d, t_min=T_MIN, sampler=vs)
            em = Sampler(seed, ray_id, salt=3 * b)
            sc = Sampler(seed, ray_id, salt=3 * b + 1)
            emitted, atten, new_dir, scattered, lobe = shade_variant(
                mode, hits, d, em, sc)
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
            acc = acc + upd

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
                    acc)
        return step

    pool = POOL
    o0, d0, rid0 = jax.jit(make_rays)(jnp.arange(pool, dtype=jnp.int32))

    for mode in ("full", "nogather", "onehot", "nomath"):
        acc0 = jnp.zeros((pool, 4), jnp.float32)
        state0 = (jnp.arange(pool, dtype=jnp.int32),
                  jnp.zeros((pool,), jnp.int32), o0, d0,
                  jnp.ones_like(o0), rid0, jnp.int32(pool), acc0)
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
