"""Decompose the EVE-scene persistent step: traversal vs atlas/shading
vs alpha re-cast rounds.

  full       : real step (intersect incl. alpha rounds + EVE shade)
  noalpha    : intersect without the alpha re-cast rounds
  notex      : atlas.sample monkeypatched to a constant (counts the
               texel-gather share of shade)
  isect_only : bare intersect (with alpha rounds), t consumed
"""
import time

K = 16
POOL = 1 << 16


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.integrator.wavefront import T_MIN

    W, H, DEPTH = 480, 270, 16
    scene, camera = get("eve")().generate()
    print("needs_alpha:", scene.needs_alpha,
          "atlas texels:", scene.atlas.data.shape if scene.atlas else None,
          "rows:", scene.atlas.count if scene.atlas else 0, flush=True)
    npix = W * H
    seed = 1

    n = POOL
    pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(npix)
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    cam = Sampler(seed, pix, salt=0xC0FFEE)
    jx, jy, du, dv = cam.next4()
    o, d = camera.rays((px + jx) / W, (py + jy) / H, du, dv)
    rid = pix

    def step(mode):
        def fn(i, carry):
            acc, o2, d2 = carry
            vs = Sampler(seed, rid + i.astype(jnp.uint32), salt=2)
            if mode == "noalpha":
                hits = scene._intersect_once(o2, d2, T_MIN, jnp.inf, vs)
            else:
                hits = scene.intersect(o2, d2, t_min=T_MIN, sampler=vs)
            if mode == "isect_only":
                return (acc + hits.t * 0.0 + hits.hit, o2, d2)
            if mode == "isect_expand":
                return (acc + hits.point[:, 0] + hits.normal[:, 0]
                        + hits.material + hits.uv[:, 0]
                        + hits.tangent[:, 0] + hits.front_face,
                        o2, d2)
            em = Sampler(seed, rid, salt=3 * i)
            sc = Sampler(seed, rid, salt=3 * i + 1)
            emitted, atten, new_dir, scattered, lobe = shade.shade_hit(
                scene, hits, d2, em, sc)
            live = hits.hit & scattered
            o3 = jnp.where(live[:, None], hits.point, o2)
            d3 = jnp.where(live[:, None], new_dir, d2)
            return (acc + emitted[:, 0] + atten[:, 0], o3, d3)
        return fn

    import mrt.textures.atlas as atlas_mod
    import mrt.materials.shade as shade_mod
    import mrt.ops.rowlookup as rowlk_mod
    real_sample = atlas_mod.TextureAtlas.sample
    real_eve = shade_mod.eve_surface
    real_nm = shade_mod.apply_normal_maps
    real_em = shade_mod._emitted_from
    real_scatter = shade_mod._scatter_from
    real_shade_hit = shade_mod.shade_hit
    real_rowlk = rowlk_mod.take_rows_with_int

    def fake_sample(self, ids, uv):
        return jnp.stack([uv[..., 0], uv[..., 1],
                          ids.astype(jnp.float32) * 1e-3,
                          jnp.ones_like(uv[..., 0])], axis=-1)

    def fake_eve(scene, rows, uv):
        n = rows.shape[0]
        c = jnp.stack([uv[..., 0], uv[..., 1], uv[..., 0]], -1)
        return c, uv[..., 0], c * 0.1

    def fake_nm(scene, hits, d_in):
        return hits

    def fake_em(scene, rows, mtype, emit_rgb, hits):
        return jnp.where(hits.hit[:, None], emit_rgb, 0.0)

    def fake_scatter(scene, rows, mtype, params, hits, d_in, sampler):
        one = jnp.ones(hits.normal.shape, jnp.float32)
        return (one, hits.normal, hits.hit,
                jnp.zeros(rows.shape, jnp.int32))

    def fake_shade_hit(scene, hits, d_in, em, sc):
        one = jnp.ones(hits.normal.shape, jnp.float32)
        return (one * 0.0, one, hits.normal, hits.hit,
                jnp.zeros(hits.t.shape, jnp.int32))

    def fake_rowlk(params, mtype, rows):
        n = rows.shape[0]
        return (jnp.broadcast_to(params[0], (n,) + params.shape[1:]),
                jnp.broadcast_to(mtype[0], (n,)))

    for mode in ("full", "noeve", "notex", "nonm", "noemit",
                 "noscatter", "noshade", "norowlk",
                 "isect_expand", "isect_only"):
        atlas_mod.TextureAtlas.sample = (
            fake_sample if mode == "notex" else real_sample)
        shade_mod.eve_surface = (
            fake_eve if mode == "noeve" else real_eve)
        shade_mod.apply_normal_maps = (
            fake_nm if mode == "nonm" else real_nm)
        shade_mod._emitted_from = (
            fake_em if mode == "noemit" else real_em)
        shade_mod._scatter_from = (
            fake_scatter if mode == "noscatter" else real_scatter)
        shade_mod.shade_hit = (
            fake_shade_hit if mode == "noshade" else real_shade_hit)
        rowlk_mod.take_rows_with_int = (
            fake_rowlk if mode == "norowlk" else real_rowlk)
        f = jax.jit(lambda o, d: jax.lax.fori_loop(
            0, K, step(mode), (jnp.zeros((n,)), o, d))[0])
        jax.block_until_ready(f(o, d))
        t0 = time.time()
        jax.block_until_ready(f(o, d))
        dt = (time.time() - t0) / K
        print(f"{mode:10s} {dt*1e3:8.3f} ms/step", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
