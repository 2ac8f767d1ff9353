"""EVE shade cost, UNconfounded: freeze a realistic hit wavefront and
time shade_hit (and its sub-blocks) in isolation.

profile_eve.py's ablations feed the faked scatter directions back into
the next step's intersect, so every number mixes shading cost with the
changed ray coherence (its 'noshade' came out CHEAPER than bare
intersect).  Here the hit set is fixed: run a few real bounces untimed
to get a realistic mid-path wavefront, intersect once, then time each
shade variant over the same hits with only the sampler salt varying.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K = 32
POOL = 1 << 16


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes import get
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.integrator.wavefront import T_MIN

    W, H = 480, 270
    scene, camera = get("eve")().generate()
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

    @jax.jit
    def bounce(o2, d2, i):
        vs = Sampler(seed, rid + i, salt=2)
        hits = scene.intersect(o2, d2, t_min=T_MIN, sampler=vs)
        em = Sampler(seed, rid, salt=3 * i)
        sc = Sampler(seed, rid, salt=3 * i + 1)
        _, _, new_dir, scattered, _ = shade.shade_hit(
            scene, hits, d2, em, sc)
        live = hits.hit & scattered
        o3 = jnp.where(live[:, None], hits.point, o2)
        d3 = jnp.where(live[:, None], new_dir, d2)
        return o3, d3

    for i in range(3):   # realistic mid-path decorrelated wavefront
        o, d = bounce(o, d, jnp.uint32(i))
    o, d = jax.block_until_ready((o, d))

    @jax.jit
    def isect(o, d, i):
        vs = Sampler(seed, rid + i, salt=2)
        hits = scene.intersect(o, d, t_min=T_MIN, sampler=vs)
        return hits

    hits = jax.block_until_ready(isect(o, d, jnp.uint32(3)))

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args, jnp.uint32(0)))
        t0 = time.time()
        for i in range(K):
            out = f(*args, jnp.uint32(i))
        jax.block_until_ready(out)
        dt = (time.time() - t0) / K * 1e3
        print(f"{name:22s} {dt:8.3f} ms", flush=True)
        return dt

    import mrt.textures.atlas as atlas_mod
    import mrt.materials.shade as shade_mod

    def consume(*xs):
        return sum(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:4])
                   for x in xs)

    # -- whole components, frozen hits --------------------------------
    timeit("intersect", lambda o, d, i: isect(o, d, i).t, o, d)
    timeit("intersect_noaux",
           lambda o, d, i: scene._intersect_once(
               o, d, T_MIN, jnp.inf, Sampler(seed, rid + i, salt=2),
               shading_aux=False).t, o, d)

    def shade_full(hits, d, i):
        em = Sampler(seed, rid, salt=3 * i)
        sc = Sampler(seed, rid, salt=3 * i + 1)
        return consume(*shade.shade_hit(scene, hits, d, em, sc))

    timeit("shade_hit", shade_full, hits, d)

    def emit_only(hits, d, i):
        from mrt.ops.rowlookup import take_rows_with_int
        params, mtype = take_rows_with_int(
            scene.materials.params, scene.materials.mtype, hits.material)
        return consume(shade_mod._emitted_from(
            scene, hits.material, mtype, params[:, 6:9], hits))

    timeit("rowlk+emitted", emit_only, hits, d)

    def scatter_only(hits, d, i):
        from mrt.ops.rowlookup import take_rows_with_int
        params, mtype = take_rows_with_int(
            scene.materials.params, scene.materials.mtype, hits.material)
        sc = Sampler(seed, rid, salt=3 * i + 1)
        return consume(*shade_mod._scatter_from(
            scene, hits.material, mtype, params, hits, d, sc))

    timeit("rowlk+scatter", scatter_only, hits, d)

    def eve_only(hits, d, i):
        return consume(*shade_mod.eve_surface(scene, hits.material,
                                              hits.uv))

    timeit("eve_surface x1", eve_only, hits, d)

    def atlas_one(hits, d, i):
        m = shade_mod._rows_of(scene.materials, hits.material)
        tex = shade_mod._icol(m, 8)  # any column; value unused below
        return consume(scene.atlas.sample(
            jnp.maximum(hits.material % scene.atlas.count, 0), hits.uv))

    timeit("atlas.sample x1", atlas_one, hits, d)

    # -- scatter with pieces faked (frozen hits: no feedback) ---------
    real_sample = atlas_mod.TextureAtlas.sample
    real_eve = shade_mod.eve_surface

    def fake_sample(self, ids, uv):
        return jnp.stack([uv[..., 0], uv[..., 1],
                          ids.astype(jnp.float32) * 1e-3,
                          jnp.ones_like(uv[..., 0])], axis=-1)

    def fake_eve(scene, rows, uv):
        c = jnp.stack([uv[..., 0], uv[..., 1], uv[..., 0]], -1)
        return c, uv[..., 0], c * 0.1

    atlas_mod.TextureAtlas.sample = fake_sample
    timeit("shade_hit notex", shade_full, hits, d)
    atlas_mod.TextureAtlas.sample = real_sample
    shade_mod.eve_surface = fake_eve
    timeit("shade_hit noeve", shade_full, hits, d)
    shade_mod.eve_surface = real_eve
    print("OK", flush=True)


if __name__ == "__main__":
    main()
