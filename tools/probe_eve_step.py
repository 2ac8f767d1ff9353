"""Eve full-production-step decomposition on the real TPU.

profile_eve2 timed intersect (12.5 ms) and shade (2.5 ms) on a frozen
mid-path wavefront, but never the FULL production step — zoo timings
imply ~25-30 ms/step, so up to half the step may be bookkeeping
(sort, claims/regen, film, background) rather than traversal.

Method: run the production chunk driver to a steady mid-render state,
time _chunk_run for a known step count (true production ms/step, with
donation and sorting exactly as shipped), then time isolated
intersect / shade on that very state's live wavefront.

Usage: python tools/probe_eve_step.py [scene] (default eve)
Writes artifacts/step_<scene>_r05.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

W, H, SPP, DEPTH = 480, 270, 1024, 16
POOL = 1 << 16


def main():
    import jax
    import jax.numpy as jnp

    name = sys.argv[1] if len(sys.argv) > 1 else "eve"
    print("devices:", jax.devices(), "scene:", name, flush=True)

    from mrt.scenes import get
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.integrator import persistent as P
    from mrt.integrator.wavefront import T_MIN

    scene, camera = get(name)().generate()
    sort = int(scene.prefers_sorted_rays())
    print("sort_rays:", sort, flush=True)
    npix = W * H
    statics = dict(width=W, height=H, max_depth=DEPTH, pool=POOL,
                   rr_depth=None, slots=None, sort_rays=sort,
                   pend=False)
    state, film = P._chunk_init(
        scene, camera, jnp.zeros((npix, 3)),
        jnp.zeros((npix,), jnp.int32), 1, 0, SPP, **statics)
    # Advance to a steady mid-render state (a few hundred steps).
    state, film, more = P._chunk_run(scene, camera, state, film, 1, 0,
                                     SPP, jnp.int32(128), **statics)
    jax.block_until_ready(film)
    assert bool(more), "workload finished during warm-up; raise SPP"

    # --- true production ms/step -------------------------------------
    reps, steps = 3, 128
    times = []
    st, fl = state, film
    for _ in range(reps):
        t0 = time.time()
        st, fl, more = P._chunk_run(scene, camera, st, fl, 1, 0, SPP,
                                    jnp.int32(steps), **statics)
        jax.block_until_ready(fl)
        times.append((time.time() - t0) / steps * 1e3)
    assert bool(more), "queue drained during timing; raise SPP"
    step_ms = min(times)
    print(f"production step: {step_ms:.3f} ms "
          f"(runs {['%.2f' % t for t in times]})", flush=True)

    # --- isolated blocks on the same live wavefront ------------------
    o, d = state[2], state[3]
    rid = state[5]

    def timeit(label, fn):
        f = jax.jit(fn)
        jax.block_until_ready(f(jnp.uint32(0)))
        t0 = time.time()
        out = None
        for i in range(32):
            out = f(jnp.uint32(i))
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 32 * 1e3
        print(f"{label:18s} {dt:8.3f} ms", flush=True)
        return dt

    def isect(i):
        vs = Sampler(1, rid + i, salt=2)
        return scene.intersect(o, d, t_min=T_MIN, sampler=vs).t

    hits_fn = jax.jit(lambda i: scene.intersect(
        o, d, t_min=T_MIN, sampler=Sampler(1, rid + i, salt=2)))
    hits = jax.block_until_ready(hits_fn(jnp.uint32(0)))

    def shade_blk(i):
        em = Sampler(1, rid, salt=3 * i)
        sc = Sampler(1, rid, salt=3 * i + 1)
        parts = shade.shade_hit(scene, hits, d, em, sc)
        return sum(jnp.sum(jnp.asarray(p, jnp.float32).ravel()[:4])
                   for p in parts)

    def background(i):
        return jnp.sum(scene.background_eval(d)
                       * (1.0 + 0.0 * jnp.float32(i)))

    t_isect = timeit("intersect", isect)
    t_shade = timeit("shade_hit", shade_blk)
    t_bg = timeit("background_eval", background)

    # Sub-blocks: one raw atlas texel gather, one eve_surface decode.
    if scene.atlas is not None:
        ids0 = jnp.zeros((o.shape[0],), jnp.int32)

        def one_sample(i):
            return jnp.sum(scene.atlas.sample(
                ids0 + (i % 2).astype(jnp.int32), hits.uv))

        timeit("atlas.sample x1", one_sample)

        def eve_surf(i):
            c, r, g = shade.eve_surface(
                scene, hits.material + 0 * i.astype(jnp.int32),
                hits.uv)
            return jnp.sum(c) + jnp.sum(r) + jnp.sum(g)

        timeit("eve_surface x1", eve_surf)

    out = {
        "scene": name,
        "shape": f"{W}x{H} spp{SPP} d{DEPTH} pool 2^16 sort={sort}",
        "production_step_ms": round(step_ms, 3),
        "intersect_ms": round(t_isect, 3),
        "shade_ms": round(t_shade, 3),
        "background_ms": round(t_bg, 3),
        "other_ms": round(step_ms - t_isect - t_shade, 3),
    }
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", f"step_{name}_r05.json")
    prev = {}
    if os.path.exists(art):
        with open(art) as f:
            prev = json.load(f)
    prev[name] = out
    with open(art, "w") as f:
        json.dump(prev, f, indent=1)
    print("wrote", art, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
