"""Reproduce + localise the eve NaN pixel (CLAUDE "Known issues").

Observed once on TPU: render(eve, 960x540, spp=16, d32, seed=1,
persistent=True) -> exactly one NaN pixel, index 135890 = (530, 141).
The CPU replay of the SAME RNG streams (single-pixel persistent
render, 512 samples) is NaN-free, so the suspicion is TPU-specific
numerics, not the reference-faithful-quirk hypothesis.

Stages (one process):
  1. single-pixel spp16 d32 render on the device -> NaN?
  2. per-sample bisect (same compiled program; samples/sample_start
     are traced).
  3. host-stepped bounce replay of the guilty sample dumping each
     bounce's state; prints the first non-finite field.

    python tools/probe_nan_pixel.py [pixel] [spp]
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

PIXEL = int(sys.argv[1]) if len(sys.argv) > 1 else 135890
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
W = int(sys.argv[3]) if len(sys.argv) > 3 else 960
H = int(sys.argv[4]) if len(sys.argv) > 4 else 540
DEPTH = int(sys.argv[5]) if len(sys.argv) > 5 else 32
KNOWN_SAMPLE = int(sys.argv[6]) if len(sys.argv) > 6 else -1
SEED = 1


def main():
    import jax
    import jax.numpy as jnp
    from mrt.scenes import get
    from mrt.integrator.persistent import render_samples_persistent
    from mrt.integrator import wavefront
    from mrt.math.rng import Sampler

    scene, camera = get("eve")(aspect_ratio=W / H).generate()

    @jax.jit
    def one_px(start, n, pixel):
        # pixel_offset is traced -> one compiled program serves every
        # probed pixel.
        return render_samples_persistent(
            scene, camera, W, H, SEED, start, n, max_depth=DEPTH,
            pool=1024, pixel_offset=pixel, n_pixels=1)

    def one(start, n):
        return one_px(start, n, jnp.uint32(PIXEL))

    global PIXEL
    if KNOWN_SAMPLE >= 0:
        return replay(scene, camera, KNOWN_SAMPLE)
    f, d = one(0, SPP)
    f = np.asarray(f)
    print(f"pixel {PIXEL} spp{SPP}: {f} nan={np.isnan(f).any()}",
          flush=True)

    if not np.isnan(f).any():
        # Stage 0 fallback: the production full-frame render (auto
        # sort cadence etc.) that showed the NaN originally.
        print("single-pixel clean; rendering the full frame...",
              flush=True)
        from mrt.runtime.render import render

        film = render(scene, camera, W, H, spp=SPP, max_depth=DEPTH,
                      seed=SEED, persistent=True)
        sarr = np.asarray(film.sum)
        nans = [int(y) * W + int(x)
                for y, x in np.argwhere(~np.isfinite(sarr.sum(-1)))]
        print(f"full-frame nonfinite pixels: {nans[:16]}", flush=True)
        if not nans:
            return
        PIXEL = nans[0]
        f, d = one(0, SPP)
        print(f"pixel {PIXEL}: {np.asarray(f)}", flush=True)

    bad = []
    for s in range(SPP):
        fs, _ = one(s, 1)
        if np.isnan(np.asarray(fs)).any():
            bad.append(s)
            print(f"  sample {s}: NaN {np.asarray(fs)}", flush=True)
    print("bad samples:", bad, flush=True)
    if not bad:
        print("per-sample clean — NaN needs multi-sample context?!",
              flush=True)
        return

    return replay(scene, camera, bad[0])


def replay(scene, camera, s):
    """Stage 3: bounce replay of the bad sample on an N-lane batch of
    identical rays (the packet kernels want wide batches), dumping
    per-bounce hit + shade internals."""
    import jax
    import jax.numpy as jnp
    from mrt.integrator import wavefront
    from mrt.math.rng import Sampler

    N = 1024
    pixel = jnp.full((N,), PIXEL, jnp.uint32)
    sample = jnp.full((N,), s, jnp.uint32)
    cam = Sampler(SEED, pixel + jnp.uint32(0x9E3779B9) * sample,
                  salt=0xC0FFEE)
    jx, jy, du, dv = cam.next4()
    px = (pixel % W).astype(jnp.float32)
    py = (pixel // W).astype(jnp.float32)
    o, d = camera.rays((px + jx) / W, (py + jy) / H, du, dv)
    ray_id = pixel ^ (sample * jnp.uint32(0x85EBCA6B))

    from mrt.materials import shade as shade_mod
    from mrt.materials import table as T

    @jax.jit
    def detail(b, o, d):
        vol = Sampler(SEED, ray_id, salt=3 * b + 2)
        hits = scene.intersect(o, d, t_min=wavefront.T_MIN,
                               sampler=vol)
        em = Sampler(SEED, ray_id, salt=3 * b)
        sc = Sampler(SEED, ray_id, salt=3 * b + 1)
        emitted, atten, new_dir, scattered, lobe = shade_mod.shade_hit(
            scene, hits, d, em, sc)
        from mrt.ops.rowlookup import take_rows_with_int
        params, mtype = take_rows_with_int(
            scene.materials.params, scene.materials.mtype,
            hits.material)
        return (hits.hit, hits.t, hits.material, mtype, hits.normal,
                hits.uv, hits.tangent, hits.bitangent,
                hits.front_face, emitted, atten, new_dir, scattered)

    state = (o, d, jnp.ones_like(o), jnp.zeros_like(o),
             jnp.ones((N,), bool), jnp.zeros((N,), jnp.int32),
             jnp.zeros((N,), jnp.float32))
    step = jax.jit(lambda b, st: wavefront._bounce(
        scene, ray_id, SEED, b, st))
    names = ["o", "d", "throughput", "radiance", "alive", "bounces",
             "prev_pdf"]
    dkeys = ("hit", "t", "mat", "mtype", "normal", "uv", "tangent",
             "bitangent", "front_face", "emitted", "atten", "new_dir",
             "scattered")
    for b in range(DEPTH):
        det = detail(jnp.int32(b), state[0], state[1])
        drow = {k: np.asarray(v)[0] for k, v in zip(dkeys, det)}
        print(f"  detail b{b}: " + " ".join(
            f"{k}={drow[k]}" for k in dkeys), flush=True)
        state = step(jnp.int32(b), state)
        row = {k: np.asarray(v)[0] for k, v in zip(names, state)}
        flags = [k for k in ("o", "d", "throughput", "radiance",
                             "prev_pdf")
                 if not np.isfinite(row[k]).all()]
        print(f"bounce {b:2d} alive={row['alive']} o={row['o']} "
              f"d={row['d']} tp={row['throughput']} "
              f"rad={row['radiance']}"
              + (f"  NONFINITE: {flags}" if flags else ""), flush=True)
        if flags or not row["alive"]:
            break


if __name__ == "__main__":
    main()
