"""Packet-size A/B for the HBM-streamed TLAS kernel on Menger L5.

The packet shares one traversal cursor; on diverged rays its cost is
the UNION of the rays' subtree visits.  This times intersect_tlas at
block_rows in {8, 2, 1} (1024/256/128-ray packets) on real bounce-0
(coherent) and bounce-1/2 (diverged) ray sets.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes.menger import Menger
    from mrt.math.rng import Sampler
    from mrt.materials import shade
    from mrt.ops import pallas_stream
    from mrt.integrator.wavefront import T_MIN

    W, H = 480, 270
    scene, camera = Menger(level=5, bake=2).generate()
    print("built", flush=True)

    n = W * H
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    cam = Sampler(1, pix, salt=0xC0FFEE)
    jx, jy, du, dv = cam.next4()
    o, d = camera.rays((px + jx) / W, (py + jy) / H, du, dv)

    @jax.jit
    def bounce(o, d, rid):
        hits = scene.intersect(o, d, t_min=T_MIN)
        em = Sampler(1, rid, salt=0)
        sc = Sampler(1, rid, salt=1)
        _, _, new_dir, scattered, _ = shade.shade_hit(scene, hits, d,
                                                      em, sc)
        live = hits.hit & scattered
        o2 = jnp.where(live[:, None], hits.point, o)
        d2 = jnp.where(live[:, None], new_dir, d)
        return o2, d2, live

    rays = {0: (o, d)}
    rid = pix
    o1, d1, live1 = bounce(o, d, rid)
    rays[1] = (o1, d1)
    o2, d2, live2 = bounce(o1, d1, rid + 7777)
    rays[2] = (o2, d2)
    print(f"live after b1: {float(live1.mean())*100:.0f}%  "
          f"b2: {float(live2.mean())*100:.0f}%", flush=True)

    # Morton pixel order: packets become ~32x32 screen tiles instead of
    # 2x480 scanline strips -> far fewer instances per packet union.
    from mrt.integrator.persistent import _morton3
    mx = (pix % W).astype(jnp.uint32)
    my = (pix // W).astype(jnp.uint32)
    mkey = _morton3(mx & 63, my & 63, jnp.zeros_like(mx)) \
        | (((mx >> 6) | ((my >> 6) << 4)) << 18)
    perm = jnp.argsort(mkey)

    def sortset(ro, rd):
        return jnp.take(ro, perm, axis=0), jnp.take(rd, perm, axis=0)

    cases = {f"scan b{b}": rd for b, rd in rays.items()}
    cases.update({f"morton b{b}": sortset(*rd)
                  for b, rd in rays.items()})

    for name, (ro, rd) in cases.items():
        f = jax.jit(lambda ro, rd: pallas_stream.intersect_tlas(
            scene.tlas, ro, rd, T_MIN, jnp.inf, block_rows=8).t)
        jax.block_until_ready(f(ro, rd))
        t0 = time.time()
        for _ in range(3):
            out = f(ro, rd)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(f"{name:12s}: {dt*1e3:8.1f} ms ({n/dt/1e3:7.1f}k rays/s)",
              flush=True)
    print("BLOCK_OK", flush=True)


if __name__ == "__main__":
    main()
