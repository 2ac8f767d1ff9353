"""Packet-BVH vs brute-scan crossover by sphere count.

profile_isect showed brute (fused XLA chunk scan) beating the packet
BVH kernel on RTIOW's 484 spheres; this sweeps synthetic sphere sets to
find where the BVH starts paying, so the TPU intersect policy
(geometry/scene._intersect_once) can pick by count instead of always
taking the packet kernel.  Same realistic harness as profile_isect:
K bounces with a pseudo-scatter so rays decohere like a real render.
"""
import time

import numpy as np

K = 16
N_RAYS = 1 << 16
COUNTS = (128, 484, 1024, 2048, 4096)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.geometry import spheres as sph_mod
    from mrt.geometry.bvh import build_over_spheres
    from mrt.math.rng import Sampler
    from mrt.math import sampling
    from mrt.ops import pallas_bvh

    rng = np.random.default_rng(7)

    def make_spheres(n):
        c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        r = rng.uniform(0.2, 0.8, (n,)).astype(np.float32)
        return sph_mod.Spheres(center=jnp.asarray(c),
                               radius=jnp.asarray(r),
                               material=jnp.zeros((n,), jnp.int32))

    # Primary rays: one origin, jittered directions into the box.
    pix = jnp.arange(N_RAYS, dtype=jnp.uint32)
    s = Sampler(1, pix, salt=0xC0FFEE)
    u1, u2, u3, _ = s.next4()
    o0 = jnp.tile(jnp.array([[0.0, 0.0, -30.0]], jnp.float32),
                  (N_RAYS, 1))
    tgt = jnp.stack([u1 * 20 - 10, u2 * 20 - 10, u3 * 20 - 10], -1)
    d0 = tgt - o0

    for n in COUNTS:
        sph = make_spheres(n)
        bvh, sph_r = build_over_spheres(sph)

        def variant(name):
            if name == "packet":
                return lambda o, d: pallas_bvh.intersect_bvh_spheres(
                    sph_r, bvh, o, d, 1e-3, jnp.inf)

            def brute(o, d):
                t, i = sph_mod.nearest_t(sph_r, o, d, 1e-3, jnp.inf)
                return sph_mod.make_hits(sph_r, o, d, t, i)
            return brute

        row = f"n={n:5d}"
        for name in ("packet", "brute"):
            isect = variant(name)

            def fn(i, carry):
                acc, o, d = carry
                h = isect(o, d)
                s = Sampler(1, pix + i.astype(jnp.uint32), salt=7)
                v1, v2, _, _ = s.next4()
                nd = h.normal + sampling.unit_vector(v1, v2)
                o = jnp.where(h.hit[:, None], h.point, o)
                d = jnp.where(h.hit[:, None], nd, d)
                return (acc + h.hit, o, d)

            f = jax.jit(lambda o, d: jax.lax.fori_loop(
                0, K, fn, (jnp.zeros((N_RAYS,)), o, d))[0])
            try:
                jax.block_until_ready(f(o0, d0))
                t0 = time.time()
                jax.block_until_ready(f(o0, d0))
                dt = (time.time() - t0) / K
                row += f"  {name} {dt*1e3:7.3f} ms"
            except Exception as e:  # noqa: BLE001
                row += f"  {name} FAILED:{type(e).__name__}"
        print(row, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    import sys, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    main()
