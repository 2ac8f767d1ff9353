"""Compare sphere-intersection strategies on the RTIOW sphere set.

  packet : Pallas packet BVH traversal (current TPU default, S>=64)
  brute  : geometry.spheres.nearest_t XLA chunk-scan (fused broadcast)
  pallas : ops.pallas_spheres dense kernel

Each runs inside a realistic step shape: K steps of intersect with the
ray advanced to the hit point and a pseudo-scatter direction, so the
measured cost includes the real ray distribution after a few bounces
(not just coherent camera rays).
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
    from mrt.math import sampling

    W, H = 480, 270
    scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
    sph = scene.spheres
    bvh = scene.sphere_bvh
    if bvh is None:
        from mrt.geometry.bvh import build_over_spheres
        bvh, sph = build_over_spheres(sph)
    print("spheres:", sph.count, "bvh nodes:", bvh.n_nodes, flush=True)

    npix = W * H
    n = POOL
    pix = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(npix)
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    cam = Sampler(1, pix, salt=0xC0FFEE)
    jx, jy, du, dv = cam.next4()
    o0, d0 = camera.rays((px + jx) / W, (py + jy) / H, du, dv)

    def variant(name):
        if name == "packet":
            from mrt.ops import pallas_bvh

            def isect(o, d):
                h = pallas_bvh.intersect_bvh_spheres(
                    sph, bvh, o, d, 1e-3, jnp.inf)
                return h.t, h.hit, h.point, h.normal
        elif name == "brute":
            from mrt.geometry import spheres as sph_mod

            def isect(o, d):
                t, i = sph_mod.nearest_t(sph, o, d, 1e-3, jnp.inf)
                h = sph_mod.make_hits(sph, o, d, t, i)
                return h.t, h.hit, h.point, h.normal
        elif name == "pallas":
            from mrt.ops import pallas_spheres
            from mrt.geometry import spheres as sph_mod

            def isect(o, d):
                t, i = pallas_spheres.nearest_t(sph, o, d, 1e-3, jnp.inf)
                h = sph_mod.make_hits(sph, o, d, t, i)
                return h.t, h.hit, h.point, h.normal
        else:
            from mrt.ops import pallas_spheres
            from mrt.geometry import spheres as sph_mod

            def isect(o, d):
                t, i = pallas_spheres.nearest_t_x(sph, o, d, 1e-3,
                                                  jnp.inf)
                h = sph_mod.make_hits(sph, o, d, t, i)
                return h.t, h.hit, h.point, h.normal
        return isect

    for name in ("packet", "brute", "pallas", "pallas_x"):
        isect = variant(name)

        def fn(i, carry):
            acc, o, d = carry
            t, hit, point, normal = isect(o, d)
            s = Sampler(1, pix + i.astype(jnp.uint32), salt=7)
            u1, u2, _, _ = s.next4()
            nd = normal + sampling.unit_vector(u1, u2)
            o = jnp.where(hit[:, None], point, o)
            d = jnp.where(hit[:, None], nd, d)
            return (acc + t * 0.0 + hit, o, d)

        f = jax.jit(lambda o, d: jax.lax.fori_loop(
            0, K, fn, (jnp.zeros((n,)), o, d))[0])
        try:
            jax.block_until_ready(f(o0, d0))
            t0 = time.time()
            jax.block_until_ready(f(o0, d0))
            dt = (time.time() - t0) / K
            print(f"{name:8s} {dt*1e3:8.3f} ms/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}",
                  flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
