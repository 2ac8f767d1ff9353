"""Hardware A/B: pending-deposit film kernel vs the XLA scatter.

Times the full persistent step at pool 2^16 on RTIOW (sphere path) and
cornell (mesh/TLAS path) with pend on/off; the deposit only wins if
the predicated serial RMW beats the pool-row XLA scatter (~0.95 ms).
"""
import time

POOL = 1 << 16
K = 32


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    import mrt.integrator.persistent as PP
    from mrt.scenes import get

    for sname in ("rtiow", "cornell"):
        scene, camera = (get(sname)(aspect_ratio=16 / 9).generate()
                         if sname == "rtiow" else get(sname)().generate())
        w, h, samples = 1920, 1080, 8
        for pend in (False, True):
            (total, make_rays, step, mfl, fin, layout,
             neutral) = PP._build(scene, camera, w, h, 1, 0, samples,
                                  16, POOL, 0, None, 1, None, None,
                                  pend=pend)
            slots_eff, slab, npix_pad, big_mode = layout
            dest = jnp.zeros((slots_eff if big_mode else npix_pad, 4),
                             jnp.float32)
            state = PP._init_state(
                make_rays, POOL, dest, jnp.float32(0), jnp.int32(0),
                jnp.int32(slots_eff) * samples, neutral, pending=pend)

            blk = jax.jit(lambda st: jax.lax.fori_loop(
                0, K, lambda i, s: step(s), st))
            st = jax.block_until_ready(blk(state))
            t0 = time.time()
            st = jax.block_until_ready(blk(st))
            dt = (time.time() - t0) / K
            print(f"{sname:8s} pend={int(pend)}  {dt*1e3:7.3f} ms/step",
                  flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
