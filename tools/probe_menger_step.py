"""Decompose the Menger L5 persistent-step cost on hardware.

The full render is ~11.4s for ~350k path segments (with cadence-1
sorting); the bare-intersect anchor says the traversal alone should be
~5s.  This times the REAL step function in isolation at a frozen
mid-render state, ablating one piece at a time:

  isect_b0   : bare streamed intersect of the 131072-lane b0 rays
  full       : one real step (intersect+shade+scatter+regen) x K
  noshade    : shade_hit replaced by constants
  noisect    : intersect replaced by fake all-miss hits
  sortonly   : just the sorter
"""
import time


K = 8
POOL = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from mrt.scenes.menger import Menger
    from mrt.integrator import persistent as P
    from mrt.integrator.wavefront import T_MIN

    W, H, DEPTH = 480, 270, 8
    scene, camera = Menger(level=5, bake=2).generate()
    print("built", flush=True)

    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral) = P._build(scene, camera, W, H, 1, 0, 1, DEPTH, POOL,
                         0, None, 1, None, None)
    state = P._init_state(make_rays, POOL,
                          jnp.zeros((layout[2], 4), jnp.float32),
                          jnp.float32(0), jnp.int32(0),
                          P._BIG, neutral)
    sorter = P._make_sorter(scene, total)

    # Anchor: bare intersect of the initial (b0, scanline) rays.
    o0, d0 = state[2], state[3]
    f = jax.jit(lambda o, d: scene.intersect(o, d, t_min=T_MIN).t)
    jax.block_until_ready(f(o0, d0))
    t0 = time.time()
    jax.block_until_ready(f(o0, d0))
    print(f"isect_b0    : {time.time()-t0:7.2f} s (131072 rays)",
          flush=True)

    # Advance the real state a few steps so it is mid-render shaped.
    adv = jax.jit(lambda s: jax.lax.fori_loop(
        0, 2, lambda i, x: sorter(step(x)), s))
    state2 = jax.block_until_ready(adv(state))
    live = float(jnp.mean(state2[0] < total))
    print(f"state after 2 steps: live {live*100:.0f}%", flush=True)

    def timeit(name, fn, st):
        g = jax.jit(fn)
        jax.block_until_ready(g(st))
        t0 = time.time()
        out = jax.block_until_ready(g(st))
        dt = (time.time() - t0) / K
        print(f"{name:12s}: {dt:7.3f} s/step", flush=True)
        return out

    timeit("full", lambda s: jax.lax.fori_loop(
        0, K, lambda i, x: step(x), s), state2)
    timeit("full+sort", lambda s: jax.lax.fori_loop(
        0, K, lambda i, x: sorter(step(x)), s), state2)
    timeit("sortonly", lambda s: jax.lax.fori_loop(
        0, K, lambda i, x: sorter(x), s), state2)

    # Intersect-only at the same state: repeat scene.intersect on the
    # state's rays, folding t into the carry so nothing is elided.
    def isect_only(s):
        o, d = s[2], s[3]
        def one(i, acc):
            return acc + scene.intersect(
                o + acc * 0.0, d, t_min=T_MIN).t
        return jax.lax.fori_loop(0, K, one, jnp.zeros((POOL,)))
    timeit("isect_state", isect_only, state2)
    print("STEP_OK", flush=True)


if __name__ == "__main__":
    main()
