"""Bisect the scatter-cost discrepancy: profile_step's scat_only said
5.7ms/step, profile_scatter's near-identical baseline said 0.006ms."""
import time

import numpy as np

K = 64


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    pool = 1 << 17
    npix = 1920 * 1080

    rng = np.random.default_rng(0)
    pix0 = jnp.asarray(rng.integers(0, npix, pool).astype(np.int32))
    rid0 = jnp.asarray(rng.integers(0, 2**32, pool, dtype=np.uint64)
                       .astype(np.uint32))
    film0 = jnp.zeros((npix, 4), jnp.float32)
    val0 = jnp.ones((pool,), jnp.float32)

    def timed(name, fn, *args):
        r = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.time()
        r = jax.block_until_ready(jax.jit(fn)(*args))
        dt = (time.time() - t0) / K
        print(f"{name:44s} {dt*1e3:7.3f} ms/step", flush=True)
        return r

    # A: exact copy of profile_step's scat_only
    def scat_a(packed, rid):
        def body(b, carry):
            packed, v = carry
            pixel = (rid + jnp.uint32(b)).astype(jnp.int32) % npix
            add = jnp.stack([v, v, v, v], axis=-1)
            packed = packed.at[pixel].add(add)
            return packed, v + 1.0
        return jax.lax.fori_loop(
            0, K, body, (packed, jnp.zeros((pool,), jnp.float32)))
    timed("A: uint32-rid index, v carried", scat_a, film0, rid0)

    # B: same but int32 index arithmetic only
    def scat_b(packed, pix):
        def body(b, carry):
            packed, v = carry
            pixel = (pix + b) % npix
            add = jnp.stack([v, v, v, v], axis=-1)
            packed = packed.at[pixel].add(add)
            return packed, v + 1.0
        return jax.lax.fori_loop(
            0, K, body, (packed, jnp.zeros((pool,), jnp.float32)))
    timed("B: int32 index+b", scat_b, film0, pix0)

    # C: index carried in state (profile_scatter's baseline form)
    def scat_c(packed, pix):
        def body(b, carry):
            packed, pix, v = carry
            add = jnp.stack([v, v, v, v], axis=-1)
            packed = packed.at[pix].add(add)
            return packed, (pix + 1) % npix, v + 1.0
        return jax.lax.fori_loop(
            0, K, body, (packed, pix, jnp.zeros((pool,), jnp.float32)))
    timed("C: carried index", scat_c, film0, pix0)

    # D: fixed index, no per-iter arithmetic
    def scat_d(packed, pix):
        def body(b, carry):
            packed, v = carry
            add = jnp.stack([v, v, v, v], axis=-1)
            packed = packed.at[pix].add(add)
            return packed, v + 1.0
        return jax.lax.fori_loop(
            0, K, body, (packed, jnp.zeros((pool,), jnp.float32)))
    timed("D: constant index", scat_d, film0, pix0)

    print("OK", flush=True)


if __name__ == "__main__":
    main()
