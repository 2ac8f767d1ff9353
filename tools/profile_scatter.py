"""Scatter-add strategy shootout on the TPU.

The persistent step's film scatter costs ~5.7ms of the 11.7ms step
(tools/profile_step.py).  Times the candidate replacements:
  - baseline .at[pix].add (pool,4) -> (npix,4)
  - unique_indices / indices_are_sorted hints
  - sorted-by-pixel first (lax.sort_key_val), then hinted scatter
  - per-lane accumulate + flush only (same shape, value-sparse)
  - width-1 scatter
"""
import sys
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
    film0 = jnp.zeros((npix, 4), jnp.float32)
    val0 = jnp.ones((pool,), jnp.float32)

    def timed(name, fn, *args):
        r = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.time()
        r = jax.block_until_ready(jax.jit(fn)(*args))
        dt = (time.time() - t0) / K
        print(f"{name:36s} {dt*1e3:7.3f} ms/step", flush=True)
        return r

    def loop(body, *carry):
        return lambda *a: jax.lax.fori_loop(0, K, body, a)

    # 1. baseline
    def base(film, pix, v):
        def body(i, c):
            film, pix, v = c
            add = jnp.stack([v, v, v, v], -1)
            film = film.at[pix].add(add)
            return film, (pix + 1) % npix, v
        return jax.lax.fori_loop(0, K, body, (film, pix, v))
    timed("baseline at[].add (pool,4)", base, film0, pix0, val0)

    # 2. unique_indices hint
    def uniq(film, pix, v):
        def body(i, c):
            film, pix, v = c
            add = jnp.stack([v, v, v, v], -1)
            film = film.at[pix].add(add, unique_indices=True)
            return film, (pix + 1) % npix, v
        return jax.lax.fori_loop(0, K, body, (film, pix, v))
    timed("unique_indices=True", uniq, film0, pix0, val0)

    # 3. sorted indices + both hints (pre-sorted input, no sort cost)
    pix_sorted = jnp.sort(pix0)
    def sorted_hint(film, pix, v):
        def body(i, c):
            film, pix, v = c
            add = jnp.stack([v, v, v, v], -1)
            film = film.at[pix].add(add, unique_indices=True,
                                    indices_are_sorted=True)
            return film, pix, v + 1.0
        return jax.lax.fori_loop(0, K, body, (film, pix, v))
    timed("sorted+unique hints", sorted_hint, film0, pix_sorted, val0)

    # 4. sort per step then hinted scatter
    def sort_then(film, pix, v):
        def body(i, c):
            film, pix, v = c
            sp, sv = jax.lax.sort_key_val(pix, v)
            add = jnp.stack([sv, sv, sv, sv], -1)
            film = film.at[sp].add(add, indices_are_sorted=True)
            return film, (pix + 1) % npix, v
        return jax.lax.fori_loop(0, K, body, (film, pix, v))
    timed("sort + sorted-hint scatter", sort_then, film0, pix0, val0)

    # 5. width-1 scatter
    film1 = jnp.zeros((npix,), jnp.float32)
    def w1(film, pix, v):
        def body(i, c):
            film, pix, v = c
            film = film.at[pix].add(v)
            return film, (pix + 1) % npix, v
        return jax.lax.fori_loop(0, K, body, (film, pix, v))
    timed("width-1 scatter", w1, film1, pix0, val0)

    # 6. contiguous append via scatter at cumsum positions (sorted+uniq)
    log0 = jnp.zeros((pool * 2, 4), jnp.float32)
    def append(log, pix, v):
        def body(i, c):
            log, cursor, pix, v = c
            claim = (v + pix.astype(jnp.float32) * 0) > 0.5  # ~all
            off = jnp.cumsum(claim.astype(jnp.int32)) - 1
            dst = jnp.where(claim, cursor + off, pool * 2 - 1)
            add = jnp.stack([v, v, v, v], -1)
            log = log.at[dst].add(add, indices_are_sorted=True)
            return log, (cursor + jnp.sum(claim)) % pool, pix, v
        return jax.lax.fori_loop(0, K, body,
                                 (log, jnp.int32(0), pix, v))
    timed("append scatter (sorted dst)", append, log0, pix0, val0)

    # 7. one-hot segment flush: 8-row window dynamic slice + matmul-free
    def dus(log, v):
        def body(i, c):
            log, cursor, v = c
            block = jnp.stack([v, v, v, v], -1)
            log = jax.lax.dynamic_update_slice(
                log, block[None], (cursor % (pool // 2), 0, 0))
            return log, cursor + 1, v + 1.0
        return jax.lax.fori_loop(0, K, body, (log, jnp.int32(0), v))
    log3 = jnp.zeros((pool // 2 + 1, pool, 4), jnp.float32)
    # NOTE: log3 is 128GB?? pool//2 * pool * 4 * 4 -- way too big. skip.
    print("PROFILE_SCATTER_OK", flush=True)


if __name__ == "__main__":
    main()
