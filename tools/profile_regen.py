"""Time the persistent step's regeneration block piecewise: cumsum,
claim/take wheres, state merge — to localize the ~5.4ms gap between
full-step (11.7ms) and intersect+shade (6.3ms)."""
import time

import numpy as np

K = 64


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    pool = 1 << 17

    rng = np.random.default_rng(0)
    claim0 = jnp.asarray(rng.random(pool) < 0.3)
    f0 = jnp.asarray(rng.random((pool, 3)).astype(np.float32))

    def timed(name, fn, *args):
        r = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.time()
        r = jax.block_until_ready(jax.jit(fn)(*args))
        dt = (time.time() - t0) / K
        print(f"{name:44s} {dt*1e3:7.3f} ms/step", flush=True)
        return r

    # cumsum int32 over pool
    def cs(claim):
        def body(b, carry):
            claim, acc = carry
            off = jnp.cumsum(claim.astype(jnp.int32)) - 1
            return claim ^ (off % 2 == 0), acc + off
        return jax.lax.fori_loop(
            0, K, body, (claim, jnp.zeros((pool,), jnp.int32)))
    timed("cumsum int32 (pool,)", cs, claim0)

    # associative_scan variant
    def cs2(claim):
        def body(b, carry):
            claim, acc = carry
            off = jax.lax.associative_scan(
                jnp.add, claim.astype(jnp.int32)) - 1
            return claim ^ (off % 2 == 0), acc + off
        return jax.lax.fori_loop(
            0, K, body, (claim, jnp.zeros((pool,), jnp.int32)))
    timed("associative_scan int32", cs2, claim0)

    # blocked two-level scan: reshape (R,C), per-row sums, tiny scan
    def cs3(claim):
        R, C = 1024, pool // 1024
        def body(b, carry):
            claim, acc = carry
            x = claim.astype(jnp.int32).reshape(R, C)
            row = jnp.cumsum(x, axis=1)
            tails = jnp.cumsum(row[:, -1]) - row[:, -1]
            off = (row + tails[:, None]).reshape(-1) - 1
            return claim ^ (off % 2 == 0), acc + off
        return jax.lax.fori_loop(
            0, K, body, (claim, jnp.zeros((pool,), jnp.int32)))
    timed("two-level cumsum (1024 rows)", cs3, claim0)

    # the merge wheres (state update) alone
    def merge(f):
        def body(b, carry):
            f, g = carry
            c = f[:, 0] > 0.5
            f2 = jnp.where(c[:, None], f, g)
            g2 = jnp.where(c[:, None], g * 1.0001, f)
            return f2, g2
        return jax.lax.fori_loop(0, K, body, (f, f0 + 1.0))
    timed("state-merge wheres", merge, f0)

    print("OK", flush=True)


if __name__ == "__main__":
    main()
