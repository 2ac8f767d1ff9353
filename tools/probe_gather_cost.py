"""Serial-gather cost structure: per-row vs per-op, in-loop."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)
N = 1 << 16
rng = np.random.default_rng(0)
table = jnp.asarray(rng.random((680_000, 16)).astype(np.float32))
idx1 = jnp.asarray(rng.integers(0, 680_000, N).astype(np.int32))
idx2 = jnp.asarray(rng.integers(0, 680_000, N).astype(np.int32))

def loop(body):
    def f(x):
        def it(i, c):
            return c * 0.5 + body(i)
        return jax.lax.fori_loop(0, 8, it, x)
    return jax.jit(f)

v0 = jnp.zeros((N, 16), jnp.float32)

one   = loop(lambda i: table[(idx1 + i) % 680_000])
two   = loop(lambda i: (table[(idx1 + i) % 680_000]
                        + table[(idx2 + i) % 680_000]))
both = loop(lambda i: table[jnp.concatenate(
    [(idx1 + i) % 680_000, (idx2 + i) % 680_000])].reshape(2, N, 16).sum(0))
narrow_t = table[:, :4]
narrow = loop(lambda i: jnp.pad(narrow_t[(idx1 + i) % 680_000],
                                ((0, 0), (0, 12))))

for name, f in (("1 gather x16col", one), ("2 gathers x16col", two),
                ("1 gather of 2N", both), ("1 gather x4col", narrow)):
    jax.block_until_ready(f(v0))
    t0 = time.time()
    for _ in range(8):
        out = f(v0)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / (8 * 8) * 1e3
    print(f"{name:18s} {dt:7.3f} ms/iter", flush=True)
