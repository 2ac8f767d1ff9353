"""Hardware validation of the HBM-streamed packet TLAS kernel.

Two phases, run as separate processes (CLAUDE.md: one TPU process at a
time, clean exits):

  python tools/tpu_stream_check.py expect   # CPU: write expected hits
  python tools/tpu_stream_check.py tpu      # TPU: run streamed kernel,
                                            # compare, then Menger L5

Phase "tpu" exercises (a) the small 40-instance TLAS with every group
force-streamed — the correctness check against the XLA traversal's
results from phase "expect" — and (b) the reference-scale Menger
(level 5, bake 2: 3.2M-instance-equivalent sponge as 8000 baked-block
instances) under the auto-chosen streaming plan, timed.
"""
import sys
import time

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "expect"
EXPECT = "/tmp/stream_expect.npz"


def build_small():
    from tests.test_stream import _build_tlas, _rays
    return _build_tlas(), _rays()


def main():
    import jax
    import jax.numpy as jnp
    print("devices:", jax.devices(), flush=True)

    sys.path.insert(0, "tests")
    from mrt.geometry.instance import intersect_tlas as xla_tlas
    from mrt.ops import pallas_stream

    tlas, (o, d) = build_small()

    if MODE == "expect":
        want = xla_tlas(tlas, o, d, 1e-3, jnp.inf)
        np.savez(EXPECT, hit=np.asarray(want.hit), t=np.asarray(want.t),
                 material=np.asarray(want.material),
                 normal=np.asarray(want.normal), uv=np.asarray(want.uv))
        print("expect written", flush=True)
        return

    # --- TPU: correctness, all groups streamed -------------------------
    plan = dict(tlas=True, inst=True, blas=True, tri=True)
    t0 = time.time()
    got = pallas_stream.intersect_tlas(tlas, o, d, 1e-3, jnp.inf,
                                       streamed=plan)
    jax.block_until_ready(got.t)
    print(f"small streamed compile+run: {time.time()-t0:.1f}s", flush=True)
    w = np.load(EXPECT)
    m = w["hit"]
    assert (np.asarray(got.hit) == m).all(), "hit mask mismatch"
    np.testing.assert_allclose(np.asarray(got.t)[m], w["t"][m], rtol=1e-5)
    assert (np.asarray(got.material)[m] == w["material"][m]).all()
    np.testing.assert_allclose(np.asarray(got.normal)[m], w["normal"][m],
                               atol=1e-4)
    print("small streamed TLAS: MATCH", flush=True)

    # --- TPU: Menger level 5 at reference scale ------------------------
    from mrt.scenes.menger import Menger
    t0 = time.time()
    scene, camera = Menger(level=5, bake=2).generate()
    print(f"menger L5 bake2 build: {time.time()-t0:.1f}s "
          f"inst={scene.tlas.transform.shape[0]} "
          f"tris={scene.tlas.tris.count}", flush=True)
    plan = pallas_stream.choose_streaming(scene.tlas)
    print("plan:", plan, flush=True)

    rng = np.random.default_rng(0)
    n = 1 << 16
    o2 = jnp.asarray(np.tile(np.array([[0.0, 0.0, 130.0]], np.float32),
                             (n, 1)))
    dd = rng.normal(size=(n, 3)) - np.array([0, 0, 3.0])
    dd = dd / np.linalg.norm(dd, axis=-1, keepdims=True)
    d2 = jnp.asarray(dd.astype(np.float32))

    t0 = time.time()
    h = pallas_stream.intersect_tlas(scene.tlas, o2, d2, 1e-3, jnp.inf,
                                     streamed=plan)
    jax.block_until_ready(h.t)
    print(f"menger streamed compile+run: {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        h = pallas_stream.intersect_tlas(scene.tlas, o2, d2, 1e-3,
                                         jnp.inf, streamed=plan)
        jax.block_until_ready(h.t)
        dt = time.time() - t0
        print(f"menger steady: {dt*1e3:.1f}ms  "
              f"{n/dt/1e6:.2f}M rays/s  hit={float(jnp.mean(h.hit)):.3f}",
              flush=True)
    print("TPU_STREAM_OK", flush=True)


if __name__ == "__main__":
    main()
