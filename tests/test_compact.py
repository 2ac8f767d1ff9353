"""Bit-exactness of masked lane compaction (ops/compact) and the
compacted background eval."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrt.ops import compact


def test_compact_roundtrip_bit_exact():
    rng = np.random.default_rng(11)
    P, K = 2048, 512
    x = (rng.standard_normal((P, 5)) * 10.0 ** rng.integers(
        -20, 20, (P, 5))).astype(np.float32)
    mask = rng.random(P) < 0.2          # ~410 < K
    xc, pos, count = compact.compact_rows(
        jnp.asarray(mask), jnp.asarray(x), K)
    assert int(count) == mask.sum()
    # Compacted rows == masked rows, bit for bit.
    np.testing.assert_array_equal(np.asarray(xc)[:int(count)],
                                  x[mask])
    out = compact.expand_rows(xc, pos, jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(out)[mask], x[mask])
    assert (np.asarray(out)[~mask] == 0.0).all()


@pytest.mark.parametrize("frac", [0.1, 0.9])
def test_compact_apply_matches_full(frac):
    # frac 0.9 overflows K -> exercises the fallback branch.
    rng = np.random.default_rng(3)
    P, K = 1024, 256
    x = rng.standard_normal((P, 3)).astype(np.float32)
    mask = jnp.asarray(rng.random(P) < frac)
    fn = lambda v: jnp.stack([v[:, 0] * v[:, 1] + 3.0,
                              jnp.sin(v[:, 2])], axis=-1)
    out = compact.compact_apply(fn, mask, jnp.asarray(x), K,
                                pad_row=jnp.asarray([1.0, 0.0, 0.0]))
    ref = jnp.where(mask[:, None], fn(jnp.asarray(x)), 0.0)
    # Compaction is bit-exact (test_compact_roundtrip_bit_exact), but
    # XLA may contract fn's mul+add into FMA differently inside the
    # cond's fusion context — allow 1-ulp there.  The production
    # guarantee is the render-level bit-identity test below.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_onehot_gather_bit_exact():
    from mrt.ops import pallas_onehot

    rng = np.random.default_rng(2)
    P, K, C = 1024, 256, 3
    table = (rng.standard_normal((K, C))
             * 10.0 ** rng.integers(-10, 10, (K, C))).astype(np.float32)
    idx = rng.integers(-3, K + 3, P).astype(np.int32)
    out = np.asarray(pallas_onehot.onehot_gather(
        jnp.asarray(idx), jnp.asarray(table), interpret=True))
    ok = (idx >= 0) & (idx < K)
    np.testing.assert_array_equal(out[ok], table[idx[ok]])
    assert (out[~ok] == 0.0).all()


def test_bg_compact_render_bit_identical():
    # Eve's cubemap background through the compacted path must produce
    # the exact same film as the full-width eval.
    from mrt.scenes import get
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = get("eve")(aspect_ratio=1.0).generate()
    kw = dict(width=48, height=48, seed=5, sample_start=0, samples=2,
              max_depth=6, pool=4096)
    old = {k: os.environ.get(k)
           for k in ("MRT_BG_COMPACT", "MRT_ONEHOT")}
    try:
        os.environ["MRT_BG_COMPACT"] = "0"
        jax.clear_caches()   # the flags are read at trace time
        f0, d0 = render_samples_chunked(scene, camera, **kw)
        os.environ["MRT_BG_COMPACT"] = "1"
        jax.clear_caches()
        f1, d1 = render_samples_chunked(scene, camera, **kw)
        # Same again through the Pallas kernels (interpret mode).
        os.environ["MRT_ONEHOT"] = "interpret"
        jax.clear_caches()
        f2, d2 = render_samples_chunked(scene, camera, **kw)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d2))
    # The kernels themselves are bit-exact (unit tests above); routing
    # through them changes the envmap eval's fusion context, which can
    # re-contract an FMA — ulp-level on the radiance only.
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f2),
                               rtol=1e-6, atol=1e-7)
