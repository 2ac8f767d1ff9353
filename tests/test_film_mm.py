"""Windowed one-hot MXU film deposit (ops/film_deposit) vs the serial
scatter: same estimator, f32 add-reassociation only."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrt.ops import film_deposit
from mrt.integrator.persistent import render_samples_chunked
from mrt.scenes import get


def test_deposit_matmul_matches_scatter():
    rng = np.random.default_rng(7)
    P, slots, W, base = 4096, 1024, 512, 37
    q = base + rng.integers(0, W, P).astype(np.int32)
    contrib = rng.standard_normal((P, 4)).astype(np.float32)
    # A few inactive rows: zero contrib, arbitrary (out-of-window) q.
    idle = rng.random(P) < 0.1
    contrib[idle] = 0.0
    q[idle] = 2 ** 30 - 5

    dest0 = rng.standard_normal((slots, 4)).astype(np.float32)
    ref = dest0.copy()
    np.add.at(ref, (q[~idle] & (slots - 1)), contrib[~idle])

    out = film_deposit.deposit_matmul(
        jnp.asarray(dest0), jnp.asarray(q), jnp.asarray(contrib),
        jnp.int32(base), W, L=128)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-6,
                               atol=2e-6)


def test_deposit_matmul_window_wraps_ring():
    # base lands near the end of the ring: the window must wrap.
    P, slots, W = 512, 256, 256
    base = 1000 - 17                       # 1000-17 mod 256 = 199
    q = base + np.arange(P, dtype=np.int32) % W
    contrib = np.tile(np.arange(P, dtype=np.float32)[:, None], (1, 4))
    ref = np.zeros((slots, 4), np.float32)
    np.add.at(ref, q & (slots - 1), contrib)
    out = film_deposit.deposit_matmul(
        jnp.zeros((slots, 4), jnp.float32), jnp.asarray(q),
        jnp.asarray(contrib), jnp.int32(base), W, L=64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)


def test_pallas_onehot_matches_segment_sum():
    from mrt.ops import pallas_onehot

    rng = np.random.default_rng(5)
    P, R = 2048, 1024
    idx = rng.integers(-5, R + 5, P).astype(np.int32)
    parts = rng.standard_normal((P, 12)).astype(np.float32)
    parts[(idx < 0) | (idx >= R)] = 0.0     # kernel contract
    out = pallas_onehot.onehot_deposit(
        jnp.asarray(idx), jnp.asarray(parts), R, interpret=True)
    ref = np.zeros((R, 12), np.float32)
    ok = (idx >= 0) & (idx < R)
    np.add.at(ref, idx[ok],
              np.asarray(jnp.asarray(parts[ok], jnp.bfloat16),
                         np.float32))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_film_mm_pallas_path_matches_xla(monkeypatch):
    # The interpret-mode Pallas deposit through a real render must
    # agree with the XLA two-level path (pool 2048 = 4 kernel blocks).
    import jax

    from mrt.scenes import get as get_scene

    scene, camera = get_scene("rtiow")(aspect_ratio=1.0).generate()
    kw = dict(width=64, height=64, seed=3, sample_start=0, samples=4,
              max_depth=8, pool=2048, slots=1024, film_mm=256)
    monkeypatch.setenv("MRT_ONEHOT", "xla")
    jax.clear_caches()
    f0, d0 = render_samples_chunked(scene, camera, **kw)
    monkeypatch.setenv("MRT_ONEHOT", "interpret")
    jax.clear_caches()
    f1, d1 = render_samples_chunked(scene, camera, **kw)
    monkeypatch.delenv("MRT_ONEHOT")
    jax.clear_caches()
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("spp", [4])
def test_film_mm_render_matches_scatter(spp):
    # Force big-frame mode on a small frame via a tiny slot window,
    # then compare the matmul-deposit film against the scatter film.
    scene, camera = get("rtiow")(aspect_ratio=1.0).generate()
    kw = dict(width=64, height=64, seed=3, sample_start=0, samples=spp,
              max_depth=8, pool=2048, slots=1024)
    f_ref, d_ref = render_samples_chunked(scene, camera, **kw,
                                          film_mm=0)
    f_mm, d_mm = render_samples_chunked(scene, camera, **kw,
                                        film_mm=256)
    # Depth counts are small-integer f32 sums: exact in any order.
    np.testing.assert_array_equal(np.asarray(d_mm), np.asarray(d_ref))
    np.testing.assert_allclose(np.asarray(f_mm), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)


def test_flush_pending_multi_round_overflow():
    # More pendings than the per-round compaction width K: the
    # while_loop must flush in prefix chunks without losing or
    # double-counting a row.
    rng = np.random.default_rng(9)
    P, slots, K = 4096, 2048, 256
    pslot = np.where(rng.random(P) < 0.5,
                     rng.integers(0, slots, P), -1).astype(np.int32)
    pacc = rng.standard_normal((P, 4)).astype(np.float32)
    dest0 = rng.standard_normal((slots, 4)).astype(np.float32)
    ref = dest0.copy()
    m = pslot >= 0
    np.add.at(ref, pslot[m], pacc[m])
    dest, ps, pa = film_deposit.flush_pending(
        jnp.asarray(dest0), jnp.asarray(pslot), jnp.asarray(pacc),
        K=K)
    assert int(m.sum()) > K  # exercised the overflow rounds
    np.testing.assert_allclose(np.asarray(dest), ref, rtol=2e-6,
                               atol=2e-6)
    assert (np.asarray(ps) == -1).all()
    # Flushed rows are cleared; never-pended rows keep their buffer
    # (always zero in production — the step only writes pacc when
    # parking).
    np.testing.assert_array_equal(np.asarray(pa)[m], 0.0)
    np.testing.assert_array_equal(np.asarray(pa)[~m], pacc[~m])


def test_film_mm_small_mode_matches_scatter():
    # Small-frame (zoo) mode: dest IS the padded film slice; the
    # deposit window rides the frame directly and stragglers park.
    scene, camera = get("rtiow")(aspect_ratio=1.0).generate()
    kw = dict(width=64, height=64, seed=5, sample_start=0, samples=4,
              max_depth=8, pool=2048)
    f_ref, d_ref = render_samples_chunked(scene, camera, **kw,
                                          film_mm=0)
    f_mm, d_mm = render_samples_chunked(scene, camera, **kw,
                                        film_mm=1024)
    np.testing.assert_array_equal(np.asarray(d_mm), np.asarray(d_ref))
    np.testing.assert_allclose(np.asarray(f_mm), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)


def test_film_mm_auto_gated_off_for_voxel_scenes(monkeypatch):
    # Hardware A/B (artifacts/menger_mm_r05.json): the deposit loses at
    # every window width on the voxel-DDA scene at 1080p, so the
    # big-frame auto rule must skip scenes with voxel grids — while
    # MRT_FILM_MM=1 still forces it on.
    from mrt.integrator import persistent
    from mrt.geometry import spheres

    monkeypatch.setattr(spheres, "_on_tpu", lambda: True)
    monkeypatch.delenv("MRT_FILM_MM", raising=False)
    monkeypatch.delenv("MRT_FILM_MM_W", raising=False)

    class Voxelish:
        voxels = (object(),)

    class Plain:
        voxels = None

    kw = dict(samples=16, width=1920, height=1080, slots=None)
    assert persistent._film_mm_enabled(None, **kw, scene=Plain()) > 0
    assert persistent._film_mm_enabled(None, **kw, scene=Voxelish()) == 0
    # Forcing overrides the gate.
    monkeypatch.setenv("MRT_FILM_MM", "1")
    assert persistent._film_mm_enabled(None, **kw, scene=Voxelish()) > 0
