"""Fused persistent-step megakernel (ops/pallas_megastep) vs the XLA
step — run in Pallas interpret mode on the CPU mesh.

Equivalence structure:
  - One step from a shared state must match the XLA step EXACTLY on all
    discrete/accumulated state (work items, bounce counters, RNG ids,
    throughput, claims, film deposits).  Ray origins/directions may
    differ by FMA-contraction ulps amplified through near-tangent
    sqrt (the same class as ops/pallas_spheres vs the XLA scan).
  - A full render must agree per-pixel except for the small fraction of
    paths a near-tie ulp reroutes (a rerouted path is still a valid
    sample of the same estimator, so the film stays unbiased).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrt.scenes import get
from mrt.integrator import persistent as P
from mrt.integrator.persistent import render_samples_chunked
from mrt.ops import pallas_megastep as mk


def _scene(grid=6):
    # Pre-attach the sphere BVH so the XLA reference path traverses the
    # same reordered sphere set (same arithmetic forms) as the kernel.
    scene, camera = get("rtiow")(aspect_ratio=2.0, grid=grid).generate()
    return mk.with_sphere_bvh(scene), camera


def _render(scene, camera, w, h, mega, **kw):
    return render_samples_chunked(
        scene, camera, w, h, seed=1, sample_start=0, samples=2,
        max_depth=8, pool=2048, mega=mega, **kw)


def _agree(a, b, frac=0.95, mean_tol=0.02):
    a = np.asarray(a)
    b = np.asarray(b)
    close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
    ok = close.reshape(close.shape[0], -1).all(axis=-1)
    assert ok.mean() >= frac, f"only {ok.mean():.4f} pixels agree"
    assert abs(a.mean() - b.mean()) <= mean_tol * max(abs(b.mean()),
                                                      1e-3)


def test_supports_gate():
    scene, camera = _scene()
    assert mk.supports(scene, rr_depth=None, sort_rays=False,
                       pool=2048)
    assert mk.supports(scene, rr_depth=2, sort_rays=False,
                       pool=2048)  # RR is in-kernel
    assert not mk.supports(scene, rr_depth=None, sort_rays=True,
                           pool=2048)
    assert not mk.supports(scene, rr_depth=None, sort_rays=False,
                           pool=1000)
    cornell, _ = get("cornell")().generate()
    assert not mk.supports(cornell, rr_depth=None, sort_rays=False,
                           pool=2048)


def test_draw4_matches_sampler():
    from mrt.math.rng import Sampler

    rid = jnp.arange(512, dtype=jnp.uint32) * jnp.uint32(2654435769)
    s = Sampler(7, rid, salt=13)
    s.skip(4)
    ref = s.next4()
    got = mk._draw4(rid.astype(jnp.int32), jnp.int32(13), jnp.int32(7),
                    4)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


@pytest.mark.parametrize("isect", ["bvh", "dense"])
def test_single_step_parity(isect):
    """One kernel step vs one XLA step from the same state: every
    discrete/accumulated quantity identical; o/d within FMA noise.
    Both intersect variants (packet BVH / dense sweep) must agree."""
    scene, camera = _scene()
    w, h, samples, pool, depth = 64, 32, 2, 2048, 8
    npix = w * h
    (total, make_rays, step, maybe_flush, finalize, layout,
     neutral) = P._build(scene, camera, w, h, 1, 0, samples, depth,
                         pool, 0, None, 1, None, None)
    slots_eff, slab, npix_pad, big_mode = layout
    dest = jnp.zeros((slots_eff if big_mode else npix_pad, 4),
                     jnp.float32)
    state = P._init_state(make_rays, pool, dest, jnp.float32(0),
                          jnp.int32(0), P._BIG, neutral, mega=True)

    st_x = jax.jit(lambda st: step(st[:10]))(state)
    st_m = mk.run_block(scene, camera, state, width=w, height=h,
                        seed=1, sample_start=0, samples=samples,
                        max_depth=depth, pool=pool,
                        slots_eff=npix_pad, big_mode=False,
                        k_steps=1, t_min=P.T_MIN, neutral=neutral,
                        isect=isect, interpret=True)

    for i, nm in ((0, "item"), (1, "bounce"), (5, "rid"),
                  (6, "next_work")):
        np.testing.assert_array_equal(np.asarray(st_x[i]),
                                      np.asarray(st_m[i]), err_msg=nm)
    np.testing.assert_array_equal(np.asarray(st_x[4]),
                                  np.asarray(st_m[4]), err_msg="tp")

    # Film consistency: the kernel deposits at death; live paths hold
    # their contribution in the pending accumulator.
    dest_x = np.asarray(st_x[7])
    dest_m = np.asarray(st_m[7]).copy()
    acc_m = np.asarray(st_m[10])
    q_m = np.minimum(np.asarray(st_m[0]), total) // samples
    for i in range(pool):
        if acc_m[i].any():
            dest_m[q_m[i]] += acc_m[i]
    np.testing.assert_allclose(dest_m, dest_x, rtol=1e-5, atol=1e-6)

    for i, nm in ((2, "o"), (3, "d")):
        a, b = np.asarray(st_x[i]), np.asarray(st_m[i])
        exact = np.isclose(a, b, rtol=1e-6, atol=1e-7).all(axis=-1)
        assert exact.mean() > 0.5, f"{nm}: {exact.mean():.3f}"
        np.testing.assert_allclose(a, b, rtol=0.1, atol=5e-3,
                                   err_msg=nm)


def test_megastep_full_render_small_mode():
    """npix <= slots: the accumulator is the film slice."""
    scene, camera = _scene()
    w, h = 64, 32
    ref_sum, ref_depth = _render(scene, camera, w, h, mega=False)
    got_sum, got_depth = _render(scene, camera, w, h, mega="interpret")
    _agree(got_sum, ref_sum)
    assert (np.asarray(got_depth) == np.asarray(ref_depth)).mean() > 0.95
    assert abs(int(got_depth.sum()) - int(ref_depth.sum())) <= (
        0.02 * int(ref_depth.sum()) + 8)


def test_megastep_full_render_big_mode():
    """npix > slots: rolling window, slab flushes, claim gating."""
    scene, camera = _scene()
    w, h = 128, 32
    ref_sum, ref_depth = _render(scene, camera, w, h, mega=False,
                                 slots=1024)
    got_sum, got_depth = _render(scene, camera, w, h, mega="interpret",
                                 slots=1024)
    _agree(got_sum, ref_sum)
    assert abs(int(got_depth.sum()) - int(ref_depth.sum())) <= (
        0.02 * int(ref_depth.sum()) + 8)


@pytest.mark.parametrize("tile,spp", [(4, 2), (2, 4)])
def test_megastep_sharded_matches(tile, spp):
    """Megastep under shard_map (tile x spp mesh): local work queues,
    global camera pixels, psum'd spp deltas — matches the XLA sharded
    persistent pass up to FMA-noise path reroutes."""
    from mrt.parallel.mesh import make_mesh
    from mrt.parallel.render import (render_pass_sharded_persistent,
                                     shard_film)
    from mrt.runtime.film import Film
    import jax

    scene, camera = _scene()
    mesh = make_mesh(tile=tile, spp=spp)
    w = h = 16

    def run(mega):
        film = shard_film(Film.create(w, h), mesh)
        fn = jax.jit(lambda s, c, f: render_pass_sharded_persistent(
            s, c, f, 7, 0, width=w, height=h, samples=8, max_depth=6,
            mesh=mesh, pool=2048, mega=mega))
        return np.asarray(fn(scene, camera, film).sum)

    ref = run(False)
    got = run("interpret")
    _agree(got.reshape(-1, 3), ref.reshape(-1, 3), frac=0.93,
           mean_tol=0.03)


def test_megastep_emissive():
    """DiffuseLight rows emit through the winner-carry path."""
    from mrt.geometry.scene import SceneBuilder
    from mrt.materials.table import MaterialBuilder
    from mrt.materials.background import SolidBackground
    from mrt.core.camera import Camera

    rng = np.random.default_rng(3)
    mat = MaterialBuilder()
    sb = SceneBuilder(mat, SolidBackground.create((0.0, 0.0, 0.0)))
    for i in range(72):
        p = rng.uniform(-4, 4, 3)
        kind = i % 4
        if kind == 0:
            m = mat.lambertian(tuple(rng.uniform(0.2, 0.9, 3)))
        elif kind == 1:
            m = mat.metal(0.2, (0.8, 0.7, 0.6))
        elif kind == 2:
            m = mat.specular(1.5, tuple(rng.uniform(0.2, 0.9, 3)))
        else:
            m = mat.diffuse_light(tuple(rng.uniform(1.0, 4.0, 3)))
        sb.add_sphere(tuple(p), 0.4, m)
    scene = sb.build()
    camera = Camera.create(60.0, (0, 0, 12), (0, 0, 0), (0, 1, 0), 2.0)
    w, h = 64, 32
    ref_sum, _ = _render(scene, camera, w, h, mega=False)
    got_sum, _ = _render(scene, camera, w, h, mega="interpret")
    _agree(got_sum, ref_sum)


def test_megastep_rr():
    """Russian roulette: same draws, reweighting, and bounce counts as
    the XLA persistent step."""
    scene, camera = _scene()
    w, h = 64, 32
    ref_sum, ref_depth = render_samples_chunked(
        scene, camera, w, h, seed=1, sample_start=0, samples=2,
        max_depth=8, pool=2048, rr_depth=2, mega=False)
    got_sum, got_depth = render_samples_chunked(
        scene, camera, w, h, seed=1, sample_start=0, samples=2,
        max_depth=8, pool=2048, rr_depth=2, mega="interpret")
    _agree(got_sum, ref_sum)
    assert abs(int(got_depth.sum()) - int(ref_depth.sum())) <= (
        0.02 * int(ref_depth.sum()) + 8)
