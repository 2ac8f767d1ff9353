"""Persistent (ray-regeneration) integrator vs the batched wavefront."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrt.core.camera import Camera
from mrt.geometry.scene import Scene
from mrt.geometry.spheres import Spheres
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SkyBackground, SolidBackground
from mrt.runtime.film import Film
from mrt.runtime.render import render_pass, render_pass_persistent


def _scene():
    b = MaterialBuilder()
    ground = b.lambertian((0.5, 0.5, 0.5))
    red = b.lambertian((0.8, 0.2, 0.2))
    metal = b.metal(0.05, (0.9, 0.9, 0.9))
    glass = b.dielectric(1.5)
    light = b.diffuse_light((4.0, 4.0, 4.0))
    return Scene(
        materials=b.build(),
        background=SkyBackground.create(),
        spheres=Spheres(
            center=jnp.asarray([
                [0.0, -100.5, -2.0], [-1.0, 0.0, -2.0], [0.0, 0.0, -2.0],
                [1.0, 0.0, -2.0], [0.0, 1.5, -2.0]]),
            radius=jnp.asarray([100.0, 0.5, 0.5, 0.5, 0.4]),
            material=jnp.asarray([ground, red, metal, glass, light],
                                 jnp.int32)))


def _camera():
    return Camera.create(60.0, (0, 0.3, 1), (0, 0, -2), (0, 1, 0),
                         aspect_ratio=1.0)


@pytest.mark.parametrize("pool_frac", [4, 1])
def test_matches_batched_integrator(pool_frac):
    scene, camera = _scene(), _camera()
    w = h = 24
    spp = 4
    seed = 7

    batch = Film.create(w, h)
    batch = render_pass(scene, camera, batch, seed, 0, width=w, height=h,
                        max_depth=8, samples=spp)

    pers = Film.create(w, h)
    pers = render_pass_persistent(
        scene, camera, pers, seed, 0, width=w, height=h, max_depth=8,
        samples=spp, pool=(w * h * spp) // pool_frac)

    # Same draws, same estimator — only FP accumulation order differs.
    np.testing.assert_allclose(np.asarray(pers.sum),
                               np.asarray(batch.sum), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(pers.depth_sum),
                                  np.asarray(batch.depth_sum))
    assert int(pers.samples) == spp


def test_progressive_accumulation():
    scene, camera = _scene(), _camera()
    w = h = 16
    film = Film.create(w, h)
    film = render_pass_persistent(scene, camera, film, 3, 0, width=w,
                                  height=h, max_depth=6, samples=2,
                                  pool=256)
    film = render_pass_persistent(scene, camera, film, 3, 2, width=w,
                                  height=h, max_depth=6, samples=2,
                                  pool=256)
    direct = Film.create(w, h)
    direct = render_pass_persistent(scene, camera, direct, 3, 0, width=w,
                                    height=h, max_depth=6, samples=4,
                                    pool=256)
    np.testing.assert_allclose(np.asarray(film.sum),
                               np.asarray(direct.sum), rtol=2e-4,
                               atol=2e-4)
    assert int(film.samples) == 4


@pytest.mark.parametrize("pool", [256, 4096])
def test_big_mode_slot_accumulator(pool):
    """Force big mode (npix > slots): rolling slot accumulator, gated
    claims, slab flushes.  pool=4096 exceeds the initial gate window
    (slots*spp = 512), exercising gated init claims too."""
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = _scene(), _camera()
    w = h = 24
    spp = 4
    seed = 11

    batch = Film.create(w, h)
    batch = render_pass(scene, camera, batch, seed, 0, width=w, height=h,
                        max_depth=8, samples=spp)

    fs, ds = render_samples_chunked(
        scene, camera, w, h, seed, 0, jnp.uint32(spp), max_depth=8,
        pool=pool, slots=128)
    np.testing.assert_allclose(
        np.asarray(fs), np.asarray(batch.sum).reshape(-1, 3),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(ds), np.asarray(batch.depth_sum).ravel())


def test_big_mode_while_loop_driver():
    """Same forced big mode through the single while_loop driver."""
    from mrt.integrator.persistent import render_samples_persistent
    import jax

    scene, camera = _scene(), _camera()
    w = h = 16
    spp = 2

    batch = Film.create(w, h)
    batch = render_pass(scene, camera, batch, 5, 0, width=w, height=h,
                        max_depth=6, samples=spp)

    fs, ds = jax.jit(lambda: render_samples_persistent(
        scene, camera, w, h, 5, 0, jnp.uint32(spp), max_depth=6,
        pool=512, slots=64))()
    np.testing.assert_allclose(
        np.asarray(fs), np.asarray(batch.sum).reshape(-1, 3),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(ds), np.asarray(batch.depth_sum).ravel())


def test_sorted_lanes_match():
    """Coherence sorting permutes lanes only — the estimator and every
    RNG draw are untouched (keyed on ray_id/bounce, not lane)."""
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = _scene(), _camera()
    w = h = 24
    spp = 4

    batch = Film.create(w, h)
    batch = render_pass(scene, camera, batch, 9, 0, width=w, height=h,
                        max_depth=8, samples=spp)

    fs, ds = render_samples_chunked(
        scene, camera, w, h, 9, 0, jnp.uint32(spp), max_depth=8,
        pool=512, sort_rays=True)
    np.testing.assert_allclose(
        np.asarray(fs), np.asarray(batch.sum).reshape(-1, 3),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(ds), np.asarray(batch.depth_sum).ravel())


def test_sorted_lanes_big_mode():
    """Sorting composes with the rolling slot accumulator (gating uses
    min-over-lanes, which is permutation-invariant)."""
    from mrt.integrator.persistent import render_samples_chunked

    scene, camera = _scene(), _camera()
    w = h = 24
    spp = 4

    batch = Film.create(w, h)
    batch = render_pass(scene, camera, batch, 13, 0, width=w, height=h,
                        max_depth=8, samples=spp)

    fs, ds = render_samples_chunked(
        scene, camera, w, h, 13, 0, jnp.uint32(spp), max_depth=8,
        pool=512, slots=128, sort_rays=True)
    np.testing.assert_allclose(
        np.asarray(fs), np.asarray(batch.sum).reshape(-1, 3),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(ds), np.asarray(batch.depth_sum).ravel())


def test_tiny_pool_still_complete():
    # A pool far smaller than the work queue must still consume it all.
    scene, camera = _scene(), _camera()
    w = h = 8
    film = Film.create(w, h)
    film = render_pass_persistent(scene, camera, film, 1, 0, width=w,
                                  height=h, max_depth=4, samples=2,
                                  pool=32)
    batch = Film.create(w, h)
    batch = render_pass(scene, camera, batch, 1, 0, width=w, height=h,
                        max_depth=4, samples=2)
    np.testing.assert_allclose(np.asarray(film.sum),
                               np.asarray(batch.sum), rtol=2e-4,
                               atol=2e-4)
