"""Wavefront integrator end-to-end tests, including the golden comparison
against the NumPy reference tracer (the reference algorithms verbatim)."""

import numpy as np
import jax.numpy as jnp

from mrt.core.camera import Camera
from mrt.geometry.scene import Scene
from mrt.geometry.spheres import Spheres
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SkyBackground, SolidBackground
from mrt.integrator import wavefront
from mrt.runtime.render import render
from mrt.runtime.film import Film

import ref_tracer


def _sphere_scene(entries, background=None):
    """entries: list of (center, radius, add_material_fn(builder)->id)."""
    b = MaterialBuilder()
    centers, radii, mats = [], [], []
    for center, radius, fn in entries:
        centers.append(center)
        radii.append(radius)
        mats.append(fn(b))
    return Scene(
        materials=b.build(),
        background=background or SkyBackground.create(),
        spheres=Spheres(
            center=jnp.asarray(np.array(centers, np.float32)),
            radius=jnp.asarray(np.array(radii, np.float32)),
            material=jnp.asarray(np.array(mats, np.int32)),
        ))


class TestTermination:
    def test_miss_is_background(self):
        scene = _sphere_scene(
            [((0, 0, -100), 1.0, lambda b: b.lambertian())],
            background=SolidBackground.create((0.25, 0.5, 0.75)))
        o = jnp.zeros((4, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
        rad, bounces = wavefront.trace_wavefront(
            scene, o, d, jnp.arange(4, dtype=jnp.uint32), 1)
        np.testing.assert_allclose(np.asarray(rad), [[0.25, 0.5, 0.75]] * 4,
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bounces), 0)

    def test_emissive_direct(self):
        scene = _sphere_scene(
            [((0, 0, 5), 1.0, lambda b: b.diffuse_light((2, 3, 4)))],
            background=SolidBackground.create((0, 0, 0)))
        o = jnp.zeros((2, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2, 3))
        rad, bounces = wavefront.trace_wavefront(
            scene, o, d, jnp.arange(2, dtype=jnp.uint32), 1)
        np.testing.assert_allclose(np.asarray(rad), [[2, 3, 4]] * 2,
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bounces), 0)

    def test_depth_zero_black(self):
        scene = _sphere_scene(
            [((0, 0, 5), 1.0, lambda b: b.diffuse_light((2, 3, 4)))])
        o = jnp.zeros((2, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2, 3))
        rad, _ = wavefront.trace_wavefront(
            scene, o, d, jnp.arange(2, dtype=jnp.uint32), 1, max_depth=0)
        np.testing.assert_allclose(np.asarray(rad), 0.0)

    def test_mirror_box_depth_exhaustion(self):
        # Ray trapped between two giant mirrors: terminates at max_depth
        # with black (world.rs:66-67), bounces == max_depth.
        scene = _sphere_scene(
            [((0, 0, 1e4 + 10), 1e4, lambda b: b.metal(0.0, (1, 1, 1))),
             ((0, 0, -1e4 - 10), 1e4, lambda b: b.metal(0.0, (1, 1, 1)))],
            background=SolidBackground.create((1, 1, 1)))
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        rad, bounces = wavefront.trace_wavefront(
            scene, o, d, jnp.arange(1, dtype=jnp.uint32), 1, max_depth=6)
        np.testing.assert_allclose(np.asarray(rad), 0.0, atol=1e-6)
        assert int(bounces[0]) == 6


class TestEnergyConservation:
    def test_grey_diffuse_furnace(self):
        # Furnace test: inside an all-enclosing 0.5-grey Lambertian sphere
        # with emission 1 background... no background visible, so radiance
        # must converge to 0 (absorbing enclosure) — specifically bounded
        # by 0.5^depth decay, never exceeding 1.
        scene = _sphere_scene(
            [((0, 0, 0), 100.0, lambda b: b.lambertian((0.5, 0.5, 0.5)))],
            background=SolidBackground.create((0, 0, 0)))
        n = 512
        o = jnp.zeros((n, 3))
        d = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((n, 3)).astype(np.float32))
        rad, _ = wavefront.trace_wavefront(
            scene, o, d, jnp.arange(n, dtype=jnp.uint32), 1, max_depth=20)
        assert float(jnp.max(rad)) <= 1.0
        assert float(jnp.mean(rad)) < 1e-4  # 0.5^20 decay

    def test_emissive_enclosure_equilibrium(self):
        # Inside a pure emitter: radiance == emission exactly.
        scene = _sphere_scene(
            [((0, 0, 0), 100.0, lambda b: b.diffuse_light((0.7, 0.7, 0.7)))],
            background=SolidBackground.create((0, 0, 0)))
        n = 64
        o = jnp.zeros((n, 3))
        d = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((n, 3)).astype(np.float32))
        rad, _ = wavefront.trace_wavefront(
            scene, o, d, jnp.arange(n, dtype=jnp.uint32), 1, max_depth=5)
        np.testing.assert_allclose(np.asarray(rad), 0.7, atol=1e-5)


class TestGoldenVsReference:
    """Monte Carlo agreement with the NumPy port of the reference
    algorithms (world.rs:65-79 + material.rs), per SURVEY §7 step 2."""

    def _compare(self, scene, camera, w, h, spp, depth, tol):
        film = render(scene, camera, w, h, spp=spp, max_depth=depth, seed=5)
        ours = np.asarray(film.mean())

        def cam_rays(s, t):
            o, d = camera.rays(jnp.asarray([s], jnp.float32),
                               jnp.asarray([t], jnp.float32),
                               jnp.zeros(1), jnp.zeros(1))
            return np.asarray(o)[0], np.asarray(d)[0]

        theirs = ref_tracer.render(scene, cam_rays, w, h, spp, depth, seed=3)
        err = np.abs(ours - theirs).mean()
        assert err < tol, f"mean abs err {err} vs {tol}"

    def test_three_sphere_scene(self):
        scene = _sphere_scene([
            ((0, -100.5, -1), 100.0, lambda b: b.lambertian((0.8, 0.8, 0.0))),
            ((0, 0, -1), 0.5, lambda b: b.lambertian((0.1, 0.2, 0.5))),
            ((-1, 0, -1), 0.5, lambda b: b.dielectric(1.5)),
            ((1, 0, -1), 0.5, lambda b: b.metal(0.1, (0.8, 0.6, 0.2))),
        ])
        camera = Camera.create(90.0, (0, 0, 0), (0, 0, -1), (0, 1, 0),
                               aspect_ratio=1.0)
        self._compare(scene, camera, 12, 12, 192, 8, tol=0.03)

    def test_emissive_scene(self):
        scene = _sphere_scene([
            ((0, -100.5, -1), 100.0, lambda b: b.lambertian((0.5, 0.5, 0.5))),
            ((0, 1.5, -2), 0.8, lambda b: b.diffuse_light((4, 4, 4))),
            ((0, 0, -1), 0.5, lambda b: b.metal(0.0, (0.9, 0.9, 0.9))),
        ], background=SolidBackground.create((0.02, 0.02, 0.02)))
        camera = Camera.create(60.0, (0, 0.5, 1), (0, 0, -1), (0, 1, 0),
                               aspect_ratio=1.0)
        self._compare(scene, camera, 10, 10, 256, 6, tol=0.04)


class TestFilm:
    def test_merge_and_mean(self):
        film = Film.create(4, 2)
        r = jnp.ones((2, 4, 3))
        film = film.merge(r, jnp.ones((2, 4), jnp.int32))
        film = film.merge(3 * r, jnp.ones((2, 4), jnp.int32))
        assert int(film.samples) == 2
        np.testing.assert_allclose(np.asarray(film.mean()), 2.0)

    def test_tonemap_gamma(self):
        film = Film.create(2, 1)
        film = film.merge(jnp.full((1, 2, 3), 0.5), jnp.zeros((1, 2),
                                                             jnp.int32))
        out = np.asarray(film.to_float_rgb())
        np.testing.assert_allclose(out, 0.5 ** (1 / 2.2), rtol=1e-5)

    def test_checkpoint_roundtrip(self, tmp_path):
        film = Film.create(3, 2).merge(
            jnp.ones((2, 3, 3)), jnp.ones((2, 3), jnp.int32))
        p = str(tmp_path / "ckpt.npz")
        film.save_state(p, seed=42)
        film2, seed = Film.load_state(p)
        assert seed == 42
        np.testing.assert_array_equal(np.asarray(film.sum),
                                      np.asarray(film2.sum))
        assert int(film2.samples) == 1

    def test_resume_matches_uninterrupted(self, tmp_path):
        scene = _sphere_scene(
            [((0, 0, -2), 0.5, lambda b: b.lambertian((0.5, 0.2, 0.2)))])
        camera = Camera.create(90.0, (0, 0, 0), (0, 0, -1), (0, 1, 0),
                               aspect_ratio=1.0)
        full = render(scene, camera, 8, 8, spp=4, max_depth=4, seed=9)
        half = render(scene, camera, 8, 8, spp=2, max_depth=4, seed=9)
        p = str(tmp_path / "half.npz")
        half.save_state(p, seed=9)
        resumed_film, seed = Film.load_state(p)
        resumed = render(scene, camera, 8, 8, spp=4, max_depth=4, seed=seed,
                         film=resumed_film)
        np.testing.assert_allclose(np.asarray(full.sum),
                                   np.asarray(resumed.sum), rtol=1e-5)
