"""Batched material shading vs the reference semantics."""

import numpy as np
import jax.numpy as jnp

from mrt.geometry.hit import Hits
from mrt.geometry.scene import Scene
from mrt.materials import shade
from mrt.materials.table import MaterialBuilder, MaterialTable
from mrt.materials.background import SkyBackground
from mrt.math.rng import Sampler


def _scene(builder: MaterialBuilder) -> Scene:
    return Scene(materials=builder.build(),
                 background=SkyBackground.create())


def _hits(n, material, normal=(0.0, 1.0, 0.0), front_face=True):
    return Hits(
        t=jnp.ones((n,)),
        point=jnp.zeros((n, 3)),
        normal=jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (n, 3)),
        front_face=jnp.full((n,), front_face),
        uv=jnp.zeros((n, 2)),
        material=jnp.full((n,), material, jnp.int32),
        hit=jnp.ones((n,), bool),
        tangent=jnp.zeros((n, 3)),
        bitangent=jnp.zeros((n, 3)),
    )


def _sampler(n, seed=0):
    return Sampler(seed, jnp.arange(n, dtype=jnp.uint32))


class TestLambertian:
    def test_distribution_and_albedo(self):
        n = 1 << 13
        b = MaterialBuilder()
        m = b.lambertian((0.3, 0.5, 0.7))
        scene = _scene(b)
        atten, nd, sc, _ = shade.scatter(scene, _hits(n, m),
                                      jnp.broadcast_to(
                                          jnp.asarray([0., -1., 0.]), (n, 3)),
                                      _sampler(n))
        assert bool(jnp.all(sc))
        np.testing.assert_allclose(np.asarray(atten),
                                   [[0.3, 0.5, 0.7]] * n, rtol=1e-6)
        d = np.asarray(nd)
        # normal + unit vector: all scatter into upper hemisphere and the
        # mean direction is the normal (material.rs:204-220).
        assert (d[:, 1] > -1e-5).mean() > 0.999
        assert abs(d[:, 1].mean() - 1.0) < 0.02
        assert abs(d[:, 0].mean()) < 0.02


class TestMetal:
    def test_mirror_and_absorb(self):
        n = 4
        b = MaterialBuilder()
        m = b.metal(0.0, (0.8, 0.8, 0.8))
        scene = _scene(b)
        d_in = jnp.broadcast_to(
            jnp.asarray([1.0, -1.0, 0.0]) / np.sqrt(2), (n, 3))
        atten, nd, sc, _ = shade.scatter(scene, _hits(n, m), d_in, _sampler(n))
        assert bool(jnp.all(sc))
        expect = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        np.testing.assert_allclose(np.asarray(nd), [expect] * n, atol=1e-5)

    def test_fuzz_absorbs_below_horizon(self):
        n = 1 << 12
        b = MaterialBuilder()
        m = b.metal(1.0)  # max fuzz: grazing reflections often dip below
        scene = _scene(b)
        # Grazing incidence so reflected ray is nearly tangent.
        d_in = jnp.broadcast_to(jnp.asarray([1.0, -0.01, 0.0]), (n, 3))
        atten, nd, sc, _ = shade.scatter(scene, _hits(n, m), d_in, _sampler(n))
        sc = np.asarray(sc)
        assert 0.05 < sc.mean() < 0.95  # some absorbed, some not
        d = np.asarray(nd)[sc]
        assert np.all((d * np.array([0, 1, 0])).sum(-1) > 0)


class TestDielectric:
    def test_tir_always_reflects(self):
        # From inside glass at grazing angle: total internal reflection
        # (material.rs:311-319).
        n = 256
        b = MaterialBuilder()
        m = b.dielectric(1.5)
        scene = _scene(b)
        d_in = jnp.broadcast_to(
            jnp.asarray([1.0, -0.1, 0.0]), (n, 3))
        hits = _hits(n, m, front_face=False)  # exiting: ratio = ior = 1.5
        atten, nd, sc, _ = shade.scatter(scene, hits, d_in, _sampler(n))
        assert bool(jnp.all(sc))
        np.testing.assert_allclose(np.asarray(atten), 1.0, atol=1e-6)
        d = np.asarray(nd)
        assert np.all(d[:, 1] > 0)  # all reflected upward

    def test_normal_incidence_mostly_refracts(self):
        n = 1 << 12
        b = MaterialBuilder()
        m = b.dielectric(1.5)
        scene = _scene(b)
        d_in = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
        atten, nd, sc, _ = shade.scatter(scene, _hits(n, m), d_in, _sampler(n))
        d = np.asarray(nd)
        frac_refracted = (d[:, 1] < 0).mean()
        # Schlick at normal incidence for 1.5: r0 = 0.04.
        assert abs(frac_refracted - 0.96) < 0.02


class TestEmissive:
    def test_light_emits_no_scatter(self):
        n = 8
        b = MaterialBuilder()
        m = b.diffuse_light((2.0, 3.0, 4.0))
        scene = _scene(b)
        hits = _hits(n, m)
        e = shade.emitted(scene, hits, _sampler(n))
        np.testing.assert_allclose(np.asarray(e), [[2, 3, 4]] * n)
        _, _, sc, _ = shade.scatter(scene, hits,
                                 jnp.zeros((n, 3)).at[:, 1].set(-1.0),
                                 _sampler(n, seed=1))
        assert not bool(jnp.any(sc))

    def test_no_hit_no_emission(self):
        n = 8
        b = MaterialBuilder()
        m = b.diffuse_light((2.0, 3.0, 4.0))
        scene = _scene(b)
        hits = _hits(n, m).replace(hit=jnp.zeros((n,), bool))
        e = shade.emitted(scene, hits, _sampler(n))
        np.testing.assert_allclose(np.asarray(e), 0.0)


class TestMix:
    def test_ratio_statistics(self):
        n = 1 << 13
        b = MaterialBuilder()
        light = b.diffuse_light((1.0, 1.0, 1.0))
        null = b.null()
        m = b.mix(0.3, light, null)  # 30% light, 70% null
        scene = _scene(b)
        e = np.asarray(shade.emitted(scene, _hits(n, m), _sampler(n)))
        assert abs((e[:, 0] > 0).mean() - 0.3) < 0.02

    def test_nested_mix(self):
        n = 1 << 13
        b = MaterialBuilder()
        light = b.diffuse_light((1.0, 1.0, 1.0))
        null = b.null()
        inner = b.mix(0.5, light, null)
        outer = b.mix(0.5, inner, null)
        scene = _scene(b)
        e = np.asarray(shade.emitted(scene, _hits(n, outer), _sampler(n)))
        assert abs((e[:, 0] > 0).mean() - 0.25) < 0.02


class TestIsotropic:
    def test_uniform_ball(self):
        n = 1 << 13
        b = MaterialBuilder()
        m = b.isotropic((0.5, 0.5, 0.5))
        scene = _scene(b)
        atten, nd, sc, _ = shade.scatter(
            scene, _hits(n, m),
            jnp.broadcast_to(jnp.asarray([0., -1., 0.]), (n, 3)),
            _sampler(n))
        assert bool(jnp.all(sc))
        d = np.asarray(nd)
        assert np.linalg.norm(d, axis=-1).max() <= 1.0
        assert np.all(np.abs(d.mean(0)) < 0.02)


class TestSpecular:
    def test_fresnel_gate(self):
        n = 1 << 12
        b = MaterialBuilder()
        m = b.specular(1.5, (0.9, 0.1, 0.1))
        scene = _scene(b)
        d_in = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
        atten, nd, sc, _ = shade.scatter(scene, _hits(n, m), d_in, _sampler(n))
        assert bool(jnp.all(sc))
        a = np.asarray(atten)
        is_mirror = np.isclose(a[:, 0], 1.0)
        # ~4% mirror at normal incidence; rest inner Lambertian albedo.
        assert abs(is_mirror.mean() - 0.04) < 0.02
        np.testing.assert_allclose(a[~is_mirror],
                                   [[0.9, 0.1, 0.1]] * int((~is_mirror).sum()),
                                   rtol=1e-5)
