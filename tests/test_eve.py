"""EVE packed-PBR material + fleet scene tests."""

import numpy as np
import jax.numpy as jnp

from mrt.geometry.hit import Hits
from mrt.geometry.scene import Scene
from mrt.materials import shade
from mrt.materials.table import MaterialBuilder
from mrt.materials.background import SolidBackground
from mrt.math.rng import Sampler
from mrt.textures.atlas import AtlasBuilder


def _eve_scene(ar_px, no_px, pmdg_px, palette, glow=(0.5, 0.85, 2.0)):
    atlas = AtlasBuilder()
    ar = atlas.add_raw(np.broadcast_to(
        np.asarray(ar_px, np.float32), (1, 1, 4)).copy())
    no = atlas.add_raw(np.broadcast_to(
        np.asarray(no_px, np.float32), (1, 1, 4)).copy())
    pmdg = atlas.add_raw(np.broadcast_to(
        np.asarray(pmdg_px, np.float32), (1, 1, 4)).copy())
    mats = MaterialBuilder()
    row = mats.eve(ar, no, pmdg, palette, glow=glow)
    scene = Scene(materials=mats.build(),
                  background=SolidBackground.create((0, 0, 0)),
                  atlas=atlas.build())
    return scene, row


def _hits(n, material, tangent=None, bitangent=None):
    z3 = jnp.zeros((n, 3))
    return Hits(
        t=jnp.ones((n,)), point=z3,
        normal=jnp.zeros((n, 3)).at[:, 1].set(1.0),
        front_face=jnp.ones((n,), bool),
        uv=jnp.full((n, 2), 0.5),
        material=jnp.full((n,), material, jnp.int32),
        hit=jnp.ones((n,), bool),
        tangent=z3 if tangent is None else jnp.broadcast_to(
            jnp.asarray(tangent, jnp.float32), (n, 3)),
        bitangent=z3 if bitangent is None else jnp.broadcast_to(
            jnp.asarray(bitangent, jnp.float32), (n, 3)))


class TestEveSurface:
    def test_palette_lerp_and_dirt(self):
        # ar: albedo 1, roughness 1 (always Lambertian); pmdg: paint 0,
        # material mask 1/3 -> exact palette[1], dirt 0, glow 0.
        scene, row = _eve_scene(
            ar_px=(1, 1, 1, 1.0),
            no_px=(0.5, 0.5, 1.0, 0.5),
            pmdg_px=(0.0, 1.0 / 3.0, 0.0, 0.0),
            palette=[(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)])
        n = 64
        atten, nd, sc, _ = shade.scatter(
            scene, _hits(n, row),
            jnp.zeros((n, 3)).at[:, 1].set(-1.0),
            Sampler(0, jnp.arange(n, dtype=jnp.uint32)))
        assert bool(jnp.all(sc))
        np.testing.assert_allclose(np.asarray(atten), [[0, 1, 0]] * n,
                                   atol=1e-5)

    def test_paint_overrides_palette(self):
        # paint mask 1: color = albedo (eve.rs:105-106).
        scene, row = _eve_scene(
            ar_px=(0.3, 0.6, 0.9, 1.0),
            no_px=(0.5, 0.5, 1.0, 0.5),
            pmdg_px=(1.0, 0.0, 0.0, 0.0),
            palette=[(1, 0, 0)] * 4)
        n = 32
        atten, _, _, _ = shade.scatter(
            scene, _hits(n, row),
            jnp.zeros((n, 3)).at[:, 1].set(-1.0),
            Sampler(0, jnp.arange(n, dtype=jnp.uint32)))
        np.testing.assert_allclose(np.asarray(atten),
                                   [[0.3, 0.6, 0.9]] * n, atol=1e-5)

    def test_glow_emission(self):
        scene, row = _eve_scene(
            ar_px=(1, 1, 1, 1.0),
            no_px=(0.5, 0.5, 1.0, 0.5),
            pmdg_px=(0.0, 0.0, 0.0, 0.5),   # glow mask 0.5
            palette=[(1, 1, 1)] * 4,
            glow=(0.5, 0.85, 2.0))
        n = 8
        e = shade.emitted(scene, _hits(n, row),
                          Sampler(1, jnp.arange(n, dtype=jnp.uint32)))
        expect = np.array([0.5, 0.85, 2.0]) * 0.5 * 10.0
        np.testing.assert_allclose(np.asarray(e), [expect] * n, rtol=1e-5)

    def test_roughness_zero_is_specular(self):
        # roughness 0, dirt 0 -> always Specular: at normal incidence
        # with ior 1.8 r0 = (0.8/2.8)^2 ~ 0.0816 of rays mirror (atten 1).
        scene, row = _eve_scene(
            ar_px=(0.2, 0.2, 0.2, 0.0),
            no_px=(0.5, 0.5, 1.0, 0.5),
            pmdg_px=(1.0, 0.0, 0.0, 0.0),
            palette=[(1, 1, 1)] * 4)
        n = 1 << 12
        atten, _, sc, _ = shade.scatter(
            scene, _hits(n, row),
            jnp.zeros((n, 3)).at[:, 1].set(-1.0),
            Sampler(0, jnp.arange(n, dtype=jnp.uint32)))
        assert bool(jnp.all(sc))
        frac_mirror = np.isclose(np.asarray(atten)[:, 0], 1.0).mean()
        r0 = ((1 - 1 / 1.8) / (1 + 1 / 1.8)) ** 2
        assert abs(frac_mirror - r0) < 0.02

    def test_normal_map_tilts_normal(self):
        # Packed XY in G/A channels (eve.rs:66-73): G=0.75 -> tangent
        # x=0.5, A=0.5 -> y=0, z reconstructed = sqrt(0.75).
        scene, row = _eve_scene(
            ar_px=(1, 1, 1, 1.0),
            no_px=(0.0, 0.75, 1.0, 0.5),
            pmdg_px=(0.0, 0.0, 0.0, 0.0),
            palette=[(1, 1, 1)] * 4)
        n = 4
        hits = _hits(n, row, tangent=(1, 0, 0), bitangent=(0, 0, 1))
        d = jnp.zeros((n, 3)).at[:, 1].set(-1.0)
        mapped = shade.apply_normal_maps(scene, hits, d)
        nm = np.asarray(mapped.normal)
        # world = tangent*0.5 + normal*sqrt(0.75) = (0.5, 0.866, 0).
        np.testing.assert_allclose(
            nm, [[0.5, np.sqrt(0.75), 0.0]] * n, atol=1e-4)
        assert bool(np.all(np.asarray(mapped.front_face)))

    def test_fleet_scene_renders(self):
        from mrt import scenes
        from mrt.runtime.render import render

        scene, camera = scenes.get("eve")(aspect_ratio=1.0).generate()
        film = render(scene, camera, 24, 24, spp=2, max_depth=5, seed=3)
        img = np.asarray(film.mean())
        assert np.isfinite(img).all()
        assert img.max() > 1e-4
