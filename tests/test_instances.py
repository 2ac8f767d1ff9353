"""Instance/TLAS and volume tests."""

import numpy as np
import jax.numpy as jnp

from mrt.geometry import triangles as T
from mrt.geometry.instance import MeshRegistry, intersect_tlas
from mrt.geometry.shapes import cube, quad, sphere_mesh
from mrt.geometry.volumes import VolumeSpheres, intersect as vol_intersect
from mrt.math import m4


def _transform_soup(tris, fwd):
    """Host-side: bake an instance transform into a triangle soup."""
    va = np.asarray(tris.va)
    vb = va + np.asarray(tris.e_ab)
    vc = va + np.asarray(tris.e_ac)
    f = np.asarray(fwd)
    tp = lambda p: p @ f[:3, :3].T + f[:3, 3]
    return T.Triangles.from_soup(tp(va), tp(vb), tp(vc),
                                 material=np.asarray(tris.material))


class TestInstances:
    def test_identity_instance_matches_mesh(self, rng):
        mesh = cube(size=2.0, material=3)
        reg = MeshRegistry()
        mid = reg.add_mesh(mesh)
        reg.add_instance(mid)
        tlas = reg.build()

        n = 128
        o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
        # Aim roughly at the cube so plenty of rays hit.
        d = (-o + rng.uniform(-0.5, 0.5, (n, 3))).astype(np.float32)
        o, d = jnp.asarray(o), jnp.asarray(d)

        hi = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
        hb = T.intersect_brute(mesh, o, d, 1e-3, jnp.inf)
        np.testing.assert_array_equal(np.asarray(hi.hit),
                                      np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hi.t)[m],
                                   np.asarray(hb.t)[m], rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(hi.material)[m],
                                      np.asarray(hb.material)[m])

    def test_transformed_instance_vs_baked_mesh(self, rng):
        mesh = cube(size=1.0)
        reg = MeshRegistry()
        mid = reg.add_mesh(mesh)
        tr, rot, sc = (1.0, 2.0, -0.5), (0.1, 0.2, 0.3), 1.7
        reg.add_instance(mid, translation=tr, rotation=rot, scale=sc)
        tlas = reg.build()
        baked = _transform_soup(mesh, m4.trs(tr, rot, (sc, sc, sc)))

        n = 256
        target = np.array(tr, np.float32)
        o = (target + rng.uniform(3, 6, (n, 3))).astype(np.float32)
        d = (target - o + rng.uniform(-0.8, 0.8, (n, 3))).astype(np.float32)
        o, d = jnp.asarray(o), jnp.asarray(d)

        hi = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
        hb = T.intersect_brute(baked, o, d, 1e-3, jnp.inf)
        np.testing.assert_array_equal(np.asarray(hi.hit),
                                      np.asarray(hb.hit))
        m = np.asarray(hb.hit)
        assert m.sum() > 20
        np.testing.assert_allclose(np.asarray(hi.t)[m],
                                   np.asarray(hb.t)[m],
                                   rtol=1e-3, atol=1e-4)
        # Uniform scale + rotation: instance normals == baked flat normals.
        np.testing.assert_allclose(np.asarray(hi.normal)[m],
                                   np.asarray(hb.normal)[m],
                                   rtol=1e-3, atol=1e-3)

    def test_material_override(self):
        mesh = quad((-1, -1, 2.0), (2, 0, 0), (0, 2, 0), material=5)
        reg = MeshRegistry()
        mid = reg.add_mesh(mesh)
        reg.add_instance(mid)                     # keeps triangle mat 5
        reg.add_instance(mid, translation=(0, 0, 2), material=9)
        tlas = reg.build()

        o = jnp.asarray([[0.0, 0.0, 0.0]] * 2)
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        h = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
        assert int(h.material[0]) == 5 and np.isclose(float(h.t[0]), 2.0)
        h2 = intersect_tlas(tlas, o, d, 2.5, jnp.inf)  # skip first quad
        assert int(h2.material[0]) == 9
        assert np.isclose(float(h2.t[0]), 4.0, atol=1e-5)

    def test_many_instances_grid(self, rng):
        # 5x5 grid of cubes: closest-instance selection must work.
        mesh = cube(size=0.5)
        reg = MeshRegistry()
        mid = reg.add_mesh(mesh)
        for i in range(5):
            for j in range(5):
                reg.add_instance(mid, translation=(i * 2.0, 0.0, j * 2.0))
        tlas = reg.build()

        # Ray down the x axis at row z=4 hits the nearest cube (x=0).
        o = jnp.asarray([[-5.0, 0.0, 4.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        h = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
        assert bool(h.hit[0])
        assert np.isclose(float(h.t[0]), 4.75, atol=1e-4)
        np.testing.assert_allclose(np.asarray(h.normal[0]), [-1, 0, 0],
                                   atol=1e-5)

    def test_two_meshes(self):
        reg = MeshRegistry()
        m1 = reg.add_mesh(cube(size=1.0, material=1))
        m2 = reg.add_mesh(sphere_mesh(radius=0.5, material=2))
        reg.add_instance(m1, translation=(0, 0, 3))
        reg.add_instance(m2, translation=(0, 0, -3))
        tlas = reg.build()
        o = jnp.zeros((2, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        h = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
        assert int(h.material[0]) == 1 and int(h.material[1]) == 2
        assert np.isclose(float(h.t[0]), 2.5, atol=1e-4)
        assert np.isclose(float(h.t[1]), 2.5, atol=2e-2)  # faceted sphere


class TestVolumes:
    def _vol(self, density, radius=1.0):
        return VolumeSpheres(
            center=jnp.zeros((1, 3)),
            radius=jnp.asarray([radius]),
            neg_inv_density=jnp.asarray([-1.0 / density]),
            material=jnp.asarray([7], jnp.int32))

    def test_beer_lambert_scatter_probability(self, rng):
        # Rays through the center of a radius-1, density-sigma fog:
        # P(scatter) = 1 - exp(-2 * sigma).
        sigma = 0.8
        vols = self._vol(sigma)
        n = 1 << 14
        o = jnp.asarray(np.tile([[-5.0, 0.0, 0.0]], (n, 1)))
        d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)))
        u = jnp.asarray(rng.random((n, 1), np.float32))
        h = vol_intersect(vols, o, d, 1e-3, jnp.inf, u)
        p = np.asarray(h.hit).mean()
        expect = 1.0 - np.exp(-2.0 * sigma)
        assert abs(p - expect) < 0.02
        # Scatter points lie inside the sphere.
        pts = np.asarray(h.point)[np.asarray(h.hit)]
        assert np.all(np.abs(np.linalg.norm(pts, axis=-1)) <= 1.0 + 1e-4)
        assert np.all(np.asarray(h.material)[np.asarray(h.hit)] == 7)

    def test_t_max_clamps_exit(self, rng):
        # With t_max at the sphere center, only the first half counts:
        # P = 1 - exp(-sigma * 1).
        sigma = 1.2
        vols = self._vol(sigma)
        n = 1 << 14
        o = jnp.asarray(np.tile([[-5.0, 0.0, 0.0]], (n, 1)))
        d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)))
        u = jnp.asarray(rng.random((n, 1), np.float32))
        h = vol_intersect(vols, o, d, 1e-3, 5.0, u)
        p = np.asarray(h.hit).mean()
        assert abs(p - (1.0 - np.exp(-sigma))) < 0.02

    def test_ray_starting_inside(self, rng):
        sigma = 50.0  # dense: nearly every ray scatters
        vols = self._vol(sigma)
        n = 1024
        o = jnp.zeros((n, 3))
        d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (n, 1)))
        u = jnp.asarray(rng.random((n, 1), np.float32))
        h = vol_intersect(vols, o, d, 1e-3, jnp.inf, u)
        assert np.asarray(h.hit).mean() > 0.99
        # Free flight starts at the origin (enter clamped to t_min/0).
        assert float(jnp.max(jnp.where(h.hit, h.t, 0.0))) <= 1.0 + 1e-4

    def test_miss_outside(self, rng):
        vols = self._vol(5.0)
        o = jnp.asarray([[0.0, 5.0, 0.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        u = jnp.asarray([[0.5]])
        h = vol_intersect(vols, o, d, 1e-3, jnp.inf, u)
        assert not bool(h.hit[0])
