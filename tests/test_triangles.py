"""Triangle intersection + BVH traversal tests."""

import numpy as np
import jax.numpy as jnp

from mrt.geometry import triangles as T
from mrt.geometry import bvh as B


def _random_mesh(rng, n_tris, spread=5.0, size=0.5):
    base = rng.uniform(-spread, spread, (n_tris, 3))
    va = base
    vb = base + rng.uniform(-size, size, (n_tris, 3))
    vc = base + rng.uniform(-size, size, (n_tris, 3))
    return T.Triangles.from_soup(va, vb, vc)


class TestTriangleIntersect:
    def test_analytic_hit(self):
        # Unit right triangle in z=2 plane; ray down +z through (.25,.25).
        tris = T.Triangles.from_soup(
            [[0, 0, 2.0]], [[1, 0, 2.0]], [[0, 1, 2.0]])
        o = jnp.asarray([[0.25, 0.25, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = T.intersect_brute(tris, o, d, 1e-3, jnp.inf)
        assert bool(hits.hit[0])
        assert np.isclose(float(hits.t[0]), 2.0, atol=1e-6)
        # Flat normal (0,0,1) flipped against the +z ray.
        np.testing.assert_allclose(np.asarray(hits.normal[0]), [0, 0, -1],
                                   atol=1e-6)
        assert not bool(hits.front_face[0])

    def test_outside_misses(self):
        tris = T.Triangles.from_soup(
            [[0, 0, 2.0]], [[1, 0, 2.0]], [[0, 1, 2.0]])
        o = jnp.asarray([[0.9, 0.9, 0.0]])  # outside hypotenuse
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = T.intersect_brute(tris, o, d, 1e-3, jnp.inf)
        assert not bool(hits.hit[0])

    def test_parallel_ray_rejected(self):
        tris = T.Triangles.from_soup(
            [[0, 0, 2.0]], [[1, 0, 2.0]], [[0, 1, 2.0]])
        o = jnp.asarray([[0.25, 0.25, 2.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])  # in-plane: det ~ 0
        hits = T.intersect_brute(tris, o, d, 1e-3, jnp.inf)
        assert not bool(hits.hit[0])

    def test_smooth_normal_and_uv_interpolation(self):
        # Vertex normals tilt +x at a, +y at b, +z at c; uv corners.
        tris = T.Triangles.from_soup(
            [[0, 0, 1.0]], [[1, 0, 1.0]], [[0, 1, 1.0]],
            normals=([[1.0, 0, 0]], [[0, 1.0, 0]], [[0, 0, 1.0]]),
            uvs=([[0.0, 0.0]], [[1.0, 0.0]], [[0.0, 1.0]]))
        o = jnp.asarray([[0.25, 0.25, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = T.intersect_brute(tris, o, d, 1e-3, jnp.inf)
        # Barycentric (w,u,v) = (0.5, 0.25, 0.25).
        np.testing.assert_allclose(np.asarray(hits.uv[0]), [0.25, 0.25],
                                   atol=1e-6)
        # Interpolated (unnormalised, geom.rs:552) normal = weights,
        # flipped against the ray (+z component positive -> flip).
        np.testing.assert_allclose(np.asarray(hits.normal[0]),
                                   [-0.5, -0.25, -0.25], atol=1e-6)

    def test_t_range(self):
        tris = T.Triangles.from_soup(
            [[0, 0, 2.0]], [[1, 0, 2.0]], [[0, 1, 2.0]])
        o = jnp.asarray([[0.25, 0.25, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        assert not bool(T.intersect_brute(tris, o, d, 1e-3, 1.5).hit[0])
        assert not bool(T.intersect_brute(tris, o, d, 2.5, jnp.inf).hit[0])


class TestBVH:
    def test_matches_brute_force(self, rng):
        tris = _random_mesh(rng, 300)
        bvh, reordered = B.build_over_triangles(tris)
        n = 512
        o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

        hb = T.intersect_brute(tris, o, d, 1e-3, jnp.inf)
        hv = B.intersect_bvh(reordered, bvh, o, d, 1e-3, jnp.inf)

        np.testing.assert_array_equal(np.asarray(hb.hit),
                                      np.asarray(hv.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hv.t)[m],
                                   np.asarray(hb.t)[m], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(hv.point)[m],
                                   np.asarray(hb.point)[m],
                                   rtol=1e-3, atol=1e-4)

    def test_single_triangle(self):
        tris = T.Triangles.from_soup(
            [[0, 0, 2.0]], [[1, 0, 2.0]], [[0, 1, 2.0]])
        bvh, reordered = B.build_over_triangles(tris)
        assert bvh.n_nodes == 1
        o = jnp.asarray([[0.25, 0.25, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = B.intersect_bvh(reordered, bvh, o, d, 1e-3, jnp.inf)
        assert bool(hits.hit[0])
        assert np.isclose(float(hits.t[0]), 2.0, atol=1e-6)

    def test_escape_structure(self, rng):
        tris = _random_mesh(rng, 100)
        bvh, _ = B.build_over_triangles(tris)
        esc = np.asarray(bvh.escape)
        cnt = np.asarray(bvh.count)
        m = bvh.n_nodes
        assert esc[-1] == m
        # Every escape strictly advances and leaves cover all triangles.
        assert np.all(esc > np.arange(m))
        assert cnt[cnt > 0].sum() == 100

    def test_degenerate_flat_mesh(self):
        # All triangles in one plane (zero-extent axis in AABB).
        va = np.array([[i, 0, 0] for i in range(16)], np.float32)
        vb = va + [1, 0, 0]
        vc = va + [0, 1, 0]
        tris = T.Triangles.from_soup(va, vb, vc)
        bvh, reordered = B.build_over_triangles(tris)
        o = jnp.asarray([[5.5, 0.25, -1.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = B.intersect_bvh(reordered, bvh, o, d, 1e-3, jnp.inf)
        assert bool(hits.hit[0])
        assert np.isclose(float(hits.t[0]), 1.0, atol=1e-5)
