"""Pallas kernels vs their XLA reference implementations (interpret
mode on CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrt.geometry import spheres as S
from mrt.ops import pallas_spheres as PS


def _spheres(rng, n):
    return S.Spheres(
        center=jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32)),
        radius=jnp.asarray(rng.uniform(0.1, 1.2, n).astype(np.float32)),
        material=jnp.zeros((n,), jnp.int32))


class TestPallasSpheres:
    @pytest.mark.parametrize("n_spheres,n_rays", [(1, 64), (13, 1000),
                                                  (484, 2048)])
    def test_matches_scan_kernel(self, rng, n_spheres, n_rays):
        spheres = _spheres(rng, n_spheres)
        o = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((n_rays, 3)).astype(np.float32))

        t_ref, i_ref = S.nearest_t(spheres, o, d, 1e-3, jnp.inf)
        t_pal, i_pal = PS.nearest_t(spheres, o, d, 1e-3, jnp.inf,
                                    interpret=True)
        # The scan path computes half_b via (c@[d,o]) matmul, the kernel
        # via direct oc.d — equally valid f32 formulations ~1e-5 apart.
        hit = np.isfinite(np.asarray(t_ref))
        np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_pal)))
        np.testing.assert_allclose(np.asarray(t_pal)[hit],
                                   np.asarray(t_ref)[hit], rtol=2e-3,
                                   atol=1e-4)
        if hit.any():
            same_idx = np.asarray(i_pal)[hit] == np.asarray(i_ref)[hit]
            assert same_idx.mean() > 0.99  # near-ties may swap

    @pytest.mark.parametrize("n_spheres,n_rays", [(1, 64), (13, 1000),
                                                  (484, 2048)])
    def test_x_matches_scan_kernel(self, rng, n_spheres, n_rays):
        # Expanded-form kernel: same half_b/c_term expressions as the
        # scan, but FMA contraction differs between separately compiled
        # programs; near-tangent hits amplify the disc ulp through
        # sqrt, hence the same tolerance as the direct-form kernel.
        spheres = _spheres(rng, n_spheres)
        o = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((n_rays, 3)).astype(np.float32))

        t_ref, i_ref = S.nearest_t(spheres, o, d, 1e-3, jnp.inf)
        t_pal, i_pal = PS.nearest_t_x(spheres, o, d, 1e-3, jnp.inf,
                                      interpret=True)
        hit = np.isfinite(np.asarray(t_ref))
        np.testing.assert_array_equal(hit, np.isfinite(np.asarray(t_pal)))
        np.testing.assert_allclose(np.asarray(t_pal)[hit],
                                   np.asarray(t_ref)[hit], rtol=2e-3,
                                   atol=1e-4)
        if hit.any():
            same_idx = np.asarray(i_pal)[hit] == np.asarray(i_ref)[hit]
            assert same_idx.mean() > 0.99  # near-ties may swap

    def test_x_t_range_and_per_ray_bounds(self, rng):
        spheres = _spheres(rng, 16)
        o = jnp.asarray(rng.uniform(-8, 8, (256, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
        t_ref, _ = S.nearest_t(spheres, o, d, 0.5, 4.0)
        t_pal, _ = PS.nearest_t_x(spheres, o, d, 0.5, 4.0,
                                  interpret=True)
        m = np.isfinite(np.asarray(t_ref))
        np.testing.assert_array_equal(m, np.isfinite(np.asarray(t_pal)))
        np.testing.assert_allclose(np.asarray(t_pal)[m],
                                   np.asarray(t_ref)[m], rtol=2e-3,
                                   atol=1e-4)
        # Per-ray t bounds (the alpha re-cast path passes arrays).
        tmin = jnp.asarray(rng.uniform(0.1, 1.0, 256).astype(np.float32))
        tmax = jnp.asarray(rng.uniform(2.0, 6.0, 256).astype(np.float32))
        t_ref2, _ = S.nearest_t(spheres, o, d, 1e-3, tmax)
        t_pal2, _ = PS.nearest_t_x(spheres, o, d, 1e-3, tmax,
                                   interpret=True)
        m2 = np.isfinite(np.asarray(t_ref2))
        np.testing.assert_array_equal(m2, np.isfinite(np.asarray(t_pal2)))
        np.testing.assert_allclose(np.asarray(t_pal2)[m2],
                                   np.asarray(t_ref2)[m2], rtol=2e-3,
                                   atol=1e-4)

    def test_t_range_respected(self, rng):
        spheres = _spheres(rng, 16)
        o = jnp.asarray(rng.uniform(-8, 8, (256, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
        t_ref, _ = S.nearest_t(spheres, o, d, 0.5, 4.0)
        t_pal, _ = PS.nearest_t(spheres, o, d, 0.5, 4.0, interpret=True)
        np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                                   rtol=2e-3, atol=1e-4)


class TestPallasBVH:
    def _grid_spheres(self, rng, n):
        import math
        side = int(math.sqrt(n))
        centers = np.array([[i * 2.0, 0.0, j * 2.0]
                            for i in range(side) for j in range(side)],
                           np.float32)
        centers += rng.uniform(-0.3, 0.3, centers.shape).astype(np.float32)
        return S.Spheres(
            center=jnp.asarray(centers),
            radius=jnp.asarray(rng.uniform(0.3, 0.9, len(centers))
                               .astype(np.float32)),
            material=jnp.zeros((len(centers),), jnp.int32))

    @pytest.mark.parametrize("n", [16, 400])
    def test_matches_xla_traversal(self, rng, n):
        from mrt.geometry import bvh as B
        from mrt.ops import pallas_bvh as PB

        spheres = self._grid_spheres(rng, n)
        bvh, reordered = B.build_over_spheres(spheres)
        nr = 1500
        o = jnp.asarray(rng.uniform(-5, 45, (nr, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((nr, 3)).astype(np.float32))

        hx = B.intersect_bvh_spheres(reordered, bvh, o, d, 1e-3, jnp.inf)
        hp = PB.intersect_bvh_spheres(reordered, bvh, o, d, 1e-3,
                                      jnp.inf, interpret=True)
        np.testing.assert_array_equal(np.asarray(hx.hit),
                                      np.asarray(hp.hit))
        m = np.asarray(hx.hit)
        np.testing.assert_allclose(np.asarray(hp.t)[m],
                                   np.asarray(hx.t)[m], rtol=2e-3,
                                   atol=1e-4)
        if m.any():
            same = (np.asarray(hp.material)[m]
                    == np.asarray(hx.material)[m])
            assert same.mean() > 0.99

    def test_t_max(self, rng):
        from mrt.geometry import bvh as B
        from mrt.ops import pallas_bvh as PB

        spheres = self._grid_spheres(rng, 64)
        bvh, reordered = B.build_over_spheres(spheres)
        o = jnp.asarray(np.tile([[-4.0, 0.0, 4.0]], (8, 1)))
        d = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (8, 1)))
        hx = B.intersect_bvh_spheres(reordered, bvh, o, d, 1e-3, 3.0)
        hp = PB.intersect_bvh_spheres(reordered, bvh, o, d, 1e-3, 3.0,
                                      interpret=True)
        np.testing.assert_array_equal(np.asarray(hx.hit),
                                      np.asarray(hp.hit))


class TestPallasTriBVH:
    def test_matches_xla_traversal(self, rng):
        from mrt.geometry import bvh as B
        from mrt.geometry import triangles as T
        from mrt.ops import pallas_bvh as PB
        from mrt.geometry.shapes import sphere_mesh

        tris = sphere_mesh((0, 0, 0), 2.0, lat=12, lon=18)
        bvh, reordered = B.build_over_triangles(tris)
        nr = 1200
        o = jnp.asarray(rng.uniform(-6, 6, (nr, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((nr, 3)).astype(np.float32))

        hx = B.intersect_bvh(reordered, bvh, o, d, 1e-3, jnp.inf)
        hp = PB.intersect_bvh_tris(reordered, bvh, o, d, 1e-3, jnp.inf,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(hx.hit),
                                      np.asarray(hp.hit))
        m = np.asarray(hx.hit)
        np.testing.assert_allclose(np.asarray(hp.t)[m],
                                   np.asarray(hx.t)[m], rtol=2e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(hp.uv)[m],
                                   np.asarray(hx.uv)[m], rtol=1e-2,
                                   atol=2e-3)


class TestPallasTLAS:
    def test_matches_xla_tlas(self, rng):
        from mrt.geometry.instance import MeshRegistry, intersect_tlas
        from mrt.geometry.shapes import cube, sphere_mesh
        from mrt.ops import pallas_bvh as PB

        reg = MeshRegistry()
        m1 = reg.add_mesh(cube(size=1.0, material=1))
        m2 = reg.add_mesh(sphere_mesh(radius=0.6, lat=6, lon=8,
                                      material=2))
        for i in range(4):
            for j in range(4):
                mid = m1 if (i + j) % 2 == 0 else m2
                reg.add_instance(mid, translation=(i * 2.0, 0.0, j * 2.0),
                                 rotation=(0.0, 0.1 * i, 0.0),
                                 scale=1.0 + 0.2 * j)
        tlas = reg.build()

        nr = 1500
        o = jnp.asarray(rng.uniform(-4, 10, (nr, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((nr, 3)).astype(np.float32))

        hx = intersect_tlas(tlas, o, d, 1e-3, jnp.inf)
        hp = PB.intersect_tlas(tlas, o, d, 1e-3, jnp.inf, interpret=True)
        np.testing.assert_array_equal(np.asarray(hx.hit),
                                      np.asarray(hp.hit))
        m = np.asarray(hx.hit)
        np.testing.assert_allclose(np.asarray(hp.t)[m],
                                   np.asarray(hx.t)[m], rtol=2e-3,
                                   atol=1e-4)
        same_mat = (np.asarray(hp.material)[m]
                    == np.asarray(hx.material)[m])
        assert same_mat.mean() > 0.99
        np.testing.assert_allclose(np.asarray(hp.normal)[m],
                                   np.asarray(hx.normal)[m], rtol=2e-2,
                                   atol=2e-2)


class TestVectorTmin:
    """Per-lane t_min vectors (the alpha re-cast rounds) through every
    packet kernel, vs the XLA fallbacks (which broadcast natively).
    Scalar-broadcast results stay bit-identical (all real lanes carry
    the same value); a mixed vector must match the fallback per lane."""

    def _tlas(self, rng):
        from mrt.geometry.instance import MeshRegistry
        from mrt.geometry.shapes import cube, sphere_mesh

        reg = MeshRegistry()
        m1 = reg.add_mesh(cube(size=1.0, material=1))
        m2 = reg.add_mesh(sphere_mesh(radius=0.6, lat=6, lon=8,
                                      material=2))
        for i in range(3):
            reg.add_instance(m1, translation=(i * 2.0, 0.0, 0.0))
            reg.add_instance(m2, translation=(i * 2.0, 0.0, 2.0))
        return reg.build()

    def test_tri_kernel_vector_tmin(self, rng):
        from mrt.geometry import bvh as B
        from mrt.ops import pallas_bvh as PB
        from mrt.geometry.shapes import sphere_mesh

        tris = sphere_mesh((0, 0, 0), 2.0, lat=10, lon=14)
        bvh, reordered = B.build_over_triangles(tris)
        nr = 512
        o = jnp.asarray(rng.uniform(-5, 5, (nr, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((nr, 3)).astype(np.float32))
        t_min = jnp.asarray(rng.uniform(1e-3, 3.0, nr).astype(np.float32))
        hx = B.intersect_bvh(reordered, bvh, o, d, t_min, jnp.inf)
        hp = PB.intersect_bvh_tris(reordered, bvh, o, d, t_min,
                                   jnp.inf, interpret=True)
        np.testing.assert_array_equal(np.asarray(hx.hit),
                                      np.asarray(hp.hit))
        m = np.asarray(hx.hit)
        np.testing.assert_allclose(np.asarray(hp.t)[m],
                                   np.asarray(hx.t)[m], rtol=2e-3,
                                   atol=1e-4)

    def test_tlas_kernels_vector_tmin(self, rng, monkeypatch):
        from mrt.geometry.instance import intersect_tlas
        from mrt.ops import pallas_bvh as PB

        tlas = self._tlas(rng)
        nr = 512
        o = jnp.asarray(rng.uniform(-2, 7, (nr, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((nr, 3)).astype(np.float32))
        t_min = jnp.asarray(rng.uniform(1e-3, 2.0, nr).astype(np.float32))
        hx = intersect_tlas(tlas, o, d, t_min, jnp.inf)
        for ordered in ("0", "1"):
            monkeypatch.setattr(PB, "_ORD_ENV", ordered)
            hp = PB.intersect_tlas(tlas, o, d, t_min, jnp.inf,
                                   interpret=True)
            np.testing.assert_array_equal(np.asarray(hx.hit),
                                          np.asarray(hp.hit))
            m = np.asarray(hx.hit)
            np.testing.assert_allclose(np.asarray(hp.t)[m],
                                       np.asarray(hx.t)[m], rtol=2e-3,
                                       atol=1e-4)

    def test_stream_kernel_vector_tmin(self, rng):
        from mrt.geometry.instance import intersect_tlas
        from mrt.ops import pallas_stream as PS

        tlas = self._tlas(rng)
        nr = 256
        o = jnp.asarray(rng.uniform(-2, 7, (nr, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((nr, 3)).astype(np.float32))
        t_min = jnp.asarray(rng.uniform(1e-3, 2.0, nr).astype(np.float32))
        hx = intersect_tlas(tlas, o, d, t_min, jnp.inf)
        hp = PS.intersect_tlas(tlas, o, d, t_min, jnp.inf,
                               interpret=True,
                               streamed=dict(tlas=True, inst=True,
                                             blas=True, tri=True))
        np.testing.assert_array_equal(np.asarray(hx.hit),
                                      np.asarray(hp.hit))
        m = np.asarray(hx.hit)
        np.testing.assert_allclose(np.asarray(hp.t)[m],
                                   np.asarray(hx.t)[m], rtol=2e-3,
                                   atol=1e-4)


class TestOrderedRule:
    def test_tlas_ordered_auto_rule(self, monkeypatch):
        """Per-scene ordered-descent rule (VERDICT r3 #7): the TLAS
        kernel goes ordered only below the lane-sort instance
        threshold — the hardware A/B (commit c282bf1) measured ordered
        losing exactly on the big instanced scenes that sort
        (lucy -1.5%, eve -3%) and winning below it (cornell +17%)."""
        from mrt.ops import pallas_bvh as PB

        monkeypatch.setattr(PB, "_ORD_ENV", "auto")
        assert PB.tlas_ordered(10)       # cornell-class
        assert not PB.tlas_ordered(38)   # eve
        assert not PB.tlas_ordered(122)  # lucy
        monkeypatch.setattr(PB, "_ORD_ENV", "1")
        assert PB.tlas_ordered(122)
        monkeypatch.setattr(PB, "_ORD_ENV", "0")
        assert not PB.tlas_ordered(10)
