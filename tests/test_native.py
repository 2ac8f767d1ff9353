"""Native C++ BVH builder vs the Python specification."""

import time

import numpy as np
import pytest

from mrt import native
from mrt.geometry import bvh as B


pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no native toolchain")


def _prims(rng, n):
    cent = rng.uniform(-10, 10, (n, 3))
    half = rng.uniform(0.05, 0.5, (n, 3))
    return cent, cent - half, cent + half


def _python_build(cent, bmin, bmax, leaf_size=4, split=None):
    import os
    os.environ["MRT_NO_NATIVE"] = "1"
    try:
        return B.build(cent, bmin, bmax, leaf_size, split=split)
    finally:
        del os.environ["MRT_NO_NATIVE"]


class TestNativeBVH:
    @pytest.mark.parametrize("n", [1, 5, 100, 5000])
    def test_bit_identical_to_python(self, rng, n):
        cent, bmin, bmax = _prims(rng, n)
        native_out = native.bvh_build(cent, bmin, bmax, 4)
        assert native_out is not None
        (nb_min, nb_max, first, count, escape), order = native_out
        (pb_min, pb_max, pfirst, pcount, pescape), porder = _python_build(
            cent, bmin, bmax)
        np.testing.assert_array_equal(order, porder)
        np.testing.assert_array_equal(first, pfirst)
        np.testing.assert_array_equal(count, pcount)
        np.testing.assert_array_equal(escape, pescape)
        np.testing.assert_array_equal(nb_min, pb_min)
        np.testing.assert_array_equal(nb_max, pb_max)

    @pytest.mark.parametrize("n", [5, 100, 5000])
    def test_sah_bit_identical_to_python(self, rng, n):
        # The C++ binned-SAH port vs the Python spec
        # (bvh.py::_sah_partition) — exact node arrays and order.
        cent, bmin, bmax = _prims(rng, n)
        native_out = native.bvh_build(cent, bmin, bmax, 4, split_mode=1)
        assert native_out is not None
        (nb_min, nb_max, first, count, escape), order = native_out
        (pb_min, pb_max, pfirst, pcount, pescape), porder = _python_build(
            cent, bmin, bmax, split="sah")
        np.testing.assert_array_equal(order, porder)
        np.testing.assert_array_equal(first, pfirst)
        np.testing.assert_array_equal(count, pcount)
        np.testing.assert_array_equal(escape, pescape)
        np.testing.assert_array_equal(nb_min, pb_min)
        np.testing.assert_array_equal(nb_max, pb_max)

    def test_sah_clustered_bit_identical(self, rng):
        # Clustered + duplicated centroids exercise the degenerate
        # (median-fallback) branch inside SAH recursion.
        k = rng.uniform(-20, 20, (6, 3))
        cent = np.repeat(k, 40, axis=0) + rng.normal(
            0, 0.01, (240, 3))
        cent[:30] = cent[0]                      # exact duplicates
        half = rng.uniform(0.01, 0.2, (240, 3))
        native_out = native.bvh_build(cent, cent - half, cent + half,
                                      4, split_mode=1)
        (nb_min, nb_max, first, count, escape), order = native_out
        (pb_min, pb_max, pfirst, pcount, pescape), porder = _python_build(
            cent, cent - half, cent + half, split="sah")
        np.testing.assert_array_equal(order, porder)
        np.testing.assert_array_equal(escape, pescape)
        np.testing.assert_array_equal(nb_min, pb_min)
        np.testing.assert_array_equal(nb_max, pb_max)

    def test_large_build_fast(self, rng):
        n = 200_000
        cent, bmin, bmax = _prims(rng, n)
        t0 = time.time()
        out = native.bvh_build(cent, bmin, bmax, 4)
        dt = time.time() - t0
        assert out is not None
        assert dt < 5.0, f"native build took {dt:.1f}s for {n}"
        (_, _, first, count, escape), order = out
        assert count[count > 0].sum() == n
        assert sorted(order.tolist()) == list(range(n))

    def test_build_over_triangles_uses_native(self, rng):
        # Above the threshold the dispatch goes native and traversal
        # still matches brute force.
        import jax.numpy as jnp
        from mrt.geometry import triangles as T

        n = 2000
        base = rng.uniform(-5, 5, (n, 3))
        tris = T.Triangles.from_soup(
            base, base + rng.uniform(-0.3, 0.3, (n, 3)),
            base + rng.uniform(-0.3, 0.3, (n, 3)))
        bvh, reordered = B.build_over_triangles(tris)
        o = jnp.asarray(rng.uniform(-8, 8, (128, 3)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((128, 3)).astype(np.float32))
        hb = T.intersect_brute(tris, o, d, 1e-3, jnp.inf)
        hv = B.intersect_bvh(reordered, bvh, o, d, 1e-3, jnp.inf)
        np.testing.assert_array_equal(np.asarray(hb.hit),
                                      np.asarray(hv.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hv.t)[m],
                                   np.asarray(hb.t)[m], rtol=1e-4)
