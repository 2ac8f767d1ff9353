"""Sphere intersection kernel vs closed-form / brute-force oracles."""

import numpy as np
import jax.numpy as jnp

from mrt.geometry import spheres as S
from mrt.geometry.hit import set_face_normal


def _random_spheres(rng, n):
    return S.Spheres(
        center=jnp.asarray(rng.uniform(-5, 5, (n, 3)).astype(np.float32)),
        radius=jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32)),
        material=jnp.zeros((n,), jnp.int32),
    )


def _numpy_nearest(spheres, o, d, t_min):
    """Oracle implementing geom.rs:57-93 root selection."""
    c = np.asarray(spheres.center)
    r = np.asarray(spheres.radius)
    oc = o[:, None, :] - c[None, :, :]
    a = (d * d).sum(-1)[:, None]
    half_b = (oc * d[:, None, :]).sum(-1)
    cterm = (oc * oc).sum(-1) - r[None, :] ** 2
    disc = half_b ** 2 - a * cterm
    sq = np.sqrt(np.maximum(disc, 0))
    ok = disc >= 0
    r0 = np.where(ok & ((-half_b - sq) / a >= t_min),
                  (-half_b - sq) / a, np.inf)
    r1 = np.where(ok & ((-half_b + sq) / a >= t_min),
                  (-half_b + sq) / a, np.inf)
    root = np.where(np.isfinite(r0), r0, r1)
    return root.min(1), root.argmin(1)


class TestSphereIntersect:
    def test_vs_numpy_oracle(self, rng):
        spheres = _random_spheres(rng, 100)
        o = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
        d = rng.standard_normal((256, 3)).astype(np.float32)
        t, i = S.nearest_t(spheres, jnp.asarray(o), jnp.asarray(d),
                           1e-3, jnp.inf)
        tn, inn = _numpy_nearest(spheres, o, d, 1e-3)
        hit = np.isfinite(tn)
        np.testing.assert_allclose(np.asarray(t)[hit], tn[hit],
                                   rtol=1e-3, atol=1e-3)
        same = np.asarray(i)[hit] == inn[hit]
        assert same.mean() > 0.99  # ties may differ

    def test_analytic_axis_hit(self):
        # Ray down +z hits unit sphere at z=4 at t = 3 (front) with the
        # near-root selection of geom.rs:64-75.
        spheres = S.Spheres(
            center=jnp.asarray([[0.0, 0.0, 4.0]]),
            radius=jnp.asarray([1.0]),
            material=jnp.zeros((1,), jnp.int32))
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = S.intersect(spheres, o, d, 1e-3, jnp.inf)
        assert bool(hits.hit[0])
        assert np.isclose(float(hits.t[0]), 3.0, atol=1e-5)
        np.testing.assert_allclose(hits.normal[0], [0, 0, -1], atol=1e-5)
        assert bool(hits.front_face[0])

    def test_inside_sphere_far_root(self):
        # Origin inside: near root negative -> far root, back face.
        spheres = S.Spheres(
            center=jnp.zeros((1, 3)),
            radius=jnp.asarray([2.0]),
            material=jnp.zeros((1,), jnp.int32))
        hits = S.intersect(spheres, jnp.zeros((1, 3)),
                           jnp.asarray([[1.0, 0.0, 0.0]]), 1e-3, jnp.inf)
        assert bool(hits.hit[0])
        assert np.isclose(float(hits.t[0]), 2.0, atol=1e-5)
        assert not bool(hits.front_face[0])
        np.testing.assert_allclose(hits.normal[0], [-1, 0, 0], atol=1e-5)

    def test_t_max_clips(self):
        spheres = S.Spheres(
            center=jnp.asarray([[0.0, 0.0, 10.0]]),
            radius=jnp.asarray([1.0]),
            material=jnp.zeros((1,), jnp.int32))
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        hits = S.intersect(spheres, o, d, 1e-3, 5.0)
        assert not bool(hits.hit[0])

    def test_miss_is_inf(self):
        spheres = _random_spheres(np.random.default_rng(1), 10)
        o = jnp.asarray([[100.0, 100.0, 100.0]])
        d = jnp.asarray([[1.0, 0.0, 0.0]])
        hits = S.intersect(spheres, o, d, 1e-3, jnp.inf)
        assert not bool(hits.hit[0])
        assert np.isinf(float(hits.t[0]))


class TestFaceNormal:
    def test_flip(self):
        d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        outward = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        n, ff = set_face_normal(d, outward)
        np.testing.assert_allclose(n, [[0, 0, -1], [0, 0, 1]])
        np.testing.assert_array_equal(ff, [False, True])
