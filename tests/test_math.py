"""Unit tests for mrt.math: vectors, matrices, RNG, sampling."""

import numpy as np
import jax.numpy as jnp
import pytest

from mrt.math import vec, m4, sampling
from mrt.math.rng import Sampler, pcg4d


class TestVec:
    def test_dot_cross_length(self, rng):
        a = rng.standard_normal((64, 3)).astype(np.float32)
        b = rng.standard_normal((64, 3)).astype(np.float32)
        np.testing.assert_allclose(vec.dot(a, b), (a * b).sum(-1), rtol=1e-5)
        np.testing.assert_allclose(vec.cross(a, b), np.cross(a, b),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(vec.length(a),
                                   np.linalg.norm(a, axis=-1), rtol=1e-5)

    def test_unit(self, rng):
        a = rng.standard_normal((32, 3)).astype(np.float32) * 10
        u = vec.unit(a)
        np.testing.assert_allclose(vec.length(u), 1.0, rtol=1e-5)

    def test_reflect(self):
        # Reflecting (1,-1,0) about +y gives (1,1,0) (math.rs:115-117).
        v = vec.v3(1.0, -1.0, 0.0)
        n = vec.v3(0.0, 1.0, 0.0)
        np.testing.assert_allclose(vec.reflect(v, n), [1.0, 1.0, 0.0],
                                   atol=1e-6)

    def test_refract_snell(self):
        # Check Snell's law: n1 sin(t1) == n2 sin(t2) (math.rs:119-124).
        theta1 = 0.3
        uv = vec.v3(np.sin(theta1), -np.cos(theta1), 0.0)
        n = vec.v3(0.0, 1.0, 0.0)
        eta = jnp.asarray(1.0 / 1.5)
        out = vec.refract(uv, n, eta)
        sin_t2 = float(out[0]) / float(vec.length(out))
        assert np.isclose(sin_t2, np.sin(theta1) / 1.5, atol=1e-6)

    def test_near_zero(self):
        assert bool(vec.near_zero(vec.v3(1e-6, -1e-6, 0.0)))
        assert not bool(vec.near_zero(vec.v3(1e-3, 0.0, 0.0)))

    def test_hsl_to_rgb(self, rng):
        # Matches the reference formula exactly — note math.rs:126-143
        # omits the standard `+ (l - c/2)` lightness offset, so e.g.
        # l=1 maps to black, not white.  Scenes depend on this quirk.
        def ref_hsl(h, s, l):
            h = min(max(h, 0.0), 1.0) * 360.0
            s = min(max(s, 0.0), 1.0)
            l = min(max(l, 0.0), 1.0)
            c = (1.0 - abs(2.0 * l - 1.0)) * s
            hp = h / 60.0
            x = c * (1.0 - abs((hp % 2.0) - 1.0))
            for lo, val in [(0, (c, x, 0)), (1, (x, c, 0)), (2, (0, c, x)),
                            (3, (0, x, c)), (4, (x, 0, c)), (5, (c, 0, x))]:
                if lo <= hp <= lo + 1:
                    return np.array(val)
            return np.zeros(3)

        for h, s, l in rng.random((64, 3)):
            np.testing.assert_allclose(
                np.asarray(vec.hsl_to_rgb(vec.v3(h, s, l))),
                ref_hsl(h, s, l), atol=1e-5,
                err_msg=f"hsl=({h},{s},{l})")


class TestM4:
    def test_turns_convention(self):
        # Quarter turn about z maps +x to +y (math.rs:184-215 uses turns).
        m = m4.rotate_z(0.25)
        np.testing.assert_allclose(
            m4.transform_vector(m, vec.v3(1.0, 0.0, 0.0)), [0, 1, 0],
            atol=1e-6)

    def test_trs_inverse(self, rng):
        t = rng.standard_normal(3).astype(np.float32)
        r = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        s = rng.uniform(0.5, 2.0, 3).astype(np.float32)
        fwd = m4.trs(t, r, s)
        inv = m4.trs_inverse(t, r, s)
        np.testing.assert_allclose(fwd @ inv, np.eye(4), atol=1e-4)

    def test_transform_point_vs_vector(self):
        m = m4.translation((1.0, 2.0, 3.0))
        p = vec.v3(0.0, 0.0, 0.0)
        np.testing.assert_allclose(m4.transform_point(m, p), [1, 2, 3],
                                   atol=1e-6)
        np.testing.assert_allclose(m4.transform_vector(m, p), [0, 0, 0],
                                   atol=1e-6)


class TestRng:
    def test_deterministic(self):
        ids = jnp.arange(128, dtype=jnp.uint32)
        a = Sampler(7, ids, salt=3).next4()
        b = Sampler(7, ids, salt=3).next4()
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_range_and_uniformity(self):
        ids = jnp.arange(1 << 14, dtype=jnp.uint32)
        u = np.asarray(Sampler(1, ids).next1())
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.std() - np.sqrt(1 / 12)) < 0.01

    def test_streams_decorrelated(self):
        ids = jnp.arange(1 << 14, dtype=jnp.uint32)
        s = Sampler(1, ids)
        u1 = np.asarray(s.next1())
        u2 = np.asarray(s.next1())      # consecutive draws
        u3 = np.asarray(Sampler(2, ids).next1())  # different seed
        assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.02
        assert abs(np.corrcoef(u1, u3)[0, 1]) < 0.02
        assert abs(np.corrcoef(u1[:-1], u1[1:])[0, 1]) < 0.02

    def test_pcg4d_shape(self):
        x = jnp.zeros((4, 5), jnp.uint32)
        outs = pcg4d(x, x, x, x)
        assert all(o.shape == (4, 5) for o in outs)


class TestSampling:
    def _uniforms(self, n):
        ids = jnp.arange(n, dtype=jnp.uint32)
        return Sampler(3, ids).next4()

    def test_unit_vector(self):
        u1, u2, _, _ = self._uniforms(1 << 14)
        v = np.asarray(sampling.unit_vector(u1, u2))
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0,
                                   rtol=1e-5)
        assert np.all(np.abs(v.mean(0)) < 0.02)  # isotropy

    def test_in_unit_sphere(self):
        u1, u2, u3, _ = self._uniforms(1 << 14)
        p = np.asarray(sampling.in_unit_sphere(u1, u2, u3))
        r = np.linalg.norm(p, axis=-1)
        assert r.max() <= 1.0
        # Uniform ball: E[r^3] == 1/2.
        assert abs((r ** 3).mean() - 0.5) < 0.02

    def test_in_unit_disk(self):
        u1, u2, _, _ = self._uniforms(1 << 14)
        p = np.asarray(sampling.in_unit_disk(u1, u2))
        assert np.all(p[:, 2] == 0.0)
        r = np.linalg.norm(p[:, :2], axis=-1)
        assert r.max() <= 1.0
        # Uniform disk: E[r^2] == 1/2.
        assert abs((r ** 2).mean() - 0.5) < 0.02


class TestBatchedTransforms:
    def test_batch_matches_single(self, rng):
        from mrt.math import m4
        t = rng.standard_normal((32, 3)).astype(np.float32)
        r = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
        s = rng.uniform(0.5, 2.0, (32, 3)).astype(np.float32)
        fb = m4.trs_batch_np(t, r, s)
        ib = m4.trs_inverse_batch_np(t, r, s)
        for i in (0, 7, 31):
            np.testing.assert_allclose(
                fb[i], np.asarray(m4.trs(t[i], r[i], s[i])),
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                ib[i], np.asarray(m4.trs_inverse(t[i], r[i], s[i])),
                rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(fb @ ib, np.tile(np.eye(4), (32, 1, 1)),
                                   atol=1e-4)
