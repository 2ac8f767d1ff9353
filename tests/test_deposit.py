"""Pending-deposit film mode (ops/pallas_deposit): per-lane accumulate
+ predicated deposit kernel vs the per-step XLA scatter.

Unlike the (deleted) megastep kernel, this mode leaves every trajectory bit-identical
(same intersect/shade/RNG ops) — only the film accumulation grouping
changes (per-item sums deposited at death), so films must agree to
float-association tolerance everywhere.
"""

import numpy as np
import pytest

from mrt.scenes import get
from mrt.integrator.persistent import render_samples_chunked


def _render(scene, camera, w, h, pend, **kw):
    return render_samples_chunked(
        scene, camera, w, h, seed=1, sample_start=0, samples=2,
        max_depth=8, pool=2048, pend=pend, **kw)


@pytest.mark.parametrize("name,kw", [
    ("rtiow", {}),
    ("cornell", {}),
    ("rtiow", {"slots": 1024}),        # big mode: window + slab flushes
    ("cornell", {"sort_rays": 2}),     # sorter must permute the acc
])
def test_pend_matches_scatter(name, kw):
    scene, camera = get(name)(aspect_ratio=2.0).generate() \
        if name == "rtiow" else get(name)().generate()
    w, h = (128, 32) if "slots" in kw else (64, 32)
    ref_sum, ref_depth = _render(scene, camera, w, h, pend=False, **kw)
    got_sum, got_depth = _render(scene, camera, w, h, pend="interpret",
                                 **kw)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_depth),
                                  np.asarray(ref_depth))


def test_pend_rr():
    scene, camera = get("rtiow")(aspect_ratio=2.0).generate()
    ref_sum, ref_depth = _render(scene, camera, 64, 32, pend=False,
                                 rr_depth=2)
    got_sum, got_depth = _render(scene, camera, 64, 32,
                                 pend="interpret", rr_depth=2)
    np.testing.assert_allclose(np.asarray(got_sum), np.asarray(ref_sum),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_depth),
                                  np.asarray(ref_depth))


def test_pend_sharded_matches():
    from mrt.parallel.mesh import make_mesh
    from mrt.parallel.render import (render_pass_sharded_persistent,
                                     shard_film)
    from mrt.runtime.film import Film
    import jax

    scene, camera = get("rtiow")(aspect_ratio=1.0).generate()
    mesh = make_mesh(tile=4, spp=2)
    w = h = 16

    def run(pend):
        film = shard_film(Film.create(w, h), mesh)
        fn = jax.jit(lambda s, c, f: render_pass_sharded_persistent(
            s, c, f, 7, 0, width=w, height=h, samples=8, max_depth=6,
            mesh=mesh, pool=2048, pend=pend))
        return np.asarray(fn(scene, camera, film).sum)

    ref = run(False)
    got = run("interpret")
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
