"""Pending-deposit film mode (ops/pallas_deposit): per-lane accumulate
+ predicated deposit kernel vs the per-step XLA scatter.

Unlike the megastep, this mode leaves every trajectory bit-identical
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
