"""Scene zoo: every registered scene builds and renders a sane image."""

import numpy as np
import pytest

from mrt import scenes
from mrt.runtime.render import render


def _make(name):
    kwargs = {"aspect_ratio": 1.0}
    if name == "menger":
        kwargs["level"] = 2      # 400 cubes, not 3.2M
    if name == "sphere_grid":
        kwargs["dim"] = 6        # 144 spheres
    if name == "rtiow":
        kwargs["grid"] = 3
    return scenes.get(name)(**kwargs)


@pytest.mark.parametrize("name", scenes.names())
def test_scene_renders(name):
    scene, camera = _make(name).generate()
    film = render(scene, camera, 24, 24, spp=4, max_depth=6, seed=2)
    img = np.asarray(film.mean())
    assert np.isfinite(img).all(), f"{name}: non-finite radiance"
    assert img.min() >= 0.0
    assert img.max() > 1e-4, f"{name}: black image"


def test_cornell_light_on_ceiling():
    scene, camera = _make("cornell").generate()
    film = render(scene, camera, 32, 32, spp=8, max_depth=8, seed=2)
    img = np.asarray(film.mean())
    # Rows are bottom-up: ceiling (light) in the top rows of the array.
    top = img[-8:].mean()
    bottom = img[:8].mean()
    assert top > bottom, "ceiling light should dominate"
    # Left wall red tint, right wall green tint.
    left = img[8:24, :8]
    right = img[8:24, -8:]
    assert left[..., 0].mean() > left[..., 1].mean()
    assert right[..., 1].mean() > right[..., 0].mean()


def test_sphere_grid_center_glows():
    scene, camera = _make("sphere_grid").generate()
    film = render(scene, camera, 32, 32, spp=4, max_depth=4, seed=2)
    img = np.asarray(film.mean())
    assert img.max() > 0.5  # emissive center sphere visible


def test_menger_positions_count():
    from mrt.scenes.menger import sponge_positions
    assert sponge_positions(1).shape == (20, 3)
    assert sponge_positions(2).shape == (400, 3)
    # Level-2 positions are distinct.
    p = sponge_positions(2)
    assert len({tuple(x) for x in p.tolist()}) == 400


def test_sort_auto_rule(monkeypatch):
    """Hardware-measured thresholds (tools/probe_sort_ab.py r3): big
    instanced TLAS and big sphere-BVH scenes sort; small coherent
    scenes don't (cornell measured -52% with sorting)."""
    from mrt.geometry import spheres as sph_mod

    monkeypatch.setattr(sph_mod, "_use_pallas", lambda: True)
    cornell, _ = _make("cornell").generate()
    assert not cornell.prefers_sorted_rays()
    lucy, _ = scenes.get("lucy")(aspect_ratio=1.0, grid=5).generate()
    assert lucy.prefers_sorted_rays()          # 121 instances
    eve, _ = scenes.get("eve")(aspect_ratio=1.0).generate()
    assert eve.prefers_sorted_rays()           # 38 instances
    grid, _ = scenes.get("sphere_grid")(aspect_ratio=1.0).generate()
    assert grid.prefers_sorted_rays()          # 10k-sphere BVH
    rtiow, _ = _make("rtiow").generate()
    assert not rtiow.prefers_sorted_rays()

    # Cadence rule (tools/probe_sort_cadence.py r4): every step only on
    # heavy divergence (lucy 122 inst degrades past 1; streamed Menger
    # measured 0% at 8), else every 4 (eve +19%, sphere_grid +21%).
    assert lucy.sort_cadence() == 1
    assert eve.sort_cadence() == 4
    assert grid.sort_cadence() == 4
