"""Golden-image regression: a checked-in reference render must
reproduce within float-accumulation tolerance (the analogue of the
reference's committed example.png, SURVEY §4)."""

import os

import numpy as np

from mrt.scenes import get
from mrt.runtime.render import render

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "rtiow_24.npz")


def test_rtiow_golden():
    scene, camera = get("rtiow")(aspect_ratio=1.0, grid=5).generate()
    film = render(scene, camera, 24, 24, spp=8, max_depth=6, seed=5)
    gold = np.load(GOLDEN)
    # Counter-based RNG: draws are identical run to run; only float
    # reassociation across XLA versions can differ.
    np.testing.assert_allclose(np.asarray(film.sum), gold["sum"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(film.depth_sum),
                                  gold["depth"])


def test_persistent_reproduces_golden():
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass_persistent

    scene, camera = get("rtiow")(aspect_ratio=1.0, grid=5).generate()
    film = Film.create(24, 24)
    film = render_pass_persistent(scene, camera, film, 5, 0, width=24,
                                  height=24, max_depth=6, samples=8,
                                  pool=1024)
    gold = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(film.sum), gold["sum"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(film.depth_sum),
                                  gold["depth"])
