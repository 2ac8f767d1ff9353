"""Golden-image regression across every major render path.

Checked-in reference renders (tests/goldens/*.npz, regenerate with
tools/make_goldens.py) must reproduce within float-accumulation
tolerance — the analogue of the reference's committed example.png
(SURVEY §4).  Round 1 had a single spheres+sky golden; this suite
additionally locks the TLAS/instancing path, the texture atlas with
alpha cutouts, EVE packed-PBR shading, volumes (sphere + mesh bounds),
MIS-NEE, and the baked Menger block with its cube-map environment.

RNG draws are counter-based and identical run to run; only float
reassociation across XLA versions should ever differ.
"""

import os

import numpy as np
import pytest

from mrt.runtime.render import render

import golden_scenes as G

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("name", sorted(G.FACTORIES))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}_{G.SIZE}.npz")
    assert os.path.exists(path), f"missing golden {path}; run " \
        "tools/make_goldens.py"
    scene, camera = G.FACTORIES[name]()
    film = render(scene, camera, G.SIZE, G.SIZE, spp=G.SPP,
                  max_depth=G.DEPTH, seed=G.SEED)
    gold = np.load(path)
    np.testing.assert_allclose(np.asarray(film.sum), gold["sum"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(film.depth_sum),
                                  gold["depth"])


def test_persistent_reproduces_golden():
    from mrt.runtime.film import Film
    from mrt.runtime.render import render_pass_persistent

    scene, camera = G.rtiow()
    film = Film.create(G.SIZE, G.SIZE)
    film = render_pass_persistent(scene, camera, film, G.SEED, 0,
                                  width=G.SIZE, height=G.SIZE,
                                  max_depth=G.DEPTH, samples=G.SPP,
                                  pool=1024)
    gold = np.load(os.path.join(GOLDEN_DIR, f"rtiow_{G.SIZE}.npz"))
    np.testing.assert_allclose(np.asarray(film.sum), gold["sum"],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(film.depth_sum),
                                  gold["depth"])
