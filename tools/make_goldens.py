"""(Re)generate the golden-image suite under tests/goldens/.

Run on CPU after an INTENTIONAL rendering change:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from mrt.runtime.render import render
import golden_scenes as G

out_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "goldens")
os.makedirs(out_dir, exist_ok=True)
for name, factory in G.FACTORIES.items():
    scene, camera = factory()
    film = render(scene, camera, G.SIZE, G.SIZE, spp=G.SPP,
                  max_depth=G.DEPTH, seed=G.SEED)
    path = os.path.join(out_dir, f"{name}_{G.SIZE}.npz")
    np.savez_compressed(path, sum=np.asarray(film.sum),
                        depth=np.asarray(film.depth_sum))
    print(f"{name}: mean={np.asarray(film.mean()).mean():.4f} -> {path}")
