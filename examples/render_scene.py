#!/usr/bin/env python
"""Render any zoo scene with stats.

    python examples/render_scene.py cornell 512 512 64
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mrt import scenes
from mrt.runtime.render import render
from mrt.runtime.io import save_png
from mrt.utils.profiling import stats_from_film


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "rtiow"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 360
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    scene, camera = scenes.get(name)(
        aspect_ratio=width / height).generate()
    t0 = time.perf_counter()
    film = render(scene, camera, width, height, spp=spp, max_depth=16,
                  persistent=True)
    film.sum.block_until_ready()
    stats = stats_from_film(film, time.perf_counter() - t0)
    print(stats)
    out = f"{name}.png"
    save_png(out, film.to_rgb_bytes())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
