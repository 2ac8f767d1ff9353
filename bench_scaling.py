"""Multi-device scaling-efficiency harness (BASELINE.md metric 2).

Renders the RTIOW final scene tile-sharded over 1..N devices and
reports throughput + parallel efficiency.  On a pod this measures real
ICI scaling; under `--xla_force_host_platform_device_count=N` it
validates the sharding logic (CPU times are not meaningful).

    python bench_scaling.py [width height spp depth]
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax

    from mrt.scenes import get
    from mrt.parallel.mesh import make_mesh
    from mrt.parallel.render import render_sharded

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    n_dev = len(jax.devices())
    scene, camera = get("rtiow")(aspect_ratio=width / height).generate()

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    results = {}
    base = None
    for n in sizes:
        if height % n:
            continue
        mesh = make_mesh(devices=jax.devices()[:n])
        # Warmup/compile.
        film = render_sharded(scene, camera, width, height, mesh, spp=1,
                              max_depth=depth, persistent=True)
        film.sum.block_until_ready()
        t0 = time.perf_counter()
        film = render_sharded(scene, camera, width, height, mesh,
                              spp=spp, max_depth=depth, persistent=True,
                              film=None)
        film.sum.block_until_ready()
        dt = time.perf_counter() - t0
        rays = width * height * spp / dt
        if base is None:
            base = rays
        eff = rays / (base * n)
        results[n] = {"rays_per_sec": round(rays, 1),
                      "efficiency": round(eff, 4)}
        print(f"# {n} device(s): {rays / 1e6:.2f}M rays/s, "
              f"efficiency {eff:.2%}", file=sys.stderr)

    print(json.dumps({"metric": "scaling_efficiency",
                      "devices": results}))


if __name__ == "__main__":
    main()
