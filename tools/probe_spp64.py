"""Hardware probe: the spp=64 vs spp=8 per-ray throughput gap (VERDICT
r3 #5 / r4 task 4).

bench_detail r03 showed spp=64 at 4.55M rays/s vs the 7.82M spp=8
headline.  Two suspected mechanisms, separated here:

  1. COLD PROGRAM: bench warmed only the spp=8 program; the pool is
     bucketed by spp (render_pass_persistent cap formula), so the
     single spp=64 pass paid compile + adaptive-chunk ramp inside its
     timed window.
  2. POOL BUCKET: at 1080p the cap formula admits pool 2^17 for spp=64
     (spp=8 gets the measured-optimal 2^16).

Measures, in ONE process on the real TPU: spp=8 steady (median of 3),
spp=64 pool=auto warm+steady x2, spp=64 pool=2^16 warm+steady x2.

Writes artifacts/spp64_r04.json.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

W, H, DEPTH = 1920, 1080, 50


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    from mrt.scenes import get
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("rtiow")(aspect_ratio=W / H).generate()

    def one(film, start, spp, pool=None):
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=W, height=H,
                                      max_depth=DEPTH, samples=spp,
                                      pool=pool)
        film.sum.block_until_ready()
        return film

    out = {"workload": f"rtiow {W}x{H} d{DEPTH}"}
    film = Film.create(W, H)
    start = 0

    # spp=8 reference (bench protocol).
    t0 = time.time(); film = one(film, start, 8); start += 8
    warm8 = time.time() - t0
    runs = []
    for _ in range(3):
        t0 = time.time(); film = one(film, start, 8); start += 8
        runs.append(time.time() - t0)
    dt8 = statistics.median(runs)
    m8 = W * H * 8 / dt8 / 1e6
    print(f"spp8  warm {warm8:.2f}s steady {dt8:.3f}s = {m8:.2f}M",
          flush=True)
    out["spp8"] = dict(warm_s=round(warm8, 2), steady_s=round(dt8, 3),
                       mrays=round(m8, 2))

    for label, pool in (("spp64_auto", None), ("spp64_p16", 1 << 16)):
        t0 = time.time(); film = one(film, start, 64, pool); start += 64
        warm = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time(); film = one(film, start, 64, pool)
            start += 64
            times.append(time.time() - t0)
        dt = min(times)
        m = W * H * 64 / dt / 1e6
        print(f"{label} warm {warm:.2f}s steady {dt:.3f}s = {m:.2f}M",
              flush=True)
        out[label] = dict(warm_s=round(warm, 2),
                          steady_s=round(dt, 3), mrays=round(m, 2))

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "spp64_r04.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", art, flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
