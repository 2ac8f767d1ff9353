"""Round-5 decision probes (one orchestrator, env-isolated subprocesses).

  skip   : RTIOW spp64 with the film update REMOVED (MRT_FILM_SKIP=1,
           wrong output) — measures how much of the serial scatter's
           profiled 1.3-1.8 ms/step XLA actually hides behind the
           rest of the step.  If step time barely moves, the "scatter
           floor" headroom in the r3 roofline is overlap-hidden and
           no deposit mechanism can claim it.
  base   : same workload, untouched (paired reference).
  kernel : standalone ops/pallas_onehot timing at production shape.
  eve0/1 : eve 480x270 d16 spp16, MRT_BG_COMPACT off/on (bit-exact
           miss-lane compaction of the envmap eval).

    python tools/probe_r05b.py [names...]
"""
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

VARIANTS = {
    "base": {},
    "skip": {"MRT_FILM_SKIP": "1"},
    "kernel": {},
    "eve0": {"MRT_BG_COMPACT": "0"},
    "eve1": {"MRT_BG_COMPACT": "1"},
}


def run_variant(name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mrt.scenes import get

    if name == "kernel":
        from mrt.ops import pallas_onehot

        rng = np.random.default_rng(0)
        P, W = 1 << 17, 8192
        idx = jnp.asarray(rng.integers(0, W, P).astype(np.int32))
        parts = jnp.asarray(
            rng.standard_normal((P, 12)).astype(np.float32))
        f = jax.jit(lambda i, p: pallas_onehot.onehot_deposit(i, p, W))
        f(idx, parts).block_until_ready()
        runs = []
        for _ in range(20):
            t0 = time.perf_counter()
            f(idx, parts).block_until_ready()
            runs.append(time.perf_counter() - t0)
        print(json.dumps({"name": name, "P": P, "W": W,
                          "ms": round(min(runs) * 1e3, 3)}), flush=True)
        return

    if name in ("base", "skip"):
        from mrt.integrator.persistent import render_samples_chunked

        scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
        W_, H_, spp, pool = 1920, 1080, 64, 1 << 17

        def one(start):
            s, d = render_samples_chunked(
                scene, camera, W_, H_, 1, start, spp, max_depth=50,
                pool=pool)
            jax.block_until_ready(s)
            return s

        one(0)
        runs = []
        st = spp
        for _ in range(3):
            t0 = time.perf_counter()
            s = one(st)
            runs.append(time.perf_counter() - t0)
            st += spp
        dt = statistics.median(runs)
        print(json.dumps({
            "name": name, "median_s": round(dt, 3),
            "mrays": round(W_ * H_ * spp / dt / 1e6, 3)}), flush=True)
        return

    # eve0 / eve1
    from mrt.runtime.render import render_pass_persistent
    from mrt.runtime.film import Film

    scene, camera = get("eve")(aspect_ratio=480 / 270).generate()
    W_, H_, spp = 480, 270, 16

    def one(film, start):
        film = render_pass_persistent(scene, camera, film, 1, start,
                                      width=W_, height=H_, max_depth=16,
                                      samples=spp)
        film.sum.block_until_ready()
        return film

    film = one(Film.create(W_, H_), 0)
    runs = []
    st = spp
    for _ in range(3):
        t0 = time.perf_counter()
        film = one(film, st)
        runs.append(time.perf_counter() - t0)
        st += spp
    dt = statistics.median(runs)
    print(json.dumps({
        "name": name, "median_s": round(dt, 3),
        "mrays": round(W_ * H_ * spp / dt / 1e6, 3),
        "film_mean": float(jnp.mean(film.sum)) / float(film.samples),
    }), flush=True)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    rows = []
    for name in names:
        env = dict(os.environ)
        env.pop("MRT_FILM_SKIP", None)
        env.pop("MRT_BG_COMPACT", None)
        env.update(VARIANTS[name])
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", name],
            env=env, cwd=ROOT, capture_output=True, text=True)
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(name, out[-1] if out else f"FAILED rc={r.returncode}: "
              f"{r.stderr[-300:]}", flush=True)
        if out:
            rows.append(json.loads(out[-1]))
    with open(os.path.join(ROOT, "artifacts", "probe_r05b.json"),
              "w") as f:
        json.dump(rows, f, indent=1)
    print("OK", flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        run_variant(sys.argv[2])
    else:
        main()
