"""/verify drive: end-to-end renders on the real TPU in one process."""
import time

import jax

print("devices:", jax.devices(), flush=True)

from mrt.scenes import get
from mrt.runtime.render import render
from mrt.runtime.film import DisplayMode
from mrt.runtime.io import save_png
from mrt.runtime.denoise import denoise
import jax.numpy as jnp
import numpy as np

t0 = time.time()
scene, camera = get("rtiow")(aspect_ratio=16 / 9).generate()
film = render(scene, camera, 320, 180, spp=16, max_depth=16, seed=1,
              with_aov=True, persistent=True)
print(f"rtiow 16spp: {time.time()-t0:.1f}s", flush=True)
save_png("/tmp/v_out.png", film.to_rgb_bytes())
save_png("/tmp/v_depth.png", film.to_rgb_bytes(DisplayMode.DEPTH))
save_png("/tmp/v_denoise.png", film.to_rgb_bytes(
    DisplayMode.DENOISE,
    denoiser=lambda rgb, a, n: denoise(jnp.asarray(rgb), jnp.asarray(a),
                                       jnp.asarray(n))))

# NEE+MIS on cornell (this round's estimator change), hardware.
t0 = time.time()
sc = get("cornell")(aspect_ratio=1.0)
scene2, camera2 = sc.generate()
from mrt.geometry.scene import attach_lights
scene2 = attach_lights(scene2)
film2 = render(scene2, camera2, 256, 256, spp=16, max_depth=8, seed=1,
               persistent=True)
print(f"cornell NEE-MIS 16spp: {time.time()-t0:.1f}s", flush=True)
save_png("/tmp/v_cornell.png", film2.to_rgb_bytes())

# Probe: unknown scene raises with the list.
try:
    get("nope")
    print("PROBE FAIL: no KeyError")
except KeyError as e:
    print("unknown-scene probe ok:", str(e)[:80])

print("VERIFY_DRIVE_OK", flush=True)
