"""Instrument the slot-window scheduler on CPU at scaled-down ratios.

Mirrors the hardware config (pool=2^17, slots=2^19, spp=8, depth 50)
at 1/64 scale and logs per-body active%, next_work, flushed_q, min_live
to find where lanes starve (probe_slots.py saw 3.1% active on TPU).
"""
import os

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("MRT_NO_COMPILE_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

from mrt.scenes import get
from mrt.integrator import persistent as P

W, H = 256, 128
DEPTH = 50
SPP = 8
POOL = 2048
SLOTS = 8192  # slots = 4x pool, same ratio as 2^19 vs 2^17

scene, camera = get("rtiow")(aspect_ratio=W / H).generate()
npix = W * H
seed = 1

total, make_rays, step, maybe_flush, finalize, layout = P._build(
    scene, camera, W, H, seed, 0, jnp.uint32(SPP), DEPTH, POOL,
    0, None, 1, None, SLOTS)
slots_eff, slab, npix_pad, big_mode = layout
print(f"layout: slots={slots_eff} slab={slab} npix_pad={npix_pad} "
      f"big={big_mode} total={npix*SPP}")

film = P._pack_film(jnp.zeros((npix, 3), jnp.float32),
                    jnp.zeros((npix,), jnp.int32), npix_pad)
dest = jnp.zeros((slots_eff, 4), jnp.float32)
init_limit = jnp.int32(slots_eff) * jnp.uint32(SPP)
state = P._init_state(make_rays, POOL, dest, jnp.float32(0),
                      jnp.int32(0), init_limit)

body_step = jax.jit(lambda s: jax.lax.fori_loop(
    0, P.FLUSH_STEPS, lambda i, x: step(x), s))
flush = jax.jit(maybe_flush)

tot = npix * SPP
for it in range(400):
    state = body_step(state)
    state, film = flush(state, film)
    state, film = flush(state, film)
    item = np.asarray(state[0])
    active = (item < tot).mean()
    nw = int(np.asarray(state[6]))
    fq = int(np.asarray(state[8]))
    q = np.clip(item, 0, tot - 1) // SPP
    live_q = q[item < tot]
    ml = int(live_q.min()) if live_q.size else -1
    limit = min(tot, (fq + slots_eff) * SPP)
    if it % 5 == 0 or active < 0.5:
        print(f"[{it:4d}] active={active*100:5.1f}% nw={nw}/{tot} "
              f"fq={fq}/{npix} min_live={ml} limit={limit} "
              f"gate_slack={limit-nw}")
    if nw >= tot and active == 0.0:
        print("drained at body", it)
        break

film = jax.jit(finalize)(state, film)
fs, ds = P._unpack_film(film, npix)
print("mean film:", float(np.asarray(fs).mean()))
print("depth sum:", int(np.asarray(ds).sum()))
