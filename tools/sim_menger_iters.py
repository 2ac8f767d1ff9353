"""Host-side (numpy) simulation of the shared-cursor packet traversal
on Menger L5 bake=2: counts EXACT kernel iterations (tlas node visits,
blas node visits, instance enters, page-cache misses) per 1024-ray
packet for scanline vs morton-tiled ray order, at bounce 0.

This tells whether the streamed kernel's ~20ms/packet is iteration
COUNT (attack: tree quality / packet size / ray order) or per-iteration
COST (attack: loop unrolling, cache-lookup overhead).  Runs entirely on
CPU — no TPU needed.
"""
import time

import numpy as np

BLOCK = 1024
PAGE = 256
SLOTS = 8
N_PACKETS = 16   # simulate a spread subset (python loop is slow)


def main():
    import os
    os.environ.setdefault("MRT_NO_COMPILE_CACHE", "1")
    from mrt.scenes.menger import Menger
    from mrt.math.rng import Sampler
    import jax.numpy as jnp

    W, H = 480, 270
    scene, camera = Menger(level=5, bake=2).generate()
    tlas = scene.tlas

    n = W * H
    pix = jnp.arange(n, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    cam = Sampler(1, pix, salt=0xC0FFEE)
    jx, jy, du, dv = cam.next4()
    o, d = camera.rays((px + jx) / W, (py + jy) / H, du, dv)
    o = np.asarray(o)
    d = np.asarray(d)

    mx = (pix % W).astype(jnp.uint32)
    my = (pix // W).astype(jnp.uint32)
    code = np.zeros(n, np.uint32)
    mxa, mya = np.asarray(mx), np.asarray(my)
    for b in range(6):
        code |= (((mxa >> b) & 1) << (2 * b)) | (((mya >> b) & 1)
                                                 << (2 * b + 1))
    key = code | ((mxa >> 6) << 18) | ((mya >> 6) << 24)
    perm = np.argsort(key, kind="stable")

    T = dict(
        bmin=np.asarray(tlas.t_bmin), bmax=np.asarray(tlas.t_bmax),
        inst=np.asarray(tlas.t_inst), esc=np.asarray(tlas.t_escape),
        inv=np.asarray(tlas.inv_transform),
        broot=np.asarray(tlas.blas_root), bend=np.asarray(tlas.blas_end),
        nbmin=np.asarray(tlas.bmin), nbmax=np.asarray(tlas.bmax),
        ncount=np.asarray(tlas.count), nesc=np.asarray(tlas.escape),
    )
    n_tlas = T["bmin"].shape[0]
    print(f"tlas nodes {n_tlas}, instances {T['inv'].shape[0]}, "
          f"blas nodes {T['nbmin'].shape[0]}", flush=True)

    def sim_packet(po, pd, use_mask=False):
        t_min = 1e-3
        bt = np.full(po.shape[0], np.inf, np.float32)
        it_t = it_b = enters = 0
        misses = 0
        tags = [-1] * SLOTS
        rr = 0
        def touch(page):
            nonlocal misses, rr, tags
            if page not in tags:
                tags[rr % SLOTS] = page
                rr += 1
                misses += 1
        tnode = 0
        while tnode < n_tlas:
            it_t += 1
            touch(tnode // PAGE)
            inv_d = 1.0 / pd
            t0 = (T["bmin"][tnode] - po) * inv_d
            t1 = (T["bmax"][tnode] - po) * inv_d
            near = np.maximum(np.minimum(t0, t1).max(-1), t_min)
            far = np.minimum(np.maximum(t0, t1).min(-1), bt)
            lane_hit = near <= far
            any_hit = bool(lane_hit.any())
            leaf = T["inst"][tnode]
            if any_hit and leaf >= 0:
                enters += 1
                emask = lane_hit if use_mask else np.ones_like(lane_hit)
                m = T["inv"][leaf]
                lo = po @ m[:3, :3].T + m[:3, 3]
                ld = pd @ m[:3, :3].T
                bn, be = int(T["broot"][leaf]), int(T["bend"][leaf])
                inv_ld = 1.0 / ld
                while bn < be:
                    it_b += 1
                    t0 = (T["nbmin"][bn] - lo) * inv_ld
                    t1 = (T["nbmax"][bn] - lo) * inv_ld
                    nr = np.maximum(np.minimum(t0, t1).max(-1), t_min)
                    fr = np.minimum(np.maximum(t0, t1).min(-1), bt)
                    ah = bool(((nr <= fr) & emask).any())
                    cnt = T["ncount"][bn]
                    if ah and cnt > 0:
                        # Proxy for the tri hit: lanes whose ray enters
                        # a leaf box clamp bt to the box far plane
                        # (Menger leaves are near-solid blocks).
                        bt = np.minimum(bt, np.where(nr <= fr, fr,
                                                     np.inf))
                    bn = bn + 1 if (ah and cnt == 0) else int(T["nesc"][bn])
                tnode = tnode + 1
            else:
                tnode = tnode + 1 if any_hit else int(T["esc"][tnode])
        return it_t, it_b, enters, misses

    for name, order in (("scan", np.arange(n)), ("morton", perm)):
        for mask in (False, True):
            oo, dd = o[order], d[order]
            idxs = np.linspace(0, n // BLOCK - 1, N_PACKETS).astype(int)
            tot = np.zeros(4, np.int64)
            t0 = time.time()
            for k in idxs:
                r = sim_packet(oo[k * BLOCK:(k + 1) * BLOCK],
                               dd[k * BLOCK:(k + 1) * BLOCK], mask)
                tot += np.asarray(r, np.int64)
            tot = tot / N_PACKETS
            print(f"{name:7s} mask={int(mask)}: tlas_iters {tot[0]:8.0f}"
                  f"  blas_iters {tot[1]:8.0f}  enters {tot[2]:7.0f}  "
                  f"misses {tot[3]:6.0f}   ({time.time()-t0:.0f}s)",
                  flush=True)
    print("SIM_OK", flush=True)


if __name__ == "__main__":
    main()
