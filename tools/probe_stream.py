"""Hardware probes for the HBM-streamed packet kernel design.

Probe A: HBM->SMEM async_copy of a dynamically-offset page (f32 + i32).
Probe B: conditional DMA (inside lax.cond) within a while_loop body --
         the software-cache pattern the streamed TLAS kernel uses.
Probe C: SMEM scratch allocation sizes (budget boundary).

Run CPU-interpret first (logic), then on the TPU (Mosaic legality).
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAGE = 256


def probe_a(interpret):
    def kernel(f_hbm, i_hbm, out, fpage, ipage, sem):
        def body(k, acc):
            dma1 = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(k * PAGE, PAGE)], fpage, sem.at[0])
            dma2 = pltpu.make_async_copy(
                i_hbm.at[:, pl.ds(k * PAGE, PAGE)], ipage, sem.at[1])
            dma1.start(); dma2.start()
            dma1.wait(); dma2.wait()
            return (acc + fpage[1, 7]
                    + ipage[0, 3].astype(jnp.float32))
        acc = jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))
        out[0] = acc

    f = np.arange(8 * 4 * PAGE, dtype=np.float32).reshape(8, 4 * PAGE)
    i = np.arange(2 * 4 * PAGE, dtype=np.int32).reshape(2, 4 * PAGE)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((8, PAGE), jnp.float32),
                        pltpu.SMEM((2, PAGE), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(f, i)
    expect = sum(f[1, k * PAGE + 7] + i[0, k * PAGE + 3] for k in range(4))
    ok = abs(float(out[0]) - expect) < 1e-3
    print(f"probe_a interpret={interpret}: out={float(out[0])} expect={expect} ok={ok}")
    return ok


def probe_b(interpret):
    """Software cache: while_loop walks a chain of indices; each access
    checks a 2-slot page cache; miss DMAs the page (inside lax.cond)."""
    N = 4 * PAGE

    def kernel(chain_hbm, out, page0, page1, tags, sem):
        # chain_hbm is (2, N): row 0 = the chain, row 1 unused — 1D HBM
        # memrefs tile at (1024,) and reject 256-entry slices (probed).
        tags[0] = -1
        tags[1] = -1
        tags[2] = 0  # round-robin counter

        def read(e):
            page = e // PAGE

            def hit0(_):
                return jnp.int32(0)

            def check1(_):
                return jax.lax.cond(tags[1] == page,
                                    lambda _: jnp.int32(1),
                                    miss, None)

            def miss(_):
                slot = tags[2] % 2
                tags[2] = tags[2] + 1

                def fill(slot_ref, tag_idx):
                    dma = pltpu.make_async_copy(
                        chain_hbm.at[:, pl.ds(page * PAGE, PAGE)],
                        slot_ref, sem)
                    dma.start()
                    dma.wait()

                def fill0(_):
                    fill(page0, 0)
                    tags[0] = page
                    return jnp.int32(0)

                def fill1(_):
                    fill(page1, 1)
                    tags[1] = page
                    return jnp.int32(1)

                return jax.lax.cond(slot == 0, fill0, fill1, None)

            slot = jax.lax.cond(tags[0] == page, hit0, check1, None)
            off = e - page * PAGE
            return jax.lax.cond(slot == 0,
                                lambda _: page0[0, off],
                                lambda _: page1[0, off], None)

        def cond(c):
            return c[0] >= 0

        def body(c):
            e, n = c
            return read(e), n + 1

        e, n = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        out[0] = n

    rng = np.random.default_rng(0)
    # Random chain over N entries, terminated with -1.
    perm = rng.permutation(N).astype(np.int32)
    chain = np.full((N,), -1, np.int32)
    for a, b in zip(perm[:-1], perm[1:]):
        chain[a] = b
    chain[perm[-1]] = -1
    # chain starts at 0: ensure perm[0] == 0
    start = np.where(perm == 0)[0][0]
    perm = np.roll(perm, -start)
    chain = np.full((N,), -1, np.int32)
    for a, b in zip(perm[:-1], perm[1:]):
        chain[a] = b

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2, PAGE), jnp.int32),
                        pltpu.SMEM((2, PAGE), jnp.int32),
                        pltpu.SMEM((4,), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(np.stack([chain, chain]))
    ok = int(out[0]) == N
    print(f"probe_b interpret={interpret}: visited={int(out[0])} expect={N} ok={ok}")
    return ok


def probe_c(interpret, kb):
    n = kb * 1024 // 4

    def kernel(x, out, scratch):
        scratch[0] = x[0]
        scratch[n - 1] = x[0] * 2.0
        out[0] = scratch[0] + scratch[n - 1]

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
            scratch_shapes=[pltpu.SMEM((n,), jnp.float32)],
            interpret=interpret,
        )(jnp.ones((1,), jnp.float32))
        ok = abs(float(out[0]) - 3.0) < 1e-6
        print(f"probe_c {kb}KB: ok={ok}")
        return ok
    except Exception as e:
        print(f"probe_c {kb}KB: FAIL {type(e).__name__}: {str(e)[:200]}")
        return False


if __name__ == "__main__":
    interpret = "--tpu" not in sys.argv
    print("devices:", jax.devices())
    probe_a(interpret)
    probe_b(interpret)
    if not interpret:
        for kb in (128, 256, 384, 448, 512):
            probe_c(False, kb)
