"""Pallas TPU kernel: masked film deposit (scatter-add of dying lanes).

The persistent integrator's film scatter — `dest.at[slot].add(vals)`
with pool rows — lowers to a serial per-row loop on TPU (~0.95 ms/step
at pool 2^16) that runs for EVERY lane EVERY step.  With a per-lane
pending accumulator in the integrator (contributions accumulate
elementwise until the path dies), only ~pool/avg_depth lanes actually
need to deposit per step; this kernel runs the same serial
read-modify-write but PREDICATED on the death mask, skipping ~2/3 of
rows (and whole 8-lane groups with no deaths).

Standalone deposit kernel usable with every scene type
(mesh/TLAS/EVE included).  (The fused megastep kernel that shared this
staging was deleted in round 4 after losing its production-dispatch
A/B — artifacts/megastep_r04.json; git history has the kernel.)

dest layout: the (slots, 4) slot accumulator reshaped (slots*4//128,
128) so rows are full lanes; the in-row offset vector is built with
iota compares (no dynamic lane indexing).  Scalar reads come from an
SMEM staging copy (dynamic-indexed scalar loads are an SMEM
operation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK_ROWS = 8
BLOCK = BLOCK_ROWS * LANE


def _kernel(slot_in, val_in, die_in, dest_in, dest_out,
            tbuf_ref, sbuf_ref, dep_sem):
    die = die_in[:].astype(jnp.float32)
    dep_t = jnp.transpose(die, (1, 0))
    slot_t = jnp.transpose(slot_in[:].astype(jnp.float32), (1, 0))
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    tbuf_ref[0:LANE, 0:8] = dep_t
    tbuf_ref[0:LANE, 8:16] = slot_t
    for ch in range(4):
        v_t = jnp.transpose(val_in[ch], (1, 0))
        tbuf_ref[0:LANE, 16 + 8 * ch:24 + 8 * ch] = v_t
    cp = pltpu.make_async_copy(tbuf_ref, sbuf_ref, dep_sem)
    cp.start()
    cp.wait()

    def drow(c, carry):
        anyd = jnp.sum(tbuf_ref[pl.ds(c, 1), 0:8]) > 0.0

        @pl.when(anyd)
        def _rows():
            for r in range(BLOCK_ROWS):
                do = sbuf_ref[c, r] != 0.0

                @pl.when(do)
                def _one():
                    sl = sbuf_ref[c, 8 + r].astype(jnp.int32)
                    row = jax.lax.shift_right_logical(sl, 5)
                    sub = (sl & 31) * 4
                    w0 = sbuf_ref[c, 16 + r]
                    w1 = sbuf_ref[c, 24 + r]
                    w2 = sbuf_ref[c, 32 + r]
                    w3 = sbuf_ref[c, 40 + r]
                    vec = (jnp.where(lane_i == sub, w0, 0.0)
                           + jnp.where(lane_i == sub + 1, w1, 0.0)
                           + jnp.where(lane_i == sub + 2, w2, 0.0)
                           + jnp.where(lane_i == sub + 3, w3, 0.0))
                    cur = dest_out[pl.ds(row, 1), :]
                    dest_out[pl.ds(row, 1), :] = cur + vec
        return carry

    jax.lax.fori_loop(0, LANE, drow, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _launch(slot2, val4, die2, dest2, interpret=False):
    rows = slot2.shape[0]
    nblk = rows // BLOCK_ROWS
    grid = (nblk,)
    bspec = lambda: pl.BlockSpec((BLOCK_ROWS, LANE), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((4, BLOCK_ROWS, LANE), lambda b: (0, b, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((dest2.shape[0], LANE), lambda b: (0, 0),
                         memory_space=pltpu.VMEM)

    vma = frozenset()
    for x in (slot2, val4, die2, dest2):
        vma = vma | frozenset(getattr(jax.typeof(x), "vma", ()))
    shp = (jax.ShapeDtypeStruct(dest2.shape, jnp.float32, vma=vma)
           if vma else jax.ShapeDtypeStruct(dest2.shape, jnp.float32))

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[bspec(), vspec, bspec(), dspec],
        out_specs=dspec,
        out_shape=shp,
        input_output_aliases={3: 0},
        scratch_shapes=[pltpu.VMEM((LANE, 48), jnp.float32),
                        pltpu.SMEM((LANE, 48), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(slot2, val4, die2, dest2)


def deposit_add(dest, slot, val, die, interpret=False):
    """dest.at[slot].add(val * die) via the predicated RMW kernel.

    dest: (slots, 4) f32 with slots % 32 == 0; slot: (pool,) int32
    (< slots); val: (pool, 4) f32; die: (pool,) bool.  pool % 1024 == 0.
    Returns the updated dest.
    """
    pool = slot.shape[0]
    rows = pool // LANE
    slot2 = jnp.where(die, slot, 0).reshape(rows, LANE)
    val4 = val.T.reshape(4, rows, LANE)
    die2 = die.reshape(rows, LANE)
    # Zero-value deposits can skip entirely.
    die2 = die2 & jnp.any(
        val4 != 0.0, axis=0)
    dest2 = dest.reshape(-1, LANE)
    out = _launch(slot2, val4, die2.astype(jnp.int32), dest2,
                  interpret=interpret)
    return out.reshape(dest.shape)


def usable(pool, slots_rows):
    """Static gate: shapes the kernel layout supports."""
    return (pool % BLOCK == 0
            and (slots_rows * 4) % LANE == 0)
