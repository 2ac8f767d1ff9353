"""Pallas TPU kernel: two-level one-hot deposit (segment-sum by row id).

    out[r, c] = sum over lanes p with idx[p] == r of parts[p, c]

This is the MXU replacement for XLA's serial per-row scatter loop
(~10-14 ns/row at pool 2^17 — the RTIOW roofline's binding
constraint) and the engine under BOTH ops/film_deposit (windowed film
deposit) and ops/compact (bit-exact masked lane compaction).

Why a kernel: the XLA formulation needs the Kronecker operand
A[p, (l, c)] = onehot_lo[p, l] * parts[p, c] fused into the dot's rhs
load; XLA:TPU materialises it to HBM instead (~400-500 MB/step at
pool 2^17 — measured as a flat ~2x step slowdown, W-independent,
artifacts/film_mm_r05.json).  Here A lives one (BP, L*C) block at a
time in VMEM.

The factorisation idx = hi*L + lo keeps one-hot generation at
P*(L + n_rows/L) comparisons AND gives the dot a fat N dimension
(L*C >= 1536) so the MXU runs near its rate despite C being tiny;
the output block (n_rows/L, L*C) f32 stays resident in VMEM across
the P-block grid (~0.5 MB).

Exactness: each one-hot row has exactly one 1.0; bf16 products
against split terms are exact; accumulation is f32.  Compaction
(bijective idx) is bit-exact; multi-lane rows reassociate f32 adds.
Negative idx (or idx >= n_rows) matches no one-hot column and is
dropped — callers encode "skip this lane" as idx = -1.

The reference has no analogue (single-ray recursion,
src/main.rs:629-638 merges whole frames); this cost is a TPU artifact
of wavefront film accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

L = 128          # low-level one-hot width == lane count
# Lanes per grid step: 2048 hardware-swept (11.91 vs 11.76 Mrays/s at
# 512 on the named workload; the ~6 MB ⊗ block still fits VMEM).
BP = int(os.environ.get("MRT_ONEHOT_BP", "2048"))


def _kernel(idx_row_ref, idx_col_ref, parts_ref, out_ref, *, whb, nc, bp):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    j = pl.program_id(0)                            # output row block
    idx_col = idx_col_ref[...]                      # (BP, 1) int32
    lo = idx_col & (L - 1)
    ohlo = (lo == jax.lax.broadcasted_iota(
        jnp.int32, (bp, L), 1)).astype(jnp.bfloat16)        # (bp, L)
    # Mask lanes whose idx is outside this block's [j*whb*L,
    # (j+1)*whb*L): arithmetic-shift hi of a negative idx is negative
    # and out-of-range hi matches no row — both vanish via the hi
    # one-hot.
    hi_row = (idx_row_ref[...] >> 7) - j * whb      # (1, BP) int32
    ohhi_t = (jax.lax.broadcasted_iota(jnp.int32, (whb, bp), 0)
              == hi_row).astype(jnp.bfloat16)       # (whb, bp)

    p = parts_ref[...]                              # (BP, nc) bf16
    # A[p, c*L + l] = parts[p, c] * ohlo[p, l] — built per block in
    # VMEM (the operand XLA would spill to HBM).
    a = jnp.concatenate(
        [ohlo * p[:, c:c + 1] for c in range(nc)], axis=1)  # (BP, nc*L)
    out_ref[...] += jax.lax.dot_general(
        ohhi_t, a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (whb, nc*L)


# Output rows (wh units of L) per grid block: bounds the resident f32
# accumulator block to ROW_BLOCK * nc * L * 4 bytes (~1.5 MB at nc=12).
ROW_BLOCK = 256


def _kernel_f32(idx_row_ref, idx_col_ref, vals_ref, out_ref, *, whb,
                nc, bp):
    """As _kernel, but takes raw f32 values and performs the
    fold-proof 3-term bf16 split + finite-sanitise in VMEM — the
    XLA-side parts materialisation (P x 3C bf16) and where-chains
    disappear from the step graph."""
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    j = pl.program_id(0)
    idx_col = idx_col_ref[...]                      # (BP, 1) int32
    lo = idx_col & (L - 1)
    ohlo = (lo == jax.lax.broadcasted_iota(
        jnp.int32, (bp, L), 1)).astype(jnp.bfloat16)        # (bp, L)
    hi_row = (idx_row_ref[...] >> 7) - j * whb      # (1, BP) int32
    ohhi_t = (jax.lax.broadcasted_iota(jnp.int32, (whb, bp), 0)
              == hi_row).astype(jnp.bfloat16)       # (whb, bp)

    v = vals_ref[...]                               # (BP, C) f32
    v = jnp.where(jnp.isfinite(v), v, 0.0)

    def near_bf16(x):
        b = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hb = (b + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(hb, jnp.float32)

    h = near_bf16(v)
    r1 = v - h
    m = near_bf16(r1)
    lo_t = (r1 - m).astype(jnp.bfloat16)
    parts = jnp.concatenate(
        [h.astype(jnp.bfloat16), m.astype(jnp.bfloat16), lo_t],
        axis=1)                                     # (BP, nc)
    a = jnp.concatenate(
        [ohlo * parts[:, c:c + 1] for c in range(nc)], axis=1)
    out_ref[...] += jax.lax.dot_general(
        ohhi_t, a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def onehot_deposit_f32(idx, vals, n_rows, interpret=False):
    """Segment-sum raw f32 `vals` by `idx` into (n_rows, 3C) f32 with
    the 3-term split done in-kernel; combine the returned hi/mid/lo
    column groups with (a+b)+c for the exact value.  Non-finite vals
    are dropped in-kernel (the film NaN guard)."""
    P, C = vals.shape
    nc = 3 * C
    bp = min(BP, P)
    assert n_rows % L == 0 and P % bp == 0, (n_rows, P)
    wh = n_rows // L
    whb = min(wh, ROW_BLOCK)
    assert wh % whb == 0, (wh, whb)
    idx = idx.astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel_f32, whb=whb, nc=nc, bp=bp),
        grid=(wh // whb, P // bp),
        in_specs=[
            pl.BlockSpec((1, bp), lambda j, i: (0, i)),
            pl.BlockSpec((bp, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bp, C), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((whb, nc * L), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((wh, nc * L), jnp.float32),
        interpret=interpret,
    )(idx.reshape(1, P), idx.reshape(P, 1), vals)
    return out.reshape(wh, nc, L).transpose(0, 2, 1).reshape(n_rows, nc)


def onehot_deposit(idx, parts, n_rows, interpret=False):
    """Segment-sum `parts` rows by `idx` into (n_rows, C) f32.

    idx:   (P,) int32; negative or >= n_rows rows are skipped (their
           parts must be finite — 0 * NaN poisons the contraction).
    parts: (P, C) bf16 (or castable); C <= 32.
    n_rows: static, multiple of 128.  P must be a multiple of 512.

    Large n_rows (e.g. a full 2^18-row film ring) is served by a 2D
    grid blocked over output rows; FLOPs stay P*n_rows*C*2, so keep P
    compacted when n_rows is the full ring.
    """
    P, nc = parts.shape
    bp = min(BP, P)
    assert n_rows % L == 0 and P % bp == 0, (n_rows, P)
    wh = n_rows // L
    whb = min(wh, ROW_BLOCK)
    assert wh % whb == 0, (wh, whb)
    parts = parts.astype(jnp.bfloat16)
    idx = idx.astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, whb=whb, nc=nc, bp=bp),
        grid=(wh // whb, P // bp),
        in_specs=[
            pl.BlockSpec((1, bp), lambda j, i: (0, i)),
            pl.BlockSpec((bp, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((bp, nc), lambda j, i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((whb, nc * L), lambda j, i: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((wh, nc * L), jnp.float32),
        interpret=interpret,
    )(idx.reshape(1, P), idx.reshape(P, 1), parts)
    # out[h, c*L + l] -> (rows = h*L + l, c)
    return out.reshape(wh, nc, L).transpose(0, 2, 1).reshape(n_rows, nc)


def usable(P, n_rows, nc):
    return P % min(BP, P) == 0 and n_rows % L == 0 and nc <= 32


def on_tpu():
    from ..geometry.spheres import _use_pallas

    return _use_pallas()


# ---------------------------------------------------------------------------
# The inverse op: one-hot GATHER from a VMEM-resident table.
#
#     out[p, c] = table[idx[p], c]        (0 where idx out of range)
#
# XLA lowers this to the serial per-output-row loop (~17 ns/row — the
# expand_rows cost that eats most of a compaction's win).  Here the
# table rides VMEM whole, each lane's hi-level one-hot pulls its
# L-row candidate group via one MXU dot, and the lo-level one-hot
# selects within the group on the VPU — no serial loop, bit-exact
# (single nonzero per reduction).
# ---------------------------------------------------------------------------

# Table budget: K * 3C * 2 bytes must fit VMEM alongside the blocks.
GATHER_MAX_TABLE = 4 << 20


def _gather_kernel(idx_ref, t2_ref, out_ref, *, nc, bp):
    idx = idx_ref[...]                              # (BP, 1) int32
    kh = t2_ref.shape[0]
    ohhi = ((idx >> 7) == jax.lax.broadcasted_iota(
        jnp.int32, (bp, kh), 1)).astype(jnp.bfloat16)       # (bp, kh)
    g1 = jax.lax.dot_general(
        ohhi, t2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BP, nc*L)
    ohlo = ((idx & (L - 1)) == jax.lax.broadcasted_iota(
        jnp.int32, (bp, L), 1)).astype(jnp.float32)         # (bp, L)
    cols = [jnp.sum(ohlo * g1[:, c * L:(c + 1) * L], axis=1,
                    keepdims=True) for c in range(nc)]
    out_ref[...] = jnp.concatenate(cols, axis=1)    # (BP, nc)


def onehot_gather(idx, table, interpret=False):
    """Bit-exact `table[idx]` for an f32 (K, C) table and (P,) int32
    idx; out-of-range idx rows return 0.  K multiple of 128, P
    multiple of 512, K*3C*2 bytes within the VMEM table budget.

    The table must be finite everywhere: the MXU contraction includes
    0 * table[r] terms for unselected rows, and 0 * NaN/Inf poisons
    the product (compact_apply's pad_row exists to guarantee this)."""
    from .rowlookup import _split3

    K, C = table.shape
    P = idx.shape[0]
    bp = min(BP, P)
    assert K % L == 0 and P % bp == 0, (K, P)
    h, m, l = _split3(table)
    t3 = jnp.concatenate([h, m, l], axis=-1)        # (K, 3C) bf16
    nc = 3 * C
    # T2[kh, c*L + kl] = t3[kh*L + kl, c]
    t2 = t3.reshape(K // L, L, nc).transpose(0, 2, 1).reshape(
        K // L, nc * L)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, nc=nc, bp=bp),
        grid=(P // bp,),
        in_specs=[
            pl.BlockSpec((bp, 1), lambda i: (i, 0)),
            pl.BlockSpec((K // L, nc * L), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bp, nc), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((P, nc), jnp.float32),
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(P, 1), t2)
    return (out[:, :C] + out[:, C:2 * C]) + out[:, 2 * C:]


def gather_usable(P, K, C):
    return (P % min(BP, P) == 0 and K % L == 0 and C <= 10
            and K * 3 * C * 2 <= GATHER_MAX_TABLE)
