"""Bit-exact material-row lookup via one-hot MXU matmul.

XLA lowers a (N,)-indexed gather from a small table to a serial
per-row update loop on TPU — ~1.35 ms/step for the two shading-table
gathers at N=2^17 (tools/profile_shade.py).  A one-hot matmul runs on
the MXU instead and measures as free at that size.

Exactness: a bf16 matmul rounds the table to bf16, which would break
golden/parity tests.  Instead the f32 table is split into three bf16
terms (hi + mid + lo): each row of the one-hot matrix has exactly one
1.0 (exact in bf16), the zero products are exact, and the f32
accumulator adds hi, mid, lo — whose sum reconstructs the original
f32 exactly (hi+mid fits in 16 mantissa bits so their sum is exact,
and lo is the exact remainder, so the final rounding lands on the
original value).  tests/test_rowlookup.py asserts bit-equality
against the gather on every scene's table.

The reference pays none of this — its materials are trait objects
dispatched per ray (reference: src/material.rs:15-27); the cost being
optimized here is a TPU-only artifact of batched table shading.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# One-hot matmul work scales with table rows; beyond this the serial
# gather wins again (and tables that large stream from HBM anyway).
MAX_ROWS = 4096


def _use_matmul(nrows):
    if os.environ.get("MRT_NO_ROWMM"):
        return False
    return nrows <= MAX_ROWS


def _split3(table):
    """f32 table -> three bf16 terms whose f32 sum ((hi+mid)+lo) is
    bit-exact for normal f32 (subnormals flush to 0 — irrelevant for
    every table/contribution domain here).

    Implemented with INTEGER bit masking, not arithmetic rounding: the
    classic Dekker-style `x - bf16(x)` split is algebraically
    simplified by XLA:TPU's excess-precision folding inside jit —
    measured r5: mid/lo collapse to ~3.8e-3 relative error, and
    slot-id reconstruction in ops/film_deposit came out off-by-one
    (dropped depth counts on hardware, artifacts/film_mm_r05.json).
    Masking `(bits + 0x8000) & 0xFFFF0000` rounds to the nearest
    bf16-representable f32 in a form XLA cannot fold; the final bf16
    converts are then exact by construction."""
    def near_bf16(x):
        b = jax.lax.bitcast_convert_type(x, jnp.uint32)
        hb = (b + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(hb, jnp.float32)

    hi = near_bf16(table)
    r1 = table - hi
    mid = near_bf16(r1)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def take_rows(table, rows):
    """`table[rows]` for a (R, C) f32 table and (N,) int rows —
    bit-exact, MXU-backed for small tables, gather fallback."""
    nrows = table.shape[0]
    if not _use_matmul(nrows):
        return table[rows]
    hi, mid, lo = _split3(table)
    # Stack the three terms along the contraction axis and triple the
    # one-hot so a single dot accumulates hi+mid+lo in f32.
    stacked = jnp.concatenate([hi, mid, lo], axis=0)
    iota = jnp.arange(nrows, dtype=rows.dtype)
    onehot = (rows[:, None] == iota[None, :]).astype(jnp.bfloat16)
    onehot3 = jnp.concatenate([onehot, onehot, onehot], axis=1)
    return jax.lax.dot_general(
        onehot3, stacked, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def take_rows_with_int(table, int_col, rows):
    """Lookup of a f32 table plus one small-int column in ONE matmul.

    `int_col` values must be exactly representable in bf16 (|v| < 257,
    integral) — true for material-type ids.  Returns (params (N, C),
    ints (N,) int32).
    """
    nrows = table.shape[0]
    if not _use_matmul(nrows):
        return table[rows], int_col[rows]
    fused = take_rows(
        jnp.concatenate([table, int_col.astype(jnp.float32)[:, None]],
                        axis=-1), rows)
    return fused[:, :-1], jnp.round(fused[:, -1]).astype(jnp.int32)
