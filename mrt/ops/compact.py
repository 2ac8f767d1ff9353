"""Bit-exact masked lane compaction via two-level one-hot matmuls.

The per-lane texel/table fetches that dominate textured shading cost
~17 ns per OUTPUT ROW on TPU (XLA lowers gathers to a serial row
loop; tools/probe_gather_cost.py, commit 812eb32) — regardless of how
many lanes actually need the value.  The only real lever is FEWER
ROWS, but compacting with `.at[].set` scatters P rows and costs more
than it saves.

This module compacts with MXU matmuls instead:

    pos = cumsum(mask) - 1            # prefix positions, monotone
    xc[k] = sum_p onehot(pos[p] == k & mask[p]) * x[p]

Each one-hot row has at most ONE 1.0 and mask-compaction is a
permutation onto [0, count), so with the 3-term bf16 value split
(ops/rowlookup) every output row reconstructs the input row EXACTLY —
unlike the film deposit there are no cross-lane sums, so this is
bit-exact, golden-safe.  The one-hot is factored two-level
(hi/lo) so operand generation is P*(K/L + L) comparisons, not P*K.

Expansion back to lane order is a plain serial gather from the SMALL
(K, C) result table — cost ∝ P rows × C cols, cheap for narrow
outputs (the 4-col row law: ~0.6 ms at P=2^16).

`compact_apply` composes the two with a `lax.cond` fallback to the
uncompacted evaluation when count > K (e.g. the all-camera-ray
transient right after pool init).

Reference analogue: none — the reference shades one ray at a time
(src/material.rs:15-27); this is a TPU wavefront artifact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rowlookup import _split3

L_DEFAULT = 128


def compact_rows(mask, x, K, L=L_DEFAULT, pad_row=None):
    """Compact the masked rows of x to the front of a (K, C) buffer.

    Args:
      mask: (P,) bool.  Masked rows are packed in lane order.
      x:    (P, C) f32.  Only masked rows are read (others are zeroed
            before the matmul so NaN/garbage cannot leak in).
      K:    static output rows (multiple of L).  Caller must handle
            count > K (see compact_apply).
      pad_row: (C,) value for rows >= count (default zeros) — use a
            SAFE input for fns that would NaN on zeros (e.g. unit()).
    Returns: (xc (K, C) f32, pos (P,) int32, count () int32).
    """
    P, C = x.shape
    assert K % L == 0, (K, L)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    count = jnp.sum(mask.astype(jnp.int32))

    xz = jnp.where(mask[:, None], x, 0.0)
    h, m, l = _split3(xz)
    parts = jnp.concatenate([h, m, l], axis=-1)          # (P, 3C) bf16

    import os

    from . import pallas_onehot

    mode_ = os.environ.get("MRT_ONEHOT")
    use_pallas = (L == pallas_onehot.L
                  and pallas_onehot.usable(P, K, 3 * C)
                  and mode_ != "xla"
                  and (mode_ in ("pallas", "interpret")
                       or pallas_onehot.on_tpu()))
    if use_pallas:
        # idx = -1 on unmasked lanes: the kernel skips them (their
        # parts are zeroed above, so even a NaN input cannot leak).
        xc = pallas_onehot.onehot_deposit(
            jnp.where(mask, pos, -1), parts, K,
            interpret=(mode_ == "interpret"))
    else:
        idx = jnp.clip(pos, 0, K - 1)
        lo = idx & (L - 1)
        hi = idx >> (L.bit_length() - 1)
        oh_lo = ((lo[:, None] == jnp.arange(L, dtype=lo.dtype)[None, :])
                 & mask[:, None]).astype(jnp.bfloat16)   # (P, L)
        oh_hi = (hi[:, None]
                 == jnp.arange(K // L, dtype=hi.dtype)[None, :]
                 ).astype(jnp.bfloat16)                  # (P, K/L)
        a = (oh_lo[:, :, None] * parts[:, None, :]).reshape(
            P, L * 3 * C)
        xc = jax.lax.dot_general(
            oh_hi, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (K/L, L*3C)
        xc = xc.reshape(K, 3 * C)
    xc = xc[:, :C] + xc[:, C:2 * C] + xc[:, 2 * C:]
    if pad_row is None:
        pad_row = jnp.zeros((C,), jnp.float32)
    covered = (jnp.arange(K, dtype=jnp.int32) < count)[:, None]
    xc = jnp.where(covered, xc, jnp.asarray(pad_row, jnp.float32))
    return xc, pos, count


def expand_rows(y, pos, mask):
    """Inverse of compact_rows for per-lane results: out[p] = y[pos[p]]
    where mask else 0.  Bit-exact either way: the one-hot gather
    kernel when the (K, C) table fits its VMEM budget (XLA's serial
    per-output-row gather loop costs ~17 ns * P otherwise)."""
    import os

    from . import pallas_onehot

    K, C = y.shape
    P = pos.shape[0]
    mode_ = os.environ.get("MRT_ONEHOT")
    if (pallas_onehot.gather_usable(P, K, C) and mode_ != "xla"
            and (mode_ in ("pallas", "interpret")
                 or pallas_onehot.on_tpu())):
        g = pallas_onehot.onehot_gather(
            jnp.where(mask, pos, -1), y,
            interpret=(mode_ == "interpret"))
        return jnp.where(mask[..., None], g, 0.0)
    g = y[jnp.clip(pos, 0, K - 1)]
    return jnp.where(mask[..., None], g, 0.0)


def compact_apply(fn, mask, x, K, L=L_DEFAULT, pad_row=None):
    """out = where(mask, fn_rowwise(x), 0) evaluating fn on <= K
    compacted rows per round of a while_loop; extra rounds only when
    the masked count overflows K (e.g. the all-camera-ray transient).

    A lax.cond with a full-width fallback was measured paying for
    BOTH arms inside the persistent loop on hardware (the r5
    film-deposit decomposition probe) — while_loops are never
    select-converted, and the empty-mask case costs zero iterations.

    fn must be row-wise (out[i] depends only on in[i]) and
    shape-polymorphic over the row count."""
    out_sd = jax.eval_shape(fn, jax.ShapeDtypeStruct(
        (K,) + x.shape[1:], x.dtype))
    out0 = jnp.zeros((x.shape[0],) + out_sd.shape[1:], out_sd.dtype)

    def cond(carry):
        out, m = carry
        return jnp.any(m)

    def body(carry):
        out, m = carry
        # First <= K masked rows (a PREFIX of m: compact_rows'
        # internal positions agree, nothing clips onto row K-1).
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        mk = m & (pos < K)
        xc, posk, _ = compact_rows(mk, x, K, L=L, pad_row=pad_row)
        y = fn(xc)
        # The one-hot expand contracts 0 * table rows, so ONE
        # non-finite fn output would poison every lane (seen on eve:
        # the single NaN path spread to 6033 pixels).  Dropping it
        # here matches the film NaN guard semantics.
        y = jnp.where(jnp.isfinite(y), y, 0.0)
        out = out + expand_rows(y, posk, mk)
        return out, m & ~mk

    out, _ = jax.lax.while_loop(cond, body, (out0, mask))
    return out
