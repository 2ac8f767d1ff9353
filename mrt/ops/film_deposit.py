"""Windowed one-hot MXU film deposit — the scatter-floor attack.

The persistent integrator's per-step film update
(`dest.at[slot].add(contrib)`, integrator/persistent.py) lowers to a
serial per-update-row loop on TPU: ~10-14 ns/row, 1.3-1.8 ms/step at
pool 2^17 regardless of destination size (tools/profile_film2.py,
BASELINE.md roofline).  That loop is the binding constraint on the
RTIOW headline — the rest of the step is MXU/VPU work that gets
~2.2-2.7x cheaper per the roofline.

This module replaces the scatter with dense MXU work — the shipped
(v4) design, every piece hardware-measured (artifacts/film_mm_r05.json):

  * Work items are claimed pixel-major, so MOST live pixels sit
    within W pixels of the claim frontier; the per-step deposit
    window rides that frontier (base = claimed_q - W + 1):

        win[j] = sum_p onehot(q[p] - base == j) * contrib[p]
        dest  += roll(pad(win), base mod slots)     # ring alignment

    computed by the ops/pallas_onehot kernel (XLA's own lowering of
    the same matmul spills the ⊗ operand to HBM, ~2x step cost).
  * Lanes older than the window — the deep-path tail — park their
    accumulator in per-lane pending registers (pslot, pacc) at death
    and `flush_pending` releases ALL of them once per FLUSH_STEPS
    block through a row-blocked one-hot deposit into the full ring.
    NO SCATTER ANYWHERE: an in-loop scatter costs ~1.35 ms FIXED
    regardless of row count (8192 rows = 131072 rows — the flush
    decomposition probe), so reducing rows buys nothing; only
    removing the op does.
  * 3-term bf16 value split (ops/rowlookup._split3, fold-proof
    integer masking): products against the exact-{0,1} one-hot are
    exact and the f32 accumulator sums them, so the film differs from
    the serial scatter only by f32 ADD REASSOCIATION (~1e-7 relative)
    and depth counts are bit-exact.  Not bit-identical: auto-enabled
    per measurement, never silently under committed goldens.

Failed designs, kept in the artifact for the record: v1 gated claims
to [min_live, min_live+W) (20-40% pool utilisation — the dielectric
tail pins min_live ~2M items behind the frontier); v2 used XLA's
matmul (operand spill) and a cond-gated flush whose UNTAKEN
full-width arm still cost ~1.75 ms/step (XLA pays for both cond arms
inside the loop — use while_loops over chunks instead).

The reference's analogue is its per-pass film merge under a mutex
(reference: src/main.rs:629-638); the cost being attacked is a
TPU-only artifact of XLA's serial scatter lowering.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .rowlookup import _split3

# Low-level one-hot width (the ⊗ factor).  L=128 matches the lane
# width; the A-operand (P, L*12) is what XLA must fuse (or spill —
# at L=128/pool 2^17 a spilled A is 400 MB; L=32 caps the spill at
# 100 MB if fusion fails).  Hardware-swept via MRT_FILM_MM_L.
DEFAULT_L = int(os.environ.get("MRT_FILM_MM_L", "128"))

# Claim-window width (pixels).  Larger W = fewer straggler parks (a
# lane is a straggler once the frontier runs W past its pixel) but
# more MXU FLOPs (P*W*12*2).  The auto rule W*spp ~ 4*pool lives in
# integrator.persistent._film_mm_enabled; MRT_FILM_MM_W overrides.
DEFAULT_W = int(os.environ.get("MRT_FILM_MM_W", "16384"))


def mode():
    """MRT_FILM_MM: '0' force-off, '1' force-on (TPU auto rule lives in
    integrator.persistent._film_mm_enabled)."""
    return os.environ.get("MRT_FILM_MM")


def deposit_matmul(dest, q, contrib, base, W, L=None):
    """dest[(base + j) & (slots-1)] += sum of contrib rows with
    q - base == j, for j in [0, W).

    Args:
      dest:    (slots, C) f32 ring accumulator; slots a power of two,
               W <= slots.
      q:       (P,) int32 pixel/slot key per lane.  Rows with nonzero
               contrib MUST satisfy base <= q < base + W (the
               integrator's claim gate guarantees it); other rows may
               hold any q as long as their contrib is exactly zero.
      contrib: (P, C) f32.
      base:    scalar int32 window base (min live q).  May be any
               value (e.g. 2^30 when no lane is active) — alignment is
               mod slots and zero contributions add zero.
      W:       static window width, multiple of L.
      L:       static low-level one-hot width (power of two).
    Returns: updated dest.
    """
    slots, C = dest.shape
    L = L or DEFAULT_L
    assert W % L == 0 and W <= slots, (W, L, slots)
    wh = W // L

    from . import pallas_onehot

    P = contrib.shape[0]
    mode_ = os.environ.get("MRT_ONEHOT")
    use_pallas = (L == pallas_onehot.L
                  and pallas_onehot.usable(P, W, 3 * C)
                  and mode_ != "xla"
                  and (mode_ in ("pallas", "interpret")
                       or pallas_onehot.on_tpu()))
    if use_pallas:
        if os.environ.get("MRT_ONEHOT_F32") == "1":
            # In-kernel split variant: measured SLOWER on hardware
            # (10.04 vs 11.76 Mrays/s at the named workload — the
            # per-block VPU split work loses to XLA's fused split
            # feeding a bf16 operand).  Kept for reference.
            win = pallas_onehot.onehot_deposit_f32(
                q - base, contrib, W,
                interpret=(mode_ == "interpret"))
        else:
            h, m, l = _split3(contrib)
            parts = jnp.concatenate([h, m, l], axis=-1)
            # The kernel drops idx outside [0, W) itself (contract:
            # such rows carry zero parts — contrib is zeroed for
            # straggler/inactive lanes and sanitised upstream).
            win = pallas_onehot.onehot_deposit(
                q - base, parts, W, interpret=(mode_ == "interpret"))
    else:
        h, m, l = _split3(contrib)
        parts = jnp.concatenate([h, m, l], axis=-1)      # (P, 3C) bf16
        # XLA fallback/spec: same two-level factorisation.  XLA:TPU
        # materialises the ⊗ operand to HBM (~2x step cost — why the
        # Pallas path exists); fine on CPU and as the executable spec.
        idx = jnp.clip(q - base, 0, W - 1)
        lo = idx & (L - 1)
        hi = idx >> (L.bit_length() - 1)
        oh_lo = (lo[:, None] == jnp.arange(L, dtype=lo.dtype)[None, :]
                 ).astype(jnp.bfloat16)                  # (P, L)
        oh_hi = (hi[:, None] == jnp.arange(wh, dtype=hi.dtype)[None, :]
                 ).astype(jnp.bfloat16)                  # (P, wh)
        a = (oh_lo[:, :, None] * parts[:, None, :]).reshape(
            parts.shape[0], L * 3 * C)
        win = jax.lax.dot_general(
            oh_hi, a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (wh, L*3C)
        win = win.reshape(W, 3 * C)
    win = win[:, :C] + win[:, C:2 * C] + win[:, 2 * C:]  # hi+mid+lo

    if os.environ.get("MRT_MM_NORING") == "1":  # probe only: keep the
        # kernel live but skip the ring roll-add (wrong output).
        return dest.at[:1].add(win[:1])
    if W == slots:
        pad = win
    else:
        pad = jnp.zeros((slots, C), jnp.float32).at[:W].set(win)
    if slots & (slots - 1) == 0:
        shift = base & (slots - 1)
    else:
        # Small-frame mode: dest is the npix_pad film slice (not a
        # power of two).  Rows that wrap carry zeros (no live q there).
        shift = base % slots
    return dest + jnp.roll(pad, shift, axis=0)


# Pending-flush compaction width per round.
FLUSH_K = int(os.environ.get("MRT_FILM_MM_K", "8192"))


def flush_pending(dest, pslot, pacc, mask=None, K=None,
                  interpret=False):
    """dest[pslot[p]] += pacc[p] for pending lanes — SCATTER-FREE.

    The r5 hardware decomposition measured any in-loop scatter at a
    ~1.35 ms FIXED cost in the persistent step regardless of row
    count (8192 rows cost the same as 131072 —
    artifacts/film_mm_r05.json), so pendings are compacted (bit-exact
    one-hot matmuls) and deposited into the full dest ring through
    the row-blocked onehot_deposit kernel instead.  A while_loop
    handles >K pendings (zero iterations when none — the common
    case).

    Returns (dest, pslot, pacc) with flushed rows cleared to (-1, 0).
    """
    from .compact import compact_rows

    K = K or FLUSH_K
    P, C = pacc.shape
    slots = dest.shape[0]
    mask = (pslot >= 0) if mask is None else (mask & (pslot >= 0))
    vals = jnp.concatenate(
        [pacc, pslot.astype(jnp.float32)[:, None]], axis=-1)

    def cond(carry):
        dest, m = carry
        return jnp.any(m)

    def body(carry):
        dest, m = carry
        # First <= K masked rows (a PREFIX of m: compact_rows'
        # internal positions agree, nothing clips onto row K-1).
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        mk = m & (pos < K)
        yc, _, _ = compact_rows(
            mk, vals, K,
            pad_row=jnp.asarray([0.0] * C + [-1.0], jnp.float32))
        rows = jnp.round(yc[:, C]).astype(jnp.int32)
        h, mm_, l = _split3(yc[:, :C])
        parts = jnp.concatenate([h, mm_, l], axis=-1)    # (K, 3C)
        win = _ring_deposit(rows, parts, slots, C, interpret)
        return dest + win, m & ~mk

    dest, _ = jax.lax.while_loop(cond, body, (dest, mask))
    keep = ~mask
    return (dest,
            jnp.where(keep, pslot, -1),
            jnp.where(keep[:, None], pacc, 0.0))


def _ring_deposit(rows, parts, slots, C, interpret):
    """(slots, C) f32 deposit of compacted parts via the blocked
    kernel (pad rows carry -1 and vanish); XLA fallback off-TPU."""
    from . import pallas_onehot

    mode_ = os.environ.get("MRT_ONEHOT")
    if (pallas_onehot.usable(rows.shape[0], slots, parts.shape[1])
            and mode_ != "xla"
            and (mode_ in ("pallas", "interpret") or interpret
                 or pallas_onehot.on_tpu())):
        win = pallas_onehot.onehot_deposit(
            rows, parts, slots,
            interpret=interpret or mode_ == "interpret")
    else:
        # Small-scale fallback (CPU tests): plain segment add.
        win = jnp.zeros((slots, parts.shape[1]), jnp.float32)
        win = win.at[jnp.clip(rows, 0, slots - 1)].add(
            jnp.where((rows >= 0)[:, None],
                      parts.astype(jnp.float32), 0.0))
    return win[:, :C] + win[:, C:2 * C] + win[:, 2 * C:]
