"""Hi/lo channel-packed single-pass conv — "high" numerics at one conv call.

The parity contract needs >= 3-pass ("high") conv numerics on TPU: the
DEFAULT f32 conv lowering rounds BOTH operands to one bf16 MXU pass
(BENCH.md r2s9), and XLA "high" restores ~f32 numerics by running THREE
convs (x_hi@W_hi + x_hi@W_lo + x_lo@W_hi, f32-accumulated).  On the
U-Net's 64-channel 512^2-spatial layers those three passes are
layout-bound, not FLOP-bound — 64-channel f32 activations pad 2x under
the TPU's (8, 128) lane tiling and each pass re-reads them (measured
scripts/probe_hilo_conv.py: Conv_3 "high" 55.2 ms vs default 31.5 at the
8x1024^2 batch).

This op computes the SAME three products in ONE conv by packing the hi/lo
splits as channel blocks: xp = [x_hi, x_hi, x_lo] (3Ci), Wp = [W_hi; W_lo;
W_hi].  Two measured facts make it exact at "high" tier:

- The default conv's rounding is operand-only — on bf16-exact operand
  VALUES its f32 accumulation is exact (scripts/probe_conv_accum.py:
  <= 1.4e-7 rel across K = 576..5184, conv and matmul).
- XLA's algebraic simplifier must NOT merge the two x_hi blocks: unguarded,
  it folds the sub-convs into one conv with kernel W_hi + W_lo == W, which
  the default lowering re-rounds to bf16 (measured 2.3e-3 — the exact error
  this decomposition removes).  The `optimization_barrier` on the duplicate
  block is therefore LOAD-BEARING.

Cost model: one conv at 3x input channels = the same MXU FLOPs as "high"'s
three passes, but one launch, one output accumulation, and full(er) lanes
(3*64 = 192 -> 256-pad = 1.33x vs 64 -> 128-pad = 2x per pass).  Measured
win on ci <= 64 layers only; wide layers lose to the packed-input
materialization (see probe table in BENCH.md r3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_hi_lo(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 -> (hi, lo) bf16 pair with hi + lo == a to ~16 mantissa bits.

    Both bf16 intermediates are optimization_barrier'ed: XLA may otherwise
    elide the f32->bf16->f32 round-trip under its excess-precision rules,
    making hi == a and lo == 0 — the split silently degenerates to the
    1-pass rounding it exists to avoid (measured 1.7e-3 on-chip,
    probe_wb16.py, with barriers only on the conv kernels)."""
    hi = jax.lax.optimization_barrier(a.astype(jnp.bfloat16))
    lo = jax.lax.optimization_barrier(
        (a - hi.astype(jnp.float32)).astype(jnp.bfloat16))
    return hi, lo


def hilo_conv3x3_sum(x: jax.Array, W: jax.Array,
                     bias: jax.Array | None = None,
                     dimension_numbers=("NHWC", "HWIO", "NHWC")) -> jax.Array:
    """XLA-"high"-equivalent via THREE explicit bf16-operand convs summed in
    f32 — the same product set as `hilo_conv3x3` without the 3Ci packed-input
    materialization: x_hi is ONE bf16 tensor read twice (half the bytes of
    the f32 reads "high"'s internal lowering performs per pass).  The three
    convs have distinct operand pairs, so no CSE hazard and no barrier."""
    x_hi, x_lo = _split_hi_lo(x)
    W_hi, W_lo = _split_hi_lo(W)

    def c(a, k):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), "SAME", dimension_numbers=dimension_numbers,
            preferred_element_type=jnp.float32,
        )

    y = c(x_hi, W_hi) + c(x_hi, W_lo) + c(x_lo, W_hi)
    if bias is not None:
        y = y + bias
    return y


def wb16_conv(x: jax.Array, W: jax.Array, bias: jax.Array | None = None,
              dimension_numbers=("NHWC", "HWIO", "NHWC")) -> jax.Array:
    """x@W at "high"-equivalent numerics in ONE default-precision conv,
    REQUIRING W bf16-exact (every kernel value round-trips float32->bfloat16
    ->float32 unchanged — see `kernels_bf16_exact` / `round_kernels_bf16`).

    With W exact, "high"'s three products collapse to two (W_lo == 0):
    x@W = x_hi@W + x_lo@W.  Packing the split as channel blocks
    xp = [x_hi, x_lo] (2Ci) against Wp = [W; W] computes both in one
    default conv: the lowering's operand bf16-rounding is the identity on
    every block (x_hi/x_lo/W are all bf16-exact VALUES carried in f32) and
    accumulation is f32 (scripts/probe_conv_accum.py: <= 1.4e-7 rel).
    x_hi != x_lo, so unlike `hilo_conv3x3` there is no duplicated block for
    the algebraic simplifier to CSE-fold and no barrier is needed.

    Cost: 2x the single-pass MXU FLOPs vs "high"'s 3x.  This is a MODEL
    contract, not an execution trick — the artifact ships bf16-exact
    kernels and every backend (including the CPU oracle) runs the same
    weights, so parity is preserved exactly.
    """
    x_hi, x_lo = _split_hi_lo(x)
    xp = jnp.concatenate([x_hi.astype(jnp.float32), x_lo.astype(jnp.float32)],
                         axis=-1)
    # barrier: the two kernel blocks are EQUAL, so unguarded the algebraic
    # simplifier folds the block-structured conv back into
    # conv(x_hi + x_lo, W) — whose re-rounded input is the exact 1-pass
    # error this op removes (measured 1.7e-3 on-chip, probe_wb16.py).
    # x_hi != x_lo, so barrier-ing one W copy is sufficient.
    Wp = jnp.concatenate([W, jax.lax.optimization_barrier(W)], axis=2)
    y = jax.lax.conv_general_dilated(
        xp, Wp, (1, 1), "SAME", dimension_numbers=dimension_numbers,
    )
    if bias is not None:
        y = y + bias
    return y


def wb16_conv_split(x: jax.Array, W: jax.Array, bias: jax.Array | None = None,
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) -> jax.Array:
    """`wb16_conv` as two separate default convs summed in f32 (no packed-
    input materialization).  The SECOND conv's kernel is barriered: with
    equal kernels the simplifier folds conv(x_hi,W)+conv(x_lo,W) back into
    conv(x_hi+x_lo,W) and re-rounds x — a barrier on an input does NOT block
    that fold (the fold sums the inputs without looking through them), only
    making the kernels opaque-unequal does."""
    x_hi, x_lo = _split_hi_lo(x)

    def c(a, k):
        return jax.lax.conv_general_dilated(
            a.astype(jnp.float32), k, (1, 1), "SAME",
            dimension_numbers=dimension_numbers,
        )

    y = c(x_hi, W) + c(x_lo, jax.lax.optimization_barrier(W))
    if bias is not None:
        y = y + bias
    return y


def round_kernels_bf16(params):
    """Round every conv-kernel leaf of a param pytree to bf16-exact float32
    values (the `wb16_conv` model contract).  Biases stay full f32 — they
    are added outside the contraction."""
    import numpy as np

    def walk(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "kernel":
                out[k] = np.asarray(v, np.float32).astype("bfloat16").astype(np.float32)
            else:
                out[k] = v
        return out

    return walk(params)


def kernels_bf16_exact(params) -> bool:
    """True iff every conv-kernel leaf round-trips f32->bf16->f32 unchanged
    (host-side numpy check; run once at artifact load)."""
    import numpy as np

    def walk(d):
        for k, v in d.items():
            if isinstance(v, dict):
                if not walk(v):
                    return False
            elif k == "kernel":
                a = np.asarray(v, np.float32)
                if not np.array_equal(a.astype("bfloat16").astype(np.float32), a):
                    return False
        return True

    return walk(params)


def hilo_conv3x3(x: jax.Array, W: jax.Array, bias: jax.Array | None = None,
                 dimension_numbers=("NHWC", "HWIO", "NHWC")) -> jax.Array:
    """SAME stride-1 correlation at XLA-"high"-equivalent numerics via one
    DEFAULT-precision conv on hi/lo channel-packed bf16-exact operands.

    x: (B, H, W, Ci) float32.  W: (kh, kw, Ci, Co) float32 (any spatial
    kernel size — the packing is channel-only).  Returns float32.
    """
    x_hi, x_lo = _split_hi_lo(x)
    W_hi, W_lo = _split_hi_lo(W)
    # barrier: keep the duplicated x_hi block un-CSE-able (see module doc)
    x_hi2 = jax.lax.optimization_barrier(x_hi)
    xp = jnp.concatenate([x_hi, x_hi2, x_lo], axis=-1).astype(jnp.float32)
    Wp = jnp.concatenate([W_hi, W_lo, W_hi], axis=2).astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        xp, Wp, (1, 1), "SAME", dimension_numbers=dimension_numbers,
    )
    if bias is not None:
        y = y + bias
    return y
