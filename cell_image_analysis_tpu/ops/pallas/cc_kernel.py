"""Pallas TPU kernel: whole-frame connected-components min-propagation.

The XLA sweep implementation (ops/cc.py impl="sweeps") materializes ~5 full
(H, W) arrays in HBM per sweep, and blob clusters on 1024^2 frames need
~170 sweeps to converge — measured 160 ms for an 8-frame batch, purely
HBM-bandwidth-bound (sweeps_per_check variations change nothing; see
BENCH.md).  This kernel keeps the label image resident in VMEM (v5e has
128 MB) and runs the entire convergence loop on-chip: HBM traffic drops to
one mask read + one label write per frame.

One program per frame (vmap adds the batch grid):
  mask_ref : (H, W) bool      foreground mask
  out_ref  : (H, W) int32     raw min-index labels (pixel's component min
                              linear index + 1; 0 = background)

The caller (ops/cc.label_components) applies the same 1..K raster-order
compaction as the other impls, so results are bit-identical.

Neighbor shifts use pltpu.roll with edge rows/cols masked to INF (roll
wraps).  Connectivity 1 = cross, 2 = + diagonals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = int(jnp.iinfo(jnp.int32).max)  # plain int: a device array here would
                                      # be captured as a pallas kernel const
_SWEEPS_PER_CHECK = 8  # convergence checks cost a full-array reduce


def _make_kernel(connectivity: int):
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]

    def kernel(mask_ref, out_ref):
        h, w = mask_ref.shape
        mask = mask_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        out_ref[...] = jnp.where(mask, rows * w + cols + 1, 0)

        def shifted(v, dr, dc):
            y = v
            if dr:
                y = pltpu.roll(y, (-dr) % h, axis=0)  # roll needs shift >= 0
                y = jnp.where(rows == (h - 1 if dr > 0 else 0), _INF, y)
            if dc:
                y = pltpu.roll(y, (-dc) % w, axis=1)
                y = jnp.where(cols == (w - 1 if dc > 0 else 0), _INF, y)
            return y

        def cond(changed):
            return changed

        def body(_):
            old = out_ref[...]
            new = old
            for _ in range(_SWEEPS_PER_CHECK):
                v = jnp.where(mask, jnp.where(new > 0, new, _INF), _INF)
                best = v
                for dr, dc in shifts:
                    best = jnp.minimum(best, shifted(v, dr, dc))
                new = jnp.where(mask & (best < _INF), best, jnp.where(mask, new, 0))
            out_ref[...] = new
            return jnp.any(new != old)

        jax.lax.while_loop(cond, body, jnp.any(mask))

    return kernel


@partial(jax.jit, static_argnames=("connectivity",))
def cc_min_labels_pallas(mask: jax.Array, connectivity: int = 1) -> jax.Array:
    """(H, W) bool -> (H, W) int32 raw min-index labels (pre-compaction).
    vmap to batch; the batch dim becomes the Pallas grid."""
    h, w = mask.shape
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _make_kernel(connectivity),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # the while body keeps ~6 full (H, W) arrays live; the default 16 MB
        # scoped-VMEM budget OOMs at 1024^2 (v5e has 128 MB VMEM total)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(mask)
