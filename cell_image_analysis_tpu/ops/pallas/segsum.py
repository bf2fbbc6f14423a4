"""Pallas TPU kernel: segment sums as VMEM-resident one-hot matmuls.

The regionprops reductions (area, coordinate sums, central moments) are
histogram-shaped: scatter fg-pixel features into ~1-4k label bins.  XLA's
scatter lowering measured ~28 ms/frame; a pure-XLA one-hot matmul loses even
harder because the (block, n_labels) one-hots materialize in HBM
(BENCH.md).  This kernel keeps them in VMEM: each grid step builds a
(BLK, n_seg) 0/1 matrix in registers/VMEM, feeds the MXU, and accumulates
into the persistent output block — the TPU grid is sequential, so the
revisited output block is the accumulator (guide: "Patterns: accumulation").

Exactness: one-hots are exact in float32 and accumulation is float32;
feature magnitudes here (counts, coords <= 4096, centered moment products)
are all well inside f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 512


def _kernel(seg_ref, data_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:]                       # (BLK, 1) int32
    n_seg = out_ref.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (_BLK, n_seg), 1)
    onehot = (seg == ids).astype(jnp.float32)          # (BLK, n_seg)
    out_ref[:] += jax.lax.dot_general(
        onehot, data_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("n_seg",))
def segment_sums_pallas(seg: jax.Array, data: jax.Array, n_seg: int) -> jax.Array:
    """segment_sum(data, seg, num_segments=n_seg) for seg (P,) int32 in
    [0, n_seg) and data (P, F) float32.  Out-of-range seg values are dropped.
    Returns (n_seg, F) float32."""
    P, F = data.shape
    n_pad = -(-n_seg // 128) * 128
    f_pad = -(-F // 128) * 128
    blocks = -(-P // _BLK)
    pp = blocks * _BLK - P
    seg_p = jnp.pad(seg, (0, pp), constant_values=n_pad)  # padding -> dropped
    data_p = jnp.pad(data.astype(jnp.float32), ((0, pp), (0, f_pad - F)))
    # clamp out-of-range to a dead row we slice off?  n_pad may equal a live
    # row only if n_seg == n_pad; route invalid to the last padded row and
    # zero its data instead.
    invalid = (seg_p < 0) | (seg_p >= n_seg)
    seg_p = jnp.where(invalid, n_pad - 1, seg_p)
    data_p = jnp.where(invalid[:, None], 0.0, data_p)

    interpret = jax.default_backend() == "cpu"  # tests run on the CPU mesh
    out = pl.pallas_call(
        _kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((_BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLK, f_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        interpret=interpret,
    )(seg_p[:, None], data_p)
    return out[:n_seg, :F]
