"""Connected-component labeling on device.

Used by the "threshold" segmentation backend (SegConfig.backend='threshold')
— the in-framework fallback when no trained StarDist-style U-Net weights are
available — and by tests as a device counterpart of scipy.ndimage.label.

Algorithm: iterative min-label propagation.  Each foreground pixel starts
with its own linear index + 1; every sweep replaces a pixel's label with the
minimum over itself and its foreground neighbors (4- or 8-connectivity).
Convergence takes O(longest geodesic path) sweeps — bounded and fast for
blob-like cells — and runs as a `lax.while_loop` with a change flag, so XLA
keeps the whole loop on device.  A final compaction pass renumbers components
to 1..K via a cumulative count of root labels (root = pixel whose final label
equals its own index + 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.iinfo(jnp.int32).max


def _neighbor_min(lbl: jax.Array, connectivity: int) -> jax.Array:
    """Min positive label over the neighborhood (INF where none).

    Implemented with a pad + static slices (fusable elementwise graph) rather
    than roll + scatter edge fixes, which cost a buffer copy per direction."""
    h, w = lbl.shape
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if connectivity == 2:
        shifts += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    masked = jnp.where(lbl > 0, lbl, _INF)
    padded = jnp.pad(masked, 1, constant_values=_INF)
    best = masked
    for dr, dc in shifts:
        # value of the neighbor at offset (dr, dc)
        best = jnp.minimum(best, padded[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w])
    return best


def _shift(x: jax.Array, off: int, axis: int, fill) -> jax.Array:
    """x shifted by `off` along `axis` (value of the element `off` away),
    edges filled — pad + static slice, fusable like _neighbor_min."""
    h, w = x.shape
    if axis == 0:
        padded = jnp.pad(x, ((abs(off), abs(off)), (0, 0)), constant_values=fill)
        return padded[abs(off) + off : abs(off) + off + h, :]
    padded = jnp.pad(x, ((0, 0), (abs(off), abs(off))), constant_values=fill)
    return padded[:, abs(off) + off : abs(off) + off + w]


def _run_ids(mask: jax.Array, axis: int) -> jax.Array:
    """Per-pixel id of its contiguous foreground run along `axis` (the index
    of the run's first element + 1; background pixels get unique negatives so
    they never match).  One cummax — computed once per CC call, outside the
    propagation loop."""
    n = mask.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, mask.shape, axis)
    # run start = latest barrier position + 1 before/at each pixel
    start = jax.lax.cummax(jnp.where(mask, 0, pos + 1), axis=axis)
    flat_id = start
    return jnp.where(mask, flat_id, -(pos + 2))  # bg: unique per lane, < 0


def _run_min(val: jax.Array, rid: jax.Array, axis: int) -> jax.Array:
    """Minimum over each foreground run along `axis` via strided doubling:
    a stride-s exchange is valid iff both pixels share a run id (everything
    between is then foreground too), so log2(n) cheap fused shift+min passes
    replace a segmented scan."""
    n = val.shape[axis]
    s = 1
    while s < n:
        for off in (s, -s):
            sv = _shift(val, off, axis, _INF)
            sr = _shift(rid, off, axis, -1)
            val = jnp.where(sr == rid, jnp.minimum(val, sv), val)
        s *= 2
    return val


def _iota_labels(mask: jax.Array) -> jax.Array:
    h, w = mask.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    return jnp.where(mask, idx + 1, 0)


def _sweep_fixpoint(mask, lbl0, connectivity, sweeps_per_check):
    """Min-propagation to fixpoint from an arbitrary valid initialization
    (every positive init value must be `index+1` of a pixel in the same
    component — then the fixpoint is the component min, independent of
    init; better inits just converge in fewer sweeps)."""
    def cond(state):
        return state[1]

    def body(state):
        lbl, _ = state
        new = lbl
        for _ in range(sweeps_per_check):
            nm = _neighbor_min(new, connectivity)
            new = jnp.where(mask, jnp.minimum(jnp.where(new > 0, new, _INF), nm), 0)
            new = jnp.where(new == _INF, 0, new)
        return new, jnp.any(new != lbl)

    # initial flag derived from lbl0 (always True) so its type matches the
    # body output under shard_map's varying-axes typing
    lbl, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.any(lbl0 >= 0)))
    return lbl


def _hier_labels(mask, connectivity, sweeps_per_check, levels=3):
    """Hierarchically-initialized min-propagation.

    Coarse mask = AND over 2x2 blocks: two adjacent solid blocks are always
    fine-connected, so coarse connectivity is a SUBSET of fine connectivity
    and the coarse fixpoint (computed recursively at 1/4 the cost per
    sweep) is a *valid initialization* for the fine level — each solid
    block's pixels start at the fine index of its coarse component's min
    block's top-left pixel, which is a member of the same fine component.
    Fine sweeps then only need to propagate across non-solid bridges
    (boundary bands, 1-px necks) instead of whole blob-chain geodesics."""
    h, w = mask.shape
    if levels <= 0 or h % 2 or w % 2 or min(h, w) < 256:
        return _sweep_fixpoint(mask, _iota_labels(mask), connectivity, sweeps_per_check)
    cm = mask[0::2, 0::2] & mask[1::2, 0::2] & mask[0::2, 1::2] & mask[1::2, 1::2]
    # conn-1 on the coarse grid is a safe subset of fine conn 1 and 2
    cl = _hier_labels(cm, 1, sweeps_per_check, levels - 1)
    cw2 = w // 2
    ci = cl - 1
    fine_val = jnp.where(cl > 0, (2 * (ci // cw2)) * w + 2 * (ci % cw2) + 1, 0)
    up = jnp.repeat(jnp.repeat(fine_val, 2, axis=0), 2, axis=1)
    own = _iota_labels(mask)
    lbl0 = jnp.where(mask, jnp.where(up > 0, jnp.minimum(own, up), own), 0)
    return _sweep_fixpoint(mask, lbl0, connectivity, sweeps_per_check)


@partial(jax.jit, static_argnames=("connectivity", "sweeps_per_check", "impl"))
def label_components(
    mask: jax.Array, connectivity: int = 1, sweeps_per_check: int = 4,
    impl: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Label connected components of a boolean (H, W) mask.

    Returns (labels, count): labels is int32 with background 0 and components
    numbered 1..count in raster order of their topmost-leftmost pixel
    (matching scipy.ndimage.label's numbering).

    impl="scan": each iteration takes the run minimum along every row then
    every column — a label crosses an entire straight run per pass, so
    convergence takes O(#bends) iterations instead of O(geodesic diameter)
    sweeps.  Run minima use strided doubling guarded by precomputed run ids
    (a stride-s exchange is valid iff both pixels share a run) — log2(n)
    cheap fused shift+min passes; a lax.associative_scan formulation of the
    same idea measured 2x SLOWER than sweeps (313 vs 169 ms on 8x1024^2,
    its recursive halving materializes poorly), while this one wins
    slightly (159 vs 169 ms) and by much more on serpentine structures.
    For connectivity=2 a diagonal neighbor-min sweep follows the scans.

    impl="sweeps": plain min-propagation; `sweeps_per_check` sweeps run
    between convergence reductions — the full-array `any()` check costs
    about as much as a sweep, so batching sweeps cuts loop overhead at the
    price of at most sweeps_per_check-1 wasted sweeps after convergence.

    impl="pallas": the whole convergence loop runs in one Pallas kernel with
    the label image VMEM-resident (ops/pallas/cc_kernel.py) — the sweep
    impls are HBM-bandwidth-bound at ~5 full arrays per sweep, this one
    reads the mask and writes the labels once.

    impl="hier": sweeps initialized from a recursively computed coarse
    (2x2-AND) fixpoint — coarse connectivity is a provable subset of fine
    connectivity, so the init is valid and the fine level only propagates
    across non-solid bridges instead of whole component geodesics.

    impl="auto": hier on TPU, sweeps elsewhere.  All impls reach the
    identical fixpoint (component-min labels), so the choice never changes
    results.
    """
    h, w = mask.shape
    if impl == "auto":
        # all four impls measured within noise of each other on blob masks
        # (~160-190 ms on 8x1024^2; see BENCH.md) — convergence is bound by
        # geodesics through THIN structures, which neither run-scans, the
        # VMEM-resident kernel, nor hierarchical init shorten.  scan is the
        # marginal winner with no VMEM caveats.
        impl = "scan" if jax.default_backend() == "tpu" else "sweeps"
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + jax.lax.broadcasted_iota(
        jnp.int32, (h, w), 1
    )
    lbl0 = jnp.where(mask, idx + 1, 0)

    def cond(state):
        _, changed = state
        return changed

    rid_row = _run_ids(mask, 1) if impl == "scan" else None
    rid_col = _run_ids(mask, 0) if impl == "scan" else None

    def body_scan(state):
        lbl, _ = state
        val = jnp.where(mask, lbl, _INF)
        val = _run_min(val, rid_row, 1)
        val = _run_min(val, rid_col, 0)
        new = jnp.where(mask, val, 0)
        if connectivity == 2:
            nm = _neighbor_min(new, 2)
            new = jnp.where(mask, jnp.minimum(jnp.where(new > 0, new, _INF), nm), 0)
            new = jnp.where(new == _INF, 0, new)
        return new, jnp.any(new != lbl)

    if impl == "pallas":
        from cell_image_analysis_tpu.ops.pallas.cc_kernel import cc_min_labels_pallas

        lbl = cc_min_labels_pallas(mask, connectivity=connectivity)
    elif impl == "hier":
        lbl = _hier_labels(mask, connectivity, sweeps_per_check)
    elif impl == "sweeps":
        lbl = _sweep_fixpoint(mask, lbl0, connectivity, sweeps_per_check)
    else:
        body = body_scan
        # initial flag derived from lbl0 (always True) so its type matches
        # the body output under shard_map's varying-axes typing (a literal
        # True is replicated; jnp.any(...) inside the body is device-varying)
        lbl, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.any(lbl0 >= 0)))

    # compact to 1..K in raster order of component minima
    flat = lbl.reshape(-1)
    is_root = jnp.zeros(h * w + 1, dtype=jnp.int32).at[flat].set(1).at[0].set(0)
    # is_root[i+1] == 1 iff some component's min linear index is i
    prefix = jnp.cumsum(is_root)
    compact = jnp.where(mask, prefix[flat].reshape(h, w), 0)
    count = prefix[-1]
    return compact.astype(jnp.int32), count
