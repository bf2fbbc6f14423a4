"""Segmentation backends: frame -> instance label map.

The reference uses pretrained StarDist `2D_versatile_fluo` through
`predict_instances` (CAE_improved_modeltrain.py:53-54,
improved_detection.py:62-63).  This framework provides:

- `stardist`: the StarDist-style path — JAX U-Net (models/unet.py) ->
  star-polygon candidates -> on-device NMS -> polygon rasterization
  (models/stardist.py).  Pretrained weights can be ported with
  utils/port_weights.py or trained in-framework (train/unet_trainer.py);
  this environment has no network access, so tests/benches use in-framework
  weights.
- `threshold`: a dependency-free classical fallback — percentile-normalize
  (csbdeep semantics), intensity threshold, on-device connected components.
  Useful for bring-up, golden tests, and as a deterministic baseline.

Both return an (H, W) int32 label map with instances numbered from 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.config import SegConfig
from cell_image_analysis_tpu.ops.cc import label_components
from cell_image_analysis_tpu.ops.percentile import kth_smallest, percentile_ranks


def binary_opening(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """Binary opening with the 4-connected cross (scipy binary_opening
    defaults, border_value=0): removes speckle components smaller than the
    structuring element so connected-components capacity isn't wasted on
    noise."""
    def shift4(m, combine, pad_val):
        outs = [m]
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            r = jnp.roll(m, (dr, dc), axis=(0, 1))
            if dr == 1:
                r = r.at[0, :].set(pad_val)
            elif dr == -1:
                r = r.at[-1, :].set(pad_val)
            if dc == 1:
                r = r.at[:, 0].set(pad_val)
            elif dc == -1:
                r = r.at[:, -1].set(pad_val)
            outs.append(r)
        acc = outs[0]
        for o in outs[1:]:
            acc = combine(acc, o)
        return acc

    for _ in range(iterations):
        mask = shift4(mask, jnp.logical_and, False)   # erosion
    for _ in range(iterations):
        mask = shift4(mask, jnp.logical_or, False)    # dilation
    return mask


@partial(jax.jit, static_argnames=("threshold_percentile", "pmin", "pmax", "opening"))
def threshold_mask(
    seg_channel: jax.Array,
    threshold_percentile: float = 90.0,
    pmin: float = 3.0,
    pmax: float = 99.8,
    opening: bool = True,
) -> jax.Array:
    """The threshold backend up to (but not including) labeling: percentile-
    normalize, threshold, denoise (binary opening).  The production screening
    path consumes this boolean mask directly through the run-length
    regionprops (ops/runs.py) and never materializes a label map.

    All three percentiles (pmin/pmax for the csbdeep normalization and the
    threshold) come from ONE set of sort-free order-statistic selections on
    the raw channel (ops/percentile.kth_smallest): the normalization is a
    monotone affine map, so the threshold percentile of the *normalized*
    array is that same map applied to the raw order statistics — this
    replaced two full 1M-element sorts per frame (~28 ms/8-frame batch,
    scripts/probe_percentile.py)."""
    x = seg_channel.astype(jnp.float32)
    eps = 1e-20
    rk = percentile_ranks(x.size, (pmin, pmax, threshold_percentile))
    ks = tuple(k for r in rk for k in r[:2])
    v = kth_smallest(x, ks)
    lerp = lambda i: v[2 * i] * (1.0 - jnp.float32(rk[i][2])) + v[2 * i + 1] * jnp.float32(rk[i][2])
    lo = lerp(0)
    hi = lerp(1)
    scale = hi - lo + eps
    norm = (x - lo) / scale
    g = lambda t: (t - lo) / scale
    thresh = g(v[4]) * (1.0 - jnp.float32(rk[2][2])) + g(v[5]) * jnp.float32(rk[2][2])
    mask = norm > thresh
    if opening:
        mask = binary_opening(mask)
    return mask


@partial(jax.jit, static_argnames=("threshold_percentile", "pmin", "pmax", "connectivity", "opening"))
def threshold_segment(
    seg_channel: jax.Array,
    threshold_percentile: float = 90.0,
    pmin: float = 3.0,
    pmax: float = 99.8,
    connectivity: int = 1,
    opening: bool = True,
) -> jax.Array:
    """Percentile-normalize, threshold, denoise (binary opening), connected
    components."""
    mask = threshold_mask(
        seg_channel, threshold_percentile=threshold_percentile,
        pmin=pmin, pmax=pmax, opening=opening,
    )
    labels, _ = label_components(mask, connectivity=connectivity)
    return labels


class StarDistBackend:
    """Identity-stable label-map segment_fn for the scoring graphs: the full
    StarDist `predict_instances` chain (percentile normalize -> U-Net ->
    top-K candidates -> star-polygon NMS -> rasterize) per frame, traced
    under vmap by pipeline/scoring._stage_a_graph.

    The scoring graphs jit-cache on segment_fn *identity* — hold ONE
    instance per set of weights (a fresh instance per batch would re-trace
    and re-fetch the remote compile every batch).  The U-Net weights are
    captured as trace constants, which is correct for screening (weights are
    fixed for the run) and lets XLA constant-fold layout conversions.

    Reference: improved_detection.py:62-63 (`predict_instances` on the
    normalized segmentation channel)."""

    returns_mask = False
    # __call__ returns (labels, overflow): overflow=True means a capacity
    # knob dropped information — the tiled rasterizer's per-tile m_cap
    # (cells missing from labels) or the sparse NMS pair budget
    # (suppressions possibly missed) — and the scoring host must re-run
    # with the fallback backend (raster_mode="scatter", exact NMS pairs)
    returns_overflow = True

    def __init__(self, variables: dict, cfg: SegConfig = SegConfig(), model=None,
                 runs_props: bool = True):
        from cell_image_analysis_tpu.models.unet import StarDistUNet

        self.variables = variables
        # runs_props: stage A computes stats through the run-length label
        # regionprops (ops/runs.regionprops_from_labels — no CC, no fg
        # compaction); on run-table overflow the pipeline re-runs with the
        # exact pixel path (pass a runs_props=False twin as
        # fallback_segment_fn).
        self.runs_props = runs_props
        import dataclasses

        from cell_image_analysis_tpu.models.unet import resolve_wb16

        # resolve "auto" ONCE and write it back: downstream consumers of
        # self.cfg (the spatial tiler, overflow twins) must run the same
        # conv formulation or tiled==fused bit-equality breaks
        cfg = dataclasses.replace(
            cfg, unet_wb16=resolve_wb16(getattr(cfg, "unet_wb16", "off"),
                                        variables))
        self.cfg = cfg
        self.model = model or StarDistUNet(
            n_rays=cfg.n_rays, depth=cfg.unet_depth,
            base_filters=cfg.base_filters, head_filters=cfg.head_filters,
            grid=cfg.grid, dtype=cfg.unet_dtype,
            precision=getattr(cfg, "unet_precision", "high"),
            lvl0_precision=(getattr(cfg, "unet_lvl0_precision", "") or None),
            lvl0_s2d=getattr(cfg, "unet_lvl0_s2d", True),
            winograd=getattr(cfg, "unet_winograd", "off"),
            hilo=getattr(cfg, "unet_hilo", "off"),
            wb16=cfg.unet_wb16,  # resolved above
        )

    def __call__(self, seg_channel: jax.Array):
        from cell_image_analysis_tpu.models.stardist import predict_instances

        labels, details = predict_instances(
            seg_channel, self.variables, self.cfg, model=self.model
        )
        return labels, (details.raster_overflow | details.nms_overflow
                        | details.cand_overflow)


def segment_frame(seg_channel: jax.Array, cfg: SegConfig = SegConfig(), unet_variables=None) -> jax.Array:
    """Dispatch on cfg.backend."""
    if cfg.backend == "threshold" or unet_variables is None:
        return threshold_segment(
            seg_channel,
            threshold_percentile=cfg.threshold_percentile,
            pmin=cfg.norm_pmin,
            pmax=cfg.norm_pmax,
        )
    from cell_image_analysis_tpu.models.stardist import predict_instances

    labels, _ = predict_instances(seg_channel, unet_variables, cfg)
    return labels
