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
from cell_image_analysis_tpu.ops.percentile import normalize_percentile, percentile


@partial(jax.jit, static_argnames=("threshold_percentile", "pmin", "pmax", "connectivity"))
def threshold_segment(
    seg_channel: jax.Array,
    threshold_percentile: float = 90.0,
    pmin: float = 3.0,
    pmax: float = 99.8,
    connectivity: int = 1,
) -> jax.Array:
    """Percentile-normalize then threshold + connected components."""
    norm = normalize_percentile(seg_channel, pmin=pmin, pmax=pmax)
    thresh = percentile(norm, threshold_percentile)
    mask = norm > thresh
    labels, _ = label_components(mask, connectivity=connectivity)
    return labels


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
