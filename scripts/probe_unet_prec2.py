#!/usr/bin/env python
"""Per-layer U-Net precision/layout sweep: time AND parity, on-chip.

BENCH.md r2s10: the U-Net "high" (3-pass bf16) convs are ~87% of the
parity-fix regression (3331 -> 2309 cells/s/chip) — under "high" the
forward is MXU-bound, so FLOP structure now matters:
  - the s2d level-0 rewrite is 4x the FLOPs of the standard layout
    (618 vs 155 GFLOP for Conv_1 per 8x1024^2 batch) — a win only when
    HBM-bound;
  - level-0's rounding error may wash out through the net, letting
    level 0 run single-pass (default) while the rest stays "high".

For each scheme this probe measures (a) the forward time on a realistic
8x1024^2 synthetic batch (single fetch, best of 5), (b) prob deviation +
prob_thresh flips vs the HIGHEST reference, and (c) the production-
relevant parity: equality of the top-K candidate index set AND the NMS
survivor set (candidate ORDER feeds greedy NMS, so close-prob swaps
matter, not just threshold flips).

Pass `layers` as argv[1] to additionally run per-layer leave-one-out at
default precision (accuracy only; 15 extra compiles).

Usage: python scripts/probe_unet_prec2.py [layers]
"""
import sys, time
from functools import partial

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.config import SegConfig
from cell_image_analysis_tpu.models.stardist import _pad_to_multiple
from cell_image_analysis_tpu.models.unet import StarDistUNet, apply_unet_s2d, dist_head_rows
from cell_image_analysis_tpu.ops.nms import star_nms
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.utils.bench import _make_frames, load_synthetic_unet_variables

BATCH, SIZE = 8, 1024
PROB_THRESH = SegConfig.prob_thresh
MAXC = 256

variables = load_synthetic_unet_variables()
frames = _make_frames(BATCH, SIZE, 80)
segs = np.stack(frames)[..., 2].astype(np.float32)


@jax.jit
def _norm(segs):
    def one(s):
        x = normalize_percentile(s, SegConfig.norm_pmin, SegConfig.norm_pmax)
        return _pad_to_multiple(x, 2 ** SegConfig.unet_depth)
    return jax.vmap(one)(jnp.asarray(segs))


x = np.asarray(_norm(segs))[..., None]  # (B, H, W, 1) normalized, padded
xj = jnp.asarray(x)

SCHEMES = [
    # (name, precision, lvl0_precision, lvl0_s2d, prec_map)
    ("highest",    "highest", None,      True,  None),
    ("high_s2d",   "high",    None,      True,  None),   # r2s9 default
    ("high_std0",  "high",    None,      False, None),   # standard level 0
    ("mix_s2d",    "high",    "default", True,  None),   # lvl0 single-pass
    ("mix_std0",   "high",    "default", False, None),
    ("default",    "default", None,      True,  None),   # sanity: 390 flips
]

if len(sys.argv) > 1 and sys.argv[1] == "layers":
    for i in range(15):
        SCHEMES.append((f"loo_Conv_{i}", "high", None, True, {f"Conv_{i}": "default"}))


def cand_and_keep(prob, feat):
    """Production candidate path: top-K, dist head on rows, NMS."""
    hp, wp = prob.shape
    top_p, top_i = jax.lax.top_k(prob.reshape(-1), MAXC)
    cd = dist_head_rows(variables, feat.reshape(-1, feat.shape[-1])[top_i])
    cd = jnp.maximum(cd, 1e-3)
    valid = top_p > PROB_THRESH
    rows = (top_i // wp).astype(jnp.float32) * 2
    cols = (top_i % wp).astype(jnp.float32) * 2
    centers = jnp.stack([rows, cols], axis=1)
    keep = star_nms(centers, cd, top_p, valid, nms_thresh=SegConfig.nms_thresh,
                    metric=SegConfig.nms_metric)
    return top_i, keep, centers


results = {}
for name, p, p0, s2d0, pmap in SCHEMES:
    model = StarDistUNet(precision=p, lvl0_precision=p0, lvl0_s2d=s2d0)

    def fwd_fn(xb, model=model, pmap=pmap):
        prob, feat = apply_unet_s2d(model, variables, xb, late_dist=True,
                                    prec_map=pmap)
        return prob, feat

    fwd = jax.jit(fwd_fn)
    prob, feat = fwd(xj)
    float(prob.sum())
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        pr, ft = fwd(xj)
        float(pr.sum() + ft[..., 0].sum())  # one fetch
        best = min(best, time.perf_counter() - t0)

    pipe = jax.jit(lambda xb, fwd=fwd: jax.vmap(cand_and_keep)(*fwd(xb)))
    top_i, keep, centers = pipe(xj)
    results[name] = (best, np.asarray(prob), np.asarray(top_i),
                     np.asarray(keep), np.asarray(centers))
    print(f"  {name:12s}: {best*1e3:8.1f} ms", flush=True)

p0, ti0, k0, c0 = results["highest"][1:]
print(f"\npixels above prob_thresh (highest): {int((p0 > PROB_THRESH).sum())}",
      flush=True)
print(f"survivors (highest): {int(k0.sum())}", flush=True)
for name, *_ in SCHEMES:
    if name == "highest":
        continue
    t, p, ti, k, c = results[name]
    flips = int(((p > PROB_THRESH) != (p0 > PROB_THRESH)).sum())
    # candidate-index SET equality per frame (order-insensitive)
    cand_eq = all(set(ti[b].tolist()) == set(ti0[b].tolist()) for b in range(BATCH))
    # NMS survivor CENTER set equality per frame
    surv_eq = True
    for b in range(BATCH):
        s1 = {tuple(c0[b][i]) for i in range(MAXC) if k0[b][i]}
        s2 = {tuple(c[b][i]) for i in range(MAXC) if k[b][i]}
        if s1 != s2:
            surv_eq = False
            break
    print(f"  {name:12s}: {t*1e3:7.1f} ms  max|dprob|={np.abs(p - p0).max():.2e}  "
          f"flips={flips:4d}  cand_set_eq={cand_eq}  nms_surv_eq={surv_eq}",
          flush=True)
