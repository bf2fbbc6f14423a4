#!/usr/bin/env python
"""Two-tier U-Net precision rescue — gate-rate measurement (VERDICT r3
item 5).

The parity-safe "high" (3-pass bf16) U-Net convs cost ~87% of the r2s9
parity-fix regression (BENCH.md r2s10) and every conv decomposition
measured neutral-or-worse (r3s1).  The last untried lever is a two-tier
scheme: run the forward at DEFAULT precision (1 bf16 pass, ~71 ms vs
~128 ms) and recompute at "high" only where a decision could flip — a
prob value inside the default-vs-high error band around prob_thresh.

Viability is purely empirical and this probe measures it on REAL bench
frames: per frame, the count of band pixels, the count of 128px tiles
containing any (gated recompute would add a receptive-field halo of
~46 px per side), and the recompute fraction.  If every frame/tile has
band pixels (every cell's prob contour crosses the threshold band
somewhere), the gate always fires and two-tier degenerates to
always-high — a measured negative closing the axis.

Usage: python scripts/probe_twotier.py [n_frames] [size]
"""
import sys
from functools import partial

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.unet import StarDistUNet, unet_apply
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.utils.bench import (
    _make_frames,
    load_synthetic_unet_variables,
)

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
N_CELLS = 80 * (SIZE // 1024) ** 2 if SIZE >= 1024 else 20
PROB_THRESH = 0.479
TILE = 128          # image-space gating tile
HALO = 46           # U-Net depth-3 receptive field / 2 (image px)

print("backend:", jax.default_backend(), flush=True)
variables = load_synthetic_unet_variables()
model_hi = StarDistUNet(precision="high")
model_lo = StarDistUNet(precision="default")

fwd_hi = jax.jit(partial(unet_apply, model_hi, variables))
fwd_lo = jax.jit(partial(unet_apply, model_lo, variables))

frames = _make_frames(N_FRAMES, SIZE, N_CELLS, seed=42)
stack = jnp.asarray(
    np.stack(frames)[..., 2].astype(np.float32))[..., None]

norm = jax.jit(jax.vmap(normalize_percentile))(stack[..., 0])[..., None]

p_hi, d_hi = (np.asarray(a) for a in fwd_hi(norm))
p_lo, d_lo = (np.asarray(a) for a in fwd_lo(norm))
if p_hi.ndim == 4:
    p_hi, p_lo = p_hi[..., 0], p_lo[..., 0]

gstride = SIZE // p_hi.shape[1]  # grid=(2,2) -> 2
ep_all = float(np.abs(p_hi - p_lo).max())
ed_all = float(np.abs(d_hi - d_lo).max())
print(f"global bands: eps_prob {ep_all:.3e}  eps_dist {ed_all:.3e} "
      f"(the certificate a production gate would need a priori)", flush=True)

gated_frames = 0
fracs = []
for i in range(N_FRAMES):
    band = np.abs(p_hi[i] - PROB_THRESH) < ep_all
    n_band = int(band.sum())
    tg = TILE // gstride
    gh, gw = band.shape
    tiles = band[: gh // tg * tg, : gw // tg * tg]
    tiles = tiles.reshape(gh // tg, tg, gw // tg, tg).any(axis=(1, 3))
    n_tiles = int(tiles.sum())
    frac = min(1.0, n_tiles * (TILE + 2 * HALO) ** 2 / (SIZE * SIZE))
    fracs.append(frac)
    gated_frames += n_band > 0
    print(f"frame {i}: band px {n_band:6d}  tiles {n_tiles}/{tiles.size}"
          f"  -> tile-gated recompute ~{frac * 100:5.1f}% of frame px",
          flush=True)

print(f"frames gated (any band px): {gated_frames}/{N_FRAMES}; "
      f"mean tile recompute fraction {np.mean(fracs) * 100:.1f}% "
      f"(two-tier total cost ~= default + frac * high)", flush=True)
