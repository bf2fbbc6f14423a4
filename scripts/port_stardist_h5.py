#!/usr/bin/env python
"""Convert a genuine StarDist Keras H5 checkpoint into this framework's
U-Net weight artifact — the documented offline path for users holding the
pretrained `2D_versatile_fluo` model the reference downloads at runtime
(/root/reference/CAE_improved_modeltrain.py:118, improved_detection.py:44).

On a machine WITH network access:

    from stardist.models import StarDist2D
    m = StarDist2D.from_pretrained("2D_versatile_fluo")
    # weights land in ~/.keras/models/StarDist2D/2D_versatile_fluo/weights_best.h5

Copy that `.h5` here, then:

    python scripts/port_stardist_h5.py weights_best.h5 --out assets/unet_fluo.pkl
    python -m cell_image_analysis_tpu.cli screen --unet-weights assets/unet_fluo.pkl ...

The port maps Keras conv (kernel, bias) pairs onto the flax tree by
shape-matched order-preserving pairing (utils/port_weights.py — validated
by a genuine-Keras-H5 round trip in tests/test_port_weights.py, both heads
<= 2e-5).  The architecture must match SegConfig defaults (depth 3, 32 base
filters, 32 rays, grid (2,2) — exactly `2D_versatile_fluo`'s); pass
--n-rays/--depth/--base-filters for other pretrained variants.

Runs on CPU; no TPU needed.
"""
import argparse
import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cell_image_analysis_tpu.models.unet import init_unet
from cell_image_analysis_tpu.utils.port_weights import (
    load_keras_h5_weights,
    port_conv_weights,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("h5", help="Keras H5 weight file from a StarDist model "
                               "folder (e.g. 2D_versatile_fluo/weights_best.h5)")
    ap.add_argument("--out", default="assets/unet_ported.pkl")
    ap.add_argument("--n-rays", type=int, default=32)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--base-filters", type=int, default=32)
    args = ap.parse_args()

    model, variables = init_unet(
        jax.random.PRNGKey(0), size=256, n_rays=args.n_rays,
        depth=args.depth, base_filters=args.base_filters)
    h5_layers = load_keras_h5_weights(args.h5)
    params = port_conv_weights(variables["params"], h5_layers)

    # smoke-check: ported forward runs and the prob head is a probability
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 256, 256, 1)).astype(np.float32))
    prob, dist = model.apply({"params": params}, x, train=False)
    assert prob.ndim == 3 and dist.shape[-1] == args.n_rays  # prob (B,h,w)
    pmin, pmax = float(prob.min()), float(prob.max())
    assert 0.0 <= pmin <= pmax <= 1.0, (pmin, pmax)
    print(f"ported {len(h5_layers)} H5 layers; prob range [{pmin:.4f}, {pmax:.4f}]")

    payload = {
        "magic": "cell_image_analysis_tpu/unet-synthetic-v1",
        "params": jax.tree.map(np.asarray, params),
        "meta": {"source_h5": os.path.abspath(args.h5), "ported": True,
                 "n_rays": args.n_rays, "depth": args.depth,
                 "base_filters": args.base_filters},
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
