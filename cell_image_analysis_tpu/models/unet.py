"""StarDist-style 2D U-Net with probability + radial-distance heads.

Architecture contract from the reference's pretrained `2D_versatile_fluo`
(SURVEY.md section 2.2.3; call sites CAE_improved_modeltrain.py:118,
improved_detection.py:44): U-Net depth 3, 32 base filters, 3x3 kernels, two
convs per level, 128-channel conv head, two 1x1 heads — object probability
(sigmoid) and 32 radial distances — at grid=(2,2) output stride.  The grid
stride is realized by stopping the decoder one level above full resolution,
so the heads see H/2 x W/2 features.

No pretrained weights can be downloaded in this environment; the framework
instead provides in-framework training (train/unet_trainer.py) on labeled or
synthetic data, plus a weight-port utility for externally converted
checkpoints (io/artifacts.save_cae works for any flax variables pytree).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class StarDistUNet(nn.Module):
    n_rays: int = 32
    depth: int = 3
    base_filters: int = 32
    head_filters: int = 128
    grid: Tuple[int, int] = (2, 2)
    # compute dtype for the conv stack (params stay f32).  bfloat16 halves
    # the HBM activation footprint (the f32 level-0 activation pads 4x under
    # T(8,128) with 32 channels — it OOMs a 16-frame 1024^2 batch) and feeds
    # the MXU at 2x; heads are computed in f32.  Screening parity: prob
    # deviates ~1e-3 from the f32 forward, which only flips candidates
    # sitting that close to prob_thresh.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME",
                       dtype=cdt,
                       kernel_init=jax.nn.initializers.glorot_uniform())

        def block(h, f):
            h = nn.relu(conv(features=f)(h))
            h = nn.relu(conv(features=f)(h))
            return h

        skips = []
        h = x
        for lvl in range(self.depth):
            h = block(h, self.base_filters * (2 ** lvl))
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        h = block(h, self.base_filters * (2 ** self.depth))

        # decoder: stop `log2(grid)` levels above full resolution
        import math

        stop = int(math.log2(self.grid[0]))
        for lvl in reversed(range(stop, self.depth)):
            b, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            skip = skips[lvl]
            h = jnp.concatenate([h[:, : skip.shape[1], : skip.shape[2]], skip], axis=-1)
            h = block(h, self.base_filters * (2 ** lvl))

        feat = nn.relu(conv(features=self.head_filters)(h))
        feat = feat.astype(jnp.float32)
        prob = nn.sigmoid(nn.Conv(1, (1, 1))(feat))[..., 0]          # (B, H/g, W/g)
        dist = nn.softplus(nn.Conv(self.n_rays, (1, 1))(feat))       # (B, H/g, W/g, R)
        return prob, dist


def init_unet(key: jax.Array, size: int = 256, **kw) -> tuple[StarDistUNet, dict]:
    model = StarDistUNet(**kw)
    variables = model.init(key, jnp.zeros((1, size, size, 1), jnp.float32), train=False)
    return model, variables


@partial(jax.jit, static_argnames=("model",))
def unet_forward(model: StarDistUNet, variables: dict, x: jax.Array):
    return model.apply(variables, x, train=False)
