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

from cell_image_analysis_tpu.utils import prec as prec_util


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
    # XLA contraction precision for the convs.  The TPU default lowers f32
    # convs to a SINGLE bf16 MXU pass (measured scripts/probe_unet_prec.py:
    # max|dprob| 1.8e-2 vs true f32, 390 prob_thresh flips per 8x1024^2
    # batch); "high" (3-pass bf16) restores ~f32 numerics (1e-4, 0 flips).
    # Under "high" the fused forward is MXU-bound (3x FLOPs; BENCH.md
    # r2s10: the U-Net tier is 87% of the parity-fix regression), so the
    # level-0 convs get their own knobs below.  "default" opts back into
    # the fast single pass.
    precision: str = "high"
    # Precision override for the two level-0 convs only (None -> follow
    # `precision`).  Level-0 is 26% of the s2d forward's FLOPs but its
    # rounding error may wash out through the net — measured per-layer by
    # scripts/probe_unet_prec2.py before promoting any mix.
    lvl0_precision: str | None = None
    # Compute level 0 in space-to-depth layout (s2d fast path only).  s2d
    # trades 4x FLOPs for 4x less HBM (the f32 32-channel activation pads
    # 4x under T(8,128)) — a win when the forward is HBM-bound (default
    # precision), a loss when MXU-bound ("high").
    lvl0_s2d: bool = True
    # Winograd F(2x2, 3x3) for the 3x3 convs whose precision resolves to
    # "high" (s2d fast path only): 16 multiplies per 2x2 output tile
    # instead of 36, so 3-pass products cost 1.33x a single-pass direct
    # conv instead of 3x (BENCH.md r2s10: the "high" tier made the fused
    # U-Net MXU-bound).  "jax" = pure-XLA formulation (ops/winograd.py,
    # Winograd domain in HBM); "pallas" = fused kernel (ops/pallas/
    # winograd.py, Winograd domain in VMEM); "auto" = pallas only on the
    # layers where it measured a win on-chip (ci <= 64, see _wino_mode);
    # "off" = direct 3-pass conv.
    winograd: str = "off"
    # Hi/lo channel-packed single-pass conv (ops/hilo_conv.py) for the 3x3
    # convs whose precision resolves to "high" (s2d fast path only): the
    # same three bf16 products as XLA "high" computed in ONE default conv
    # on packed bf16-exact operands.  "auto" = only the layers where it
    # measured a win on-chip (ci <= 64 — where "high" is layout-bound);
    # "all" = every high 3x3 conv; "off" = direct 3-pass.  Takes precedence
    # over `winograd` where both would apply.
    hilo: str = "off"
    # bf16-exact-kernel 2-pass conv (ops/hilo_conv.wb16_conv) for the convs
    # whose precision resolves to "high" (s2d fast path only).  Requires the
    # ARTIFACT to ship bf16-exact kernels (round_kernels_bf16 at artifact
    # build; kernels_bf16_exact verifies) — then "high"'s three products
    # collapse to two (W_lo == 0), computed in one default conv on
    # [x_hi, x_lo] packed operands.  "pack" = packed single conv, "split" =
    # two barriered convs, "off" = direct 3-pass.  Callers resolve "auto" ->
    # "pack"/"off" via `resolve_wb16(mode, variables)` BEFORE constructing
    # the module.  Takes precedence over `hilo`/`winograd`.
    wb16: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        prec = _prec(self.precision)
        prec0 = _prec(self.lvl0_precision or self.precision)
        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME",
                       dtype=cdt,
                       kernel_init=jax.nn.initializers.glorot_uniform())

        def block(h, f, p=prec):
            h = nn.relu(conv(features=f, precision=p)(h))
            h = nn.relu(conv(features=f, precision=p)(h))
            return h

        skips = []
        h = x
        for lvl in range(self.depth):
            h = block(h, self.base_filters * (2 ** lvl),
                      p=prec0 if lvl == 0 else prec)
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

        feat = nn.relu(conv(features=self.head_filters, precision=prec)(h))
        feat = feat.astype(jnp.float32)
        prob = nn.sigmoid(nn.Conv(1, (1, 1), precision=prec)(feat))[..., 0]
        dist = nn.softplus(nn.Conv(self.n_rays, (1, 1), precision=prec)(feat))
        return prob, dist


# The pure-XLA Winograd formulation materializes the (16, B*ho*wo, Ci) and
# (16, B*ho*wo, Co) Winograd-domain tensors in HBM — ~4 GB per big U-Net
# layer at the production 8x1024^2 batch, which OOMs exactly the layers
# Winograd targets.  Above this byte budget "jax" routes to the VMEM-fused
# Pallas kernel on TPU and to the direct 3-pass conv elsewhere.
_WINO_JAX_HBM_BUDGET = 512 * 1024 * 1024


def _wino_mode(mode: str, h_shape, w_shape) -> str:
    """Resolve the requested Winograd mode for one conv call.

    - "pallas" off-TPU falls back to the "jax" formulation (the Pallas TPU
      kernel has no CPU lowering; the jax path is its numerics twin modulo
      product tier — HIGH vs explicit hi/lo 3-pass — so CPU parity tests can
      exercise the dispatch).
    - "jax" above the Winograd-domain HBM gate routes to "pallas" on TPU and
      to the direct conv ("off") elsewhere.
    """
    ci, co = w_shape[2], w_shape[3]

    def pallas_ok():
        # lane alignment: the kernel's halo DMA slices the (.., 4Ci) z tensor
        # in its lane dim, which Mosaic requires 128-aligned -> Ci % 32 == 0.
        # Thin-channel convs (the 1->32 input conv: Ci=4 in s2d layout) fall
        # back to the direct 3-pass conv — their FLOP share is negligible.
        return jax.default_backend() == "tpu" and ci % 32 == 0

    if mode == "auto":
        # measured per-layer policy (scripts/probe_wino.py, BENCH.md r3):
        # the Pallas kernel beats the direct 3-pass "high" conv exactly on
        # the narrow-channel layers (ci <= 64: Conv_3 57.1 -> 43.3 ms,
        # Conv_12 55.3 -> 43.1 at 8x1024^2 — the layers where the direct
        # high conv is layout-bound, f32 64-channel activations padding 2x
        # under the (8, 128) lane tiling) and loses on the wide ones
        # (ci >= 128: wrapper s2d/d2s HBM round trips dominate).
        mode = "pallas" if (pallas_ok() and ci <= 64) else "off"
    if mode == "pallas" and jax.default_backend() != "tpu":
        mode = "jax"
    if mode == "pallas" and not pallas_ok():
        mode = "off"
    if mode == "jax":
        b, hh, ww = h_shape[0], h_shape[1], h_shape[2]
        n_tiles = b * (hh // 2) * (ww // 2)
        if 16 * n_tiles * (ci + co) * 4 > _WINO_JAX_HBM_BUDGET:
            mode = "pallas" if pallas_ok() else "off"
    return mode


def _prec(name: str | None):
    """Map a precision name ("default"/"high"/"highest"/None) to the
    jax.lax.Precision passed to convs; None/"default" keeps the backend
    default (single-pass bf16 on TPU)."""
    if name is None or name == "default":
        return None
    return jax.lax.Precision[name.upper()]


def _s2d(x: jax.Array) -> jax.Array:
    """Space-to-depth factor 2: (B, H, W, C) -> (B, H/2, W/2, 4C) with
    channel layout (row-subpixel, col-subpixel, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel(W: jax.Array) -> jax.Array:
    """Transform a 3x3 stride-1 SAME correlation kernel (3, 3, Ci, Co) into
    the equivalent kernel (3, 3, 4Ci, 4Co) over space-to-depth inputs.

    For output subpixel a and kernel row u, the original tap offset
    s = a + u - 1 lands in transformed block row P = s // 2 + 1 at input
    subpixel row c = s % 2 (floor semantics; borders map to the SAME-padded
    zero block exactly as the original zero padding).  Channel layouts match
    `_s2d`.  Exact up to f32 summation reassociation in the conv."""
    kh, kw, Ci, Co = W.shape
    assert (kh, kw) == (3, 3)
    Wp = jnp.zeros((3, 3, 4 * Ci, 4 * Co), W.dtype)
    for a in range(2):
        for u in range(3):
            s = a + u - 1
            P, c = s // 2 + 1, s % 2
            for b in range(2):
                for v in range(3):
                    t = b + v - 1
                    Q, d = t // 2 + 1, t % 2
                    Wp = Wp.at[
                        P, Q,
                        (c * 2 + d) * Ci:(c * 2 + d + 1) * Ci,
                        (a * 2 + b) * Co:(a * 2 + b + 1) * Co,
                    ].set(W[u, v])
    return Wp


def _d2s(x: jax.Array) -> jax.Array:
    """Depth-to-space factor 2 (inverse of `_s2d`):
    (B, H, W, 4C) -> (B, 2H, 2W, C)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _s2d_kernel_1x1(W: jax.Array) -> jax.Array:
    """Transform a 1x1 kernel (1, 1, Ci, Co) into the block-diagonal
    (1, 1, 4Ci, 4Co) equivalent over space-to-depth tensors (each subpixel's
    channels map only to that subpixel's outputs)."""
    _, _, Ci, Co = W.shape
    Wp = jnp.zeros((1, 1, 4 * Ci, 4 * Co), W.dtype)
    for k in range(4):
        Wp = Wp.at[0, 0, k * Ci:(k + 1) * Ci, k * Co:(k + 1) * Co].set(W[0, 0])
    return Wp


def _up_kernel(W: jax.Array) -> jax.Array:
    """Transform a 3x3 SAME kernel (3, 3, Ci, Co) applied to the NEAREST-2x
    upsample of h into an equivalent 3x3 SAME kernel (3, 3, Ci, 4Co) applied
    to h directly, producing the four output subpixels as channel blocks
    (space-to-depth layout, matching `_s2d`).

    Output pixel (2i+a, 2j+b) of conv3x3(up) reads up[2i+a+u-1, 2j+b+v-1] =
    h[(2i+a+u-1)//2, (2j+j..)//2]; for phase a the tap row offsets dr on h
    are a=0: {u=0 -> -1, u=1,2 -> 0}, a=1: {u=0,1 -> 0, u=2 -> +1} (borders
    hit the same SAME zero padding in both forms).  Taps mapping to the same
    offset sum; exact up to f32 conv reassociation."""
    kh, kw, Ci, Co = W.shape
    assert (kh, kw) == (3, 3)
    # rows[a][dr+1] = list of original tap indices u landing at offset dr
    taps = {0: ([0], [1, 2], []), 1: ([], [0, 1], [2])}
    Wp = jnp.zeros((3, 3, Ci, 4 * Co), W.dtype)
    for a in range(2):
        for b in range(2):
            blk = jnp.zeros((3, 3, Ci, Co), W.dtype)
            for dr in range(3):
                for dc in range(3):
                    acc = None
                    for u in taps[a][dr]:
                        for v in taps[b][dc]:
                            acc = W[u, v] if acc is None else acc + W[u, v]
                    if acc is not None:
                        blk = blk.at[dr, dc].set(acc)
            Wp = Wp.at[:, :, :, (a * 2 + b) * Co:(a * 2 + b + 1) * Co].set(blk)
    return Wp


_WB16_CACHE: dict[int, bool] = {}


def resolve_wb16(mode: str, variables: dict) -> str:
    """Resolve a SegConfig.unet_wb16 mode to a concrete module setting.

    "auto" (the safe default for arbitrary artifacts) becomes "pack" iff the
    artifact's conv kernels are bf16-exact (one host-side numpy check,
    cached per params object) — bundled artifacts built with
    `round_kernels_bf16` get the 2-pass conv, genuine f32 Keras imports
    silently keep the 3-pass "high" path."""
    if mode in ("off", "pack", "split"):
        return mode
    params = variables.get("params", variables)
    key = id(params)
    if key not in _WB16_CACHE:
        from cell_image_analysis_tpu.ops.hilo_conv import kernels_bf16_exact

        _WB16_CACHE[key] = kernels_bf16_exact(params)
    return "pack" if _WB16_CACHE[key] else "off"


def apply_unet_s2d(model: StarDistUNet, variables: dict, x: jax.Array,
                   train: bool = False, tail_s2d: bool | None = None,
                   late_dist: bool = False,
                   prec_map: dict | None = None):
    """Fast functional forward for grid=(2,2): level 0 is computed in
    space-to-depth layout so the (B, H, W, 32) float32 activation — which
    pads 4x under the TPU's T(8, 128) tiling and is never consumed as a skip
    (the decoder stops one level above full resolution) — becomes an
    unpadded (B, H/2, W/2, 128) tensor.  conv3x3(1->32), conv3x3(32->32) and
    the 2x2 maxpool are rewritten as conv3x3(4->128), conv3x3(128->128) and
    a channel-group max; identical math up to f32 reassociation (the MXU
    time is unchanged — the rewrite trades the padded lanes for real work —
    but level-0 HBM traffic drops ~4x).

    Reads the exact `StarDistUNet.init` param pytree (Conv_0..Conv_14);
    parity vs `model.apply` is tested in tests/test_unet_s2d.py.

    `tail_s2d` additionally computes decoder level 1 + the heads in s2d
    layout (None -> env `CIA_UNET_S2D_TAIL`, default off until the on-chip
    A/B proves a win — scripts/probe_unet_ab.py; separate-session runs
    measured no improvement over the standard tail).

    `late_dist` returns `(prob, feat)` instead of `(prob, dist)`, skipping
    the 32-ray dist head entirely: the dist map is only ever read at the
    top-K candidate pixels (models/stardist.py), so computing softplus(
    conv1x1(feat)) over all H/2 x W/2 pixels writes + re-reads a
    (B, H/2, W/2, 32) float32 tensor per batch for K=256 useful rows.
    Callers gather feat rows at the candidate indices and apply
    `dist_head_rows` (the same 1x1 contraction as a (K, 128) matmul).
    Forces the standard-layout tail (feat indices must match prob's)."""
    if late_dist:
        tail_s2d = False
    if tail_s2d is None:
        import os

        tail_s2d = os.environ.get("CIA_UNET_S2D_TAIL", "0") == "1"
    assert model.grid == (2, 2) and model.depth == 3, "s2d path: grid (2,2)/depth 3"
    p = variables["params"]
    cdt = jnp.bfloat16 if model.dtype == "bfloat16" else jnp.float32
    prec = _prec(model.precision)
    lvl0_prec = _prec(model.lvl0_precision or model.precision)
    dn = ("NHWC", "HWIO", "NHWC")

    def prec_for(name, default):
        # probe-only per-layer override (scripts/probe_unet_prec2.py)
        if prec_map is not None and name in prec_map:
            return _prec(prec_map[name])
        return default

    _UNSET = object()  # None is a real value (backend default = 1-pass bf16)
    use_wino = model.winograd != "off" and cdt == jnp.float32
    hilo = getattr(model, "hilo", "off")
    use_hilo = hilo != "off" and cdt == jnp.float32
    wb16 = getattr(model, "wb16", "off")
    use_wb16 = wb16 != "off" and cdt == jnp.float32

    def conv(h, name, kernel=None, bias=None, precision=_UNSET):
        W = p[name]["kernel"] if kernel is None else kernel
        b = p[name]["bias"] if bias is None else bias
        pr = prec_for(name, prec if precision is _UNSET else precision)
        if (use_wb16 and pr == jax.lax.Precision.HIGH
                and (wb16 in ("pack-all", "split-all") or W.shape[2] <= 64)):
            # bf16-exact kernels: "high" numerics from 2 products instead of
            # 3, in one default conv (ops/hilo_conv.wb16_conv).  Valid for
            # any spatial kernel size; _s2d_kernel outputs stay bf16-exact
            # (pure entry placement) so the s2d level 0 qualifies too.
            # "pack"/"split" gate to ci <= 64 — the measured-win layers
            # (probe_wb16.py: Conv_3 34.4 vs high 55.8 ms, Conv_12 33.4 vs
            # 53.0; ci >= 128 loses to the 2Ci packed-input
            # materialization: Conv_10 53.5 vs 49.5).  "-all" suffix =
            # ungated (probe use).
            from cell_image_analysis_tpu.ops.hilo_conv import (
                wb16_conv,
                wb16_conv_split,
            )

            impl = (wb16_conv_split if wb16 in ("split", "split-all")
                    else wb16_conv)
            return impl(h.astype(jnp.float32), W.astype(jnp.float32),
                        b.astype(jnp.float32), dimension_numbers=dn)
        if (use_hilo and W.shape[0] == 3 and W.shape[1] == 3
                and pr == jax.lax.Precision.HIGH
                and (hilo in ("all", "sum") or W.shape[2] <= 64)):
            # XLA "high"'s three products at explicit hi/lo bf16 operands,
            # f32-accumulated (ops/hilo_conv.py): "sum"/"sum-auto" = three
            # separate bf16-operand convs (half the operand bytes of high's
            # internal f32 passes); "auto"/"all" = one conv on 3Ci packed
            # operands.  "auto"/"sum-auto" gate to ci <= 64 (measured-win)
            from cell_image_analysis_tpu.ops.hilo_conv import (
                hilo_conv3x3,
                hilo_conv3x3_sum,
            )

            impl = (hilo_conv3x3_sum if hilo in ("sum", "sum-auto")
                    else hilo_conv3x3)
            return impl(h.astype(jnp.float32), W.astype(jnp.float32),
                        b.astype(jnp.float32), dimension_numbers=dn)
        if (use_wino and W.shape[0] == 3 and W.shape[1] == 3
                and pr == jax.lax.Precision.HIGH
                and h.shape[1] % 2 == 0 and h.shape[2] % 2 == 0):
            # Winograd F(2,3) at "high"-tier product numerics: 1.33x the MXU
            # work of a single-pass direct conv vs 3x for the direct 3-pass.
            mode = _wino_mode(model.winograd, h.shape, W.shape)
            if mode == "pallas":
                from cell_image_analysis_tpu.ops.pallas.winograd import (
                    winograd_conv3x3_pallas,
                )

                return winograd_conv3x3_pallas(
                    h.astype(jnp.float32), W.astype(jnp.float32),
                    b.astype(jnp.float32))
            if mode == "jax":
                from cell_image_analysis_tpu.ops.winograd import winograd_conv3x3

                return winograd_conv3x3(
                    h.astype(jnp.float32), W.astype(jnp.float32),
                    b.astype(jnp.float32), precision=jax.lax.Precision.HIGH)
            # mode "off": direct 3-pass conv below
        y = jax.lax.conv_general_dilated(
            h.astype(cdt), W.astype(cdt), (1, 1), "SAME", dimension_numbers=dn,
            precision=pr,
        )
        return y + b.astype(cdt)

    def pool(h):
        return nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")

    f = model.base_filters
    if model.lvl0_s2d:
        # level 0, space-to-depth: 4x less HBM (no T(8,128) channel padding),
        # 4x the FLOPs — the right trade iff level 0 runs single-pass bf16.
        h = _s2d(x)
        h = nn.relu(conv(h, "Conv_0", _s2d_kernel(p["Conv_0"]["kernel"]),
                         jnp.tile(p["Conv_0"]["bias"], 4), precision=lvl0_prec))
        h = nn.relu(conv(h, "Conv_1", _s2d_kernel(p["Conv_1"]["kernel"]),
                         jnp.tile(p["Conv_1"]["bias"], 4), precision=lvl0_prec))
        b_, hh, ww, _ = h.shape
        h = h.reshape(b_, hh, ww, 2, 2, f).max(axis=(3, 4))  # == maxpool(level-0)
    else:
        # standard layout level 0 (1/4 the FLOPs, 4x-padded f32 HBM writes)
        h = nn.relu(conv(x, "Conv_0", precision=lvl0_prec))
        h = nn.relu(conv(h, "Conv_1", precision=lvl0_prec))
        h = pool(h)

    # encoder levels 1..2 + middle (standard layout)
    h = nn.relu(conv(h, "Conv_2")); h = nn.relu(conv(h, "Conv_3")); skip1 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_4")); h = nn.relu(conv(h, "Conv_5")); skip2 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_6")); h = nn.relu(conv(h, "Conv_7"))

    # decoder level 2 (standard layout; 128 channels already fill the lanes)
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    h = jnp.concatenate([h[:, : skip2.shape[1], : skip2.shape[2]], skip2], axis=-1)
    h = nn.relu(conv(h, "Conv_8")); h = nn.relu(conv(h, "Conv_9"))

    if tail_s2d and skip1.shape[1] % 2 == 0 and skip1.shape[2] % 2 == 0:
        # decoder level 1 + head in s2d layout: the repeat/concat
        # materialization and the half-empty 64-channel lanes at H/2 x W/2
        # were the largest U-Net terms on TPU (scripts/probe_unet.py: dec L1
        # ~14 ms of the ~38 ms device forward per 8x1024^2 batch).  The
        # concat conv splits by input block: conv3x3(up, W[:128]) becomes a
        # phase-assembled 3x3 conv on h directly (`_up_kernel`), and
        # conv3x3(skip, W[128:]) an `_s2d_kernel` conv on s2d(skip1);
        # everything through the 1x1 heads stays at H/4 x W/4 with full
        # 128-lane channels.  Exact up to f32 conv reassociation.
        W10 = p["Conv_10"]["kernel"]
        up = conv(h, "", _up_kernel(W10[:, :, : h.shape[-1], :]),
                  jnp.tile(p["Conv_10"]["bias"], 4))
        sk = conv(_s2d(skip1), "",
                  _s2d_kernel(W10[:, :, h.shape[-1]:, :]),
                  jnp.zeros((), W10.dtype))
        h = nn.relu(up + sk)
        h = nn.relu(conv(h, "Conv_11", _s2d_kernel(p["Conv_11"]["kernel"]),
                         jnp.tile(p["Conv_11"]["bias"], 4)))
        feat = nn.relu(conv(h, "Conv_12", _s2d_kernel(p["Conv_12"]["kernel"]),
                            jnp.tile(p["Conv_12"]["bias"], 4))).astype(jnp.float32)
        prob = nn.sigmoid(_d2s(
            jax.lax.conv_general_dilated(
                feat, _s2d_kernel_1x1(p["Conv_13"]["kernel"]), (1, 1), "SAME",
                dimension_numbers=dn, precision=prec_for("Conv_13", prec))
            + jnp.tile(p["Conv_13"]["bias"], 4)
        ))[..., 0]
        dist = _d2s(nn.softplus(
            jax.lax.conv_general_dilated(
                feat, _s2d_kernel_1x1(p["Conv_14"]["kernel"]), (1, 1), "SAME",
                dimension_numbers=dn, precision=prec_for("Conv_14", prec))
            + jnp.tile(p["Conv_14"]["bias"], 4)
        ))
        return prob, dist

    # odd H/2: decoder level 1 + head in standard layout
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    h = jnp.concatenate([h[:, : skip1.shape[1], : skip1.shape[2]], skip1], axis=-1)
    h = nn.relu(conv(h, "Conv_10")); h = nn.relu(conv(h, "Conv_11"))

    feat = nn.relu(conv(h, "Conv_12")).astype(jnp.float32)
    prob = nn.sigmoid(
        jax.lax.conv_general_dilated(feat, p["Conv_13"]["kernel"], (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     precision=prec_for("Conv_13", prec))
        + p["Conv_13"]["bias"]
    )[..., 0]
    if late_dist:
        return prob, feat
    dist = nn.softplus(
        jax.lax.conv_general_dilated(feat, p["Conv_14"]["kernel"], (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     precision=prec_for("Conv_14", prec))
        + p["Conv_14"]["bias"]
    )
    return prob, dist


def dist_head_rows(variables: dict, feat_rows: jax.Array) -> jax.Array:
    """The 32-ray dist head on gathered feature rows: (K, head_filters) ->
    (K, n_rays).  Identical contraction to the full-map 1x1 conv (same f32
    dot over head_filters), applied only where the dist map is actually
    read — the top-K candidate pixels."""
    p = variables["params"]["Conv_14"]
    return jax.nn.softplus(
        jnp.matmul(feat_rows.astype(jnp.float32), p["kernel"][0, 0],
                   precision=prec_util.highest("dist_head"))  # K<=256 rows: free
        + p["bias"]
    )


def unet_apply_late(model: StarDistUNet, variables: dict, x: jax.Array):
    """`(prob, feat)` via the s2d fast path when its preconditions hold,
    else None (callers fall back to the full `(prob, dist)` forward)."""
    if (model.grid == (2, 2) and model.depth == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[3] == 1):
        return apply_unet_s2d(model, variables, x, train=False, late_dist=True)
    return None


def unet_apply(model: StarDistUNet, variables: dict, x: jax.Array,
               train: bool = False):
    """Dispatch: the s2d fast path when its preconditions hold, else the
    flax module."""
    if (not train and model.grid == (2, 2) and model.depth == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[3] == 1):
        return apply_unet_s2d(model, variables, x, train=train)
    return model.apply(variables, x, train=train)


def init_unet(key: jax.Array, size: int = 256, **kw) -> tuple[StarDistUNet, dict]:
    model = StarDistUNet(**kw)
    variables = model.init(key, jnp.zeros((1, size, size, 1), jnp.float32), train=False)
    return model, variables


@partial(jax.jit, static_argnames=("model",))
def unet_forward(model: StarDistUNet, variables: dict, x: jax.Array):
    return unet_apply(model, variables, x, train=False)
