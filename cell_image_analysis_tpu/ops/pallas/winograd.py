"""Fused Pallas Winograd F(2x2, 3x3) convolution (TPU).

Why: the screening parity contract needs >= 3-pass bf16 ("high") conv
numerics on TPU (BENCH.md r2s9/r2s10: the DEFAULT f32 conv is ONE bf16
pass, 1.8e-2 prob deviation; no single U-Net layer tolerates it — LOO
sweep r2s11), which makes the fused U-Net MXU-bound at 3x FLOPs.
Winograd F(2x2, 3x3) needs 16 multiplies per 2x2 output tile instead of
36, so 3-pass Winograd costs 3/2.25 = 1.33x a single-pass direct conv.
The pure-JAX formulation (ops/winograd.py) materializes the Winograd-
domain tensor in HBM (4x the input volume — GBs for the U-Net's big
feature maps); this kernel keeps it in VMEM.

Layout trick: the wrapper feeds the kernel `z = s2d(pad(x, 1))` with a
SHIFTED pairing — z cell (i, j) holds input pixels (2i-1..2i, 2j-1..2j)
as 4 channel blocks [(r0,c0), (r0,c1), (r1,c0), (r1,c1)] * Ci.  A
Winograd tile (input rows 2i-1..2i+2) is then exactly the 2x2 adjacent
z-cells (i..i+1, j..j+1): all in-kernel accesses are +-1-cell slices
(sublane shifts), never stride-2.  Each program manually DMAs one
(TH+1, TW+1, 4Ci) z-block (1-cell halo; z is pre-padded so the read is
always in bounds), transforms with exact-coefficient adds, runs the 16
(TH*TW, Ci) @ (Ci, Co) products as explicit hi/lo bf16 passes
accumulated in f32 (== XLA "high" numerics), inverse-transforms, and
writes an s2d-layout (TH, TW, 4Co) output block.  The wrapper d2s's
back to NHWC.

Accuracy vs the true-f32 direct conv: transform coefficients are
0/+-1/+-1/2 (exact); products are 3-pass bf16 — same tier as a direct
"high" conv (~1e-4 relative; validated against ops/winograd.py and the
XLA direct conv in tests/test_winograd.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cell_image_analysis_tpu.ops.winograd import winograd_kernel_transform


def _split_hi_lo(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f32 -> (hi, lo) bf16 pair with hi + lo == a to ~16 mantissa bits."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(z_any, u_hi, u_lo, bias, out_ref, zblk, acc, sem, *, th, tw, twd,
            ci, co):
    b = pl.program_id(0)
    bi = pl.program_id(1)
    bj = pl.program_id(2)
    nb = pl.num_programs(0)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)

    # halo DMA, double-buffered: (TH+1, TWD, 4Ci) block of z starting at
    # (bi*TH, bj*TW).  TWD = TW+1 rounded up to a sublane multiple (Mosaic:
    # slice shapes in the second-minor dim must be 8-aligned); z is padded
    # so the over-read is always in bounds, and only the first TW+1 columns
    # are consumed.  TPU grids run sequentially and scratch persists across
    # steps, so each step prefetches step s+1's block into the other buffer
    # while computing on its own — without this the per-program DMA stall
    # was the kernel's dominant cost (the MXU work is ~2 ms/layer while the
    # serial-DMA kernel measured ~13 ms over the fetch floor).
    s = (b * ni + bi) * nj + bj
    slot = jax.lax.rem(s, 2)

    def dma_for(step, buf):
        jj = jax.lax.rem(step, nj)
        t = jax.lax.div(step, nj)
        ii = jax.lax.rem(t, ni)
        bb = jax.lax.div(t, ni)
        return pltpu.make_async_copy(
            z_any.at[bb, pl.ds(ii * th, th + 1), pl.ds(jj * tw, twd), :],
            zblk.at[buf],
            sem.at[buf],
        )

    @pl.when(s == 0)
    def _():
        dma_for(s, slot).start()

    @pl.when(s + 1 < nb * ni * nj)
    def _():
        dma_for(s + 1, 1 - slot).start()

    dma_for(s, slot).wait()

    zb = zblk[slot][:, : tw + 1]                   # (TH+1, TW+1, 4Ci) f32
    # subpixel planes: channel blocks [(r0,c0), (r0,c1), (r1,c0), (r1,c1)]
    p00 = zb[:, :, 0 * ci: 1 * ci]
    p01 = zb[:, :, 1 * ci: 2 * ci]
    p10 = zb[:, :, 2 * ci: 3 * ci]
    p11 = zb[:, :, 3 * ci: 4 * ci]

    # row transform t_a (B^T rows: [1,0,-1,0], [0,1,1,0], [0,-1,1,0],
    # [0,1,0,-1]); row phases u=0..3 map to p0*[i], p1*[i], p0*[i+1],
    # p1*[i+1]
    def row_t(pa, pb):                             # (TH+1, TW+1, Ci) pair
        a0, a1 = pa[:th], pb[:th]                  # u = 0, 1
        a2, a3 = pa[1:], pb[1:]                    # u = 2, 3
        return (a0 - a2, a1 + a2, a2 - a1, a1 - a3)

    t0 = row_t(p00, p10)                           # subcol 0 planes
    t1 = row_t(p01, p11)                           # subcol 1 planes

    # column transform -> V[a*4+b], (TH, TW, Ci); col phases v=0..3 map to
    # t^0[j], t^1[j], t^0[j+1], t^1[j+1]
    n = th * tw
    for a in range(4):
        c0, c1 = t0[a], t1[a]
        b0, b1 = c0[:, :tw], c1[:, :tw]            # v = 0, 1
        b2, b3 = c0[:, 1:], c1[:, 1:]              # v = 2, 3
        V = (b0 - b2, b1 + b2, b2 - b1, b1 - b3)
        for bb in range(4):
            k = a * 4 + bb
            v = V[bb].reshape(n, ci)
            v_hi, v_lo = _split_hi_lo(v)
            # 3-pass bf16 == XLA "high": hi@hi + hi@lo + lo@hi, f32 acc
            m = jax.lax.dot_general(
                v_hi, u_hi[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m += jax.lax.dot_general(
                v_hi, u_lo[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m += jax.lax.dot_general(
                v_lo, u_hi[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc[k] = m

    # inverse transform Y = A^T M A (A^T = [[1,1,1,0],[0,1,-1,-1]])
    m = [acc[k] for k in range(16)]
    g0 = [m[v] + m[4 + v] + m[8 + v] for v in range(4)]       # A^T row 0
    g1 = [m[4 + v] - m[8 + v] - m[12 + v] for v in range(4)]  # A^T row 1
    bv = bias[:].astype(jnp.float32)
    y00 = g0[0] + g0[1] + g0[2] + bv
    y01 = g0[1] - g0[2] - g0[3] + bv
    y10 = g1[0] + g1[1] + g1[2] + bv
    y11 = g1[1] - g1[2] - g1[3] + bv
    out_ref[0] = jnp.concatenate(
        [y.reshape(th, tw, co) for y in (y00, y01, y10, y11)], axis=-1)


@functools.partial(jax.jit, static_argnames=("th", "tw", "twd", "interpret"))
def _winograd_call(z, u_hi, u_lo, bias, th, tw, twd, interpret):
    B, hz, wz, ci4 = z.shape
    ci = ci4 // 4
    co = u_hi.shape[-1]
    ho = hz - 1                                    # tiles (z has +1 halo)
    wo = wz - (twd - tw)                           # minus DMA-alignment pad
    grid = (B, ho // th, wo // tw)

    kern = functools.partial(_kernel, th=th, tw=tw, twd=twd, ci=ci, co=co)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, ho, wo, 4 * co), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                    # z (HBM)
            pl.BlockSpec((16, ci, co), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),                # U_hi
            pl.BlockSpec((16, ci, co), lambda b, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),                # U_lo
            pl.BlockSpec((co,), lambda b, i, j: (0,),
                         memory_space=pltpu.VMEM),                # bias
        ],
        out_specs=pl.BlockSpec((1, th, tw, 4 * co),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + 1, twd, ci4), jnp.float32),       # z dbl-buf
            pltpu.VMEM((16, th * tw, co), jnp.float32),           # M acc
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(z, u_hi, u_lo, bias)
    return out


def winograd_conv3x3_pallas(x: jax.Array, W: jax.Array,
                            bias: jax.Array | None = None,
                            th: int | None = None, tw: int | None = None,
                            interpret: bool = False) -> jax.Array:
    """SAME 3x3 stride-1 correlation at "high" (3-pass bf16) numerics.

    x: (B, H, W, Ci), H and W even.  W: (3, 3, Ci, Co) HWIO.  th/tw:
    output tile block (in 2x2-tile units; the H/2 x W/2 tile grid is
    zero-padded up to a multiple — SAME zero padding makes the extra
    tiles exact zeros that are sliced away).
    """
    B, H, Wd, ci = x.shape
    assert H % 2 == 0 and Wd % 2 == 0, "winograd pallas: even H, W"
    co = W.shape[-1]
    ho, wo = H // 2, Wd // 2
    if th is None or tw is None:
        # VMEM budget: the M accumulator is (16, th*tw, Co) f32 and the
        # transform temps scale with (th+1)(tw+1)*Ci — shrink the tile for
        # wide layers (U-Net middle: 256x256 channels).
        t = 16 if ci * co <= 128 * 128 else 8
        th = t if th is None else th
        tw = t if tw is None else tw
    pho = (-ho) % th
    pwo = (-wo) % tw
    # DMA block width: tw+1 rounded to the sublane multiple (Mosaic slice
    # alignment); z gets (twd - tw - 1) extra zero cells on the right so the
    # last tile's over-read stays in bounds.
    twd = -((tw + 1) // -8) * 8
    # shifted-pair s2d: pad 1 left/top (halo) and 1+2*p right/bottom so
    # the paired reshape covers (ho+pho+1) cells
    xp = jnp.pad(x, ((0, 0), (1, 1 + 2 * pho),
                     (1, 1 + 2 * (pwo + twd - tw - 1)), (0, 0)))
    hz, wz = ho + pho + 1, wo + pwo + (twd - tw)
    z = xp.reshape(B, hz, 2, wz, 2, ci).transpose(0, 1, 3, 2, 4, 5)
    z = z.reshape(B, hz, wz, 4 * ci)

    U = winograd_kernel_transform(W).reshape(16, ci, co)
    u_hi, u_lo = _split_hi_lo(U)
    b = (jnp.zeros((co,), jnp.float32) if bias is None
         else jnp.broadcast_to(bias.astype(jnp.float32), (co,)))

    out = _winograd_call(z, u_hi, u_lo, b, th, tw, twd, interpret)
    # s2d output (B, ho', wo', 4Co) -> NHWC, slice off tile padding
    hp, wp = out.shape[1], out.shape[2]
    y = out.reshape(B, hp, wp, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, 2 * hp, 2 * wp, co)
    return y[:, :H, :Wd]
