"""Winograd F(2x2, 3x3) convolution for MXU-bound high-precision convs.

The TPU lowers a DEFAULT-precision f32 conv to ONE bf16 MXU pass — too
inaccurate for the screening parity contract (BENCH.md r2s9: 1.8e-2 prob
deviation) — while "high" (3-pass bf16) restores ~f32 numerics at 3x the
MXU FLOPs, which made the fused U-Net MXU-bound (r2s10).  Winograd
F(2x2, 3x3) computes a 3x3 correlation with 16 multiplies per 2x2 output
tile instead of 36 (2.25x fewer), so a Winograd conv whose element-wise
products run as 3-pass ("high") matmuls costs only 3/2.25 = 1.33x the MXU
work of a single-pass direct conv.

Transforms (Lavin & Gray, "Fast Algorithms for Convolutional Neural
Networks", 2015; F(2,3) minimal filtering form):

    Y = A^T [ (G g G^T) .* (B^T d B) ] A           per channel pair
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]   (exact adds)
    G   = [[1,0,0],[1/2,1/2,1/2],[1/2,-1/2,1/2],[0,0,1]] (exact halves)
    A^T = [[1,1,1,0],[0,1,-1,-1]]                        (exact adds)

All transform coefficients are 0, +-1, +-1/2 — exact in f32 — so the only
rounding beyond direct-conv reassociation is in the element-wise products,
which run as 16 (tiles, Ci) @ (Ci, Co) matmuls at the requested XLA
precision.  Measured deviation vs the direct f32 conv is ~1e-6 relative
(reassociation only) when products use HIGHEST, ~1e-4 with "high" — the
same tier as a direct "high" conv.

This module provides the pure-JAX formulation (XLA materializes the
(B, ho, wo, 16, Ci) Winograd-domain tensor in HBM — 4x the input volume,
acceptable for mid-size feature maps; a Pallas-fused variant can keep it
in VMEM if the HBM cost ever dominates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# B^T (4x4), G (4x3), A^T (2x4) — exact f32 entries
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd_kernel_transform(W: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (4, 4, Ci, Co) Winograd-domain filter U = G W G^T.

    Exact in f32 for the halving coefficients (multiplication by 0.5 is
    exact); the adds reassociate only.  Computed once per weight set —
    callers should constant-fold it outside the jit or let XLA do so."""
    G = jnp.asarray(_G)
    # U[a, b, ci, co] = sum_{u,v} G[a, u] W[u, v, ci, co] G[b, v]
    return jnp.einsum("au,uvio,bv->abio", G, W, G,
                      precision=jax.lax.Precision.HIGHEST)


def winograd_conv3x3(x: jax.Array, W: jax.Array, bias: jax.Array | None = None,
                     precision=None, U: jax.Array | None = None) -> jax.Array:
    """SAME 3x3 stride-1 correlation via Winograd F(2x2, 3x3).

    x: (B, H, W, Ci) with H, W even.  W: (3, 3, Ci, Co) (HWIO, correlation —
    matches jax.lax.conv_general_dilated with NHWC/HWIO).  `precision`
    applies to the 16 element-wise-product matmuls (the FLOP carrier);
    transforms are exact-coefficient adds in f32.
    """
    b, h, w, ci = x.shape
    assert h % 2 == 0 and w % 2 == 0, "Winograd F(2,3): even H, W"
    co = W.shape[-1]
    if U is None:
        U = winograd_kernel_transform(W)          # (4, 4, Ci, Co)

    # SAME padding for 3x3 = 1 px halo; tiles of 4x4 input with stride 2.
    # All transforms are hand-written adds/subs (VPU elementwise, 0/+-1
    # coefficients) — an einsum against B^T/A^T would lower to 4x4 matmuls
    # the MXU hates.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ho, wo = h // 2, w // 2
    # row slices r_u[n, i, :, c] = xp[n, 2i+u, :, c]
    r = [xp[:, u: u + 2 * ho: 2] for u in range(4)]          # 4 x (B,ho,W+2,C)
    # row transform: t_a = sum_u B^T[a, u] r_u
    t = [r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3]]
    # column slices + column transform -> V[a][b] of shape (B, ho, wo, C)
    V = []
    for ta in t:
        s = [ta[:, :, v: v + 2 * wo: 2] for v in range(4)]
        V.extend([s[0] - s[2], s[1] + s[2], s[2] - s[1], s[1] - s[3]])
    Vf = jnp.stack([v.reshape(b * ho * wo, ci) for v in V])   # (16, N, Ci)
    # element-wise products as 16 (N, Ci) @ (Ci, Co) matmuls
    Uf = U.reshape(16, ci, co)                                # (16, Ci, Co)
    M = jnp.matmul(Vf, Uf, precision=precision)               # (16, N, Co)
    m = [M[k].reshape(b, ho, wo, co) for k in range(16)]
    # inverse transform Y = A^T M A (adds only)
    g = [m[0] + m[4] + m[8],  m[1] + m[5] + m[9],             # rows A^T row 0
         m[2] + m[6] + m[10], m[3] + m[7] + m[11],
         m[4] - m[8] - m[12], m[5] - m[9] - m[13],            # rows A^T row 1
         m[6] - m[10] - m[14], m[7] - m[11] - m[15]]
    y00 = g[0] + g[1] + g[2]
    y01 = g[1] - g[2] - g[3]
    y10 = g[4] + g[5] + g[6]
    y11 = g[5] - g[6] - g[7]
    # (B, ho, wo, 2, 2, Co) -> (B, H, W, Co)
    Y = jnp.stack([jnp.stack([y00, y01], axis=3),
                   jnp.stack([y10, y11], axis=3)], axis=3)    # (B,ho,wo,2,2,Co)
    y = Y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, co)
    if bias is not None:
        y = y + bias
    return y
