"""Per-cell 2D-FFT spectral features.

The reference README advertises "cell extraction, FFT analysis, and
autoencoder-based anomaly detection" (README.md:3, :82 JA) but ships no FFT
code; BASELINE.json lists "per-cell 2D-FFT spectral features" as a target
config, so this framework implements them as a first-class scoring feature
(SURVEY.md claimed-but-absent surface).

Feature vector per 64x64 cell (dim = radial_bins + angular_bins + 3):
- radial power spectrum: energy in `radial_bins` equal-width annuli of the
  centered power spectrum, normalized to sum 1 (DC excluded);
- angular power spectrum: energy in `angular_bins` orientation sectors over
  [0, pi) (the spectrum is point-symmetric), normalized to sum 1;
- spectral centroid (power-weighted mean normalized radius),
- high-frequency fraction (energy above half the Nyquist radius),
- log10 total AC power.

Everything is jnp.fft + masked segment sums — XLA:TPU lowers the FFT
natively — and the whole op jits/vmaps into the screening graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.utils import prec


@partial(jax.jit, static_argnames=("radial_bins", "angular_bins", "log_power"))
def fft_features(
    cells: jax.Array,
    radial_bins: int = 16,
    angular_bins: int = 8,
    log_power: bool = True,
) -> jax.Array:
    """(B, H, W) or (B, H, W, 1) -> (B, radial_bins + angular_bins + 3)."""
    if cells.ndim == 4:
        cells = cells[..., 0]
    b, h, w = cells.shape
    x = cells.astype(jnp.float32)

    F = jnp.fft.fftshift(jnp.fft.fft2(x), axes=(-2, -1))
    power = jnp.abs(F) ** 2  # (B, H, W)

    cy, cx = h // 2, w // 2
    yy = (jnp.arange(h) - cy).astype(jnp.float32)[:, None]
    xx = (jnp.arange(w) - cx).astype(jnp.float32)[None, :]
    r = jnp.sqrt(yy * yy + xx * xx)
    r_norm = r / (min(h, w) / 2.0)          # 1.0 at the Nyquist ring
    theta = jnp.arctan2(yy, xx) % jnp.pi    # [0, pi): point symmetry

    dc = (r == 0.0)
    ac_power = jnp.where(dc[None], 0.0, power)
    total = jnp.sum(ac_power, axis=(-2, -1))
    total_safe = jnp.maximum(total, 1e-20)

    # radial annuli over r_norm in [0, 1]; energy beyond the Nyquist ring
    # (the spectrum corners) folds into the last bin
    r_bin = jnp.clip((r_norm * radial_bins).astype(jnp.int32), 0, radial_bins - 1)
    r_onehot = jax.nn.one_hot(r_bin, radial_bins, dtype=jnp.float32)  # (H, W, R)
    radial = jnp.einsum("bhw,hwr->br", ac_power, r_onehot,
                        precision=prec.highest("fft")) / total_safe[:, None]

    a_bin = jnp.clip((theta / jnp.pi * angular_bins).astype(jnp.int32), 0, angular_bins - 1)
    a_onehot = jax.nn.one_hot(a_bin, angular_bins, dtype=jnp.float32)
    angular = jnp.einsum("bhw,hwa->ba", ac_power, a_onehot,
                         precision=prec.highest("fft")) / total_safe[:, None]

    centroid = jnp.sum(ac_power * r_norm[None], axis=(-2, -1)) / total_safe
    high_freq = jnp.sum(jnp.where(r_norm[None] > 0.5, ac_power, 0.0), axis=(-2, -1)) / total_safe
    tp = jnp.log10(total_safe) if log_power else total

    return jnp.concatenate(
        [radial, angular, centroid[:, None], high_freq[:, None], tp[:, None]], axis=1
    )
