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

The radial/angular bin maps and the DC/high-frequency masks depend only on
the STATIC cell shape, so they are precomputed host-side in float64 numpy
at trace time and embedded as constants — bit-identical to the float64
oracle (utils/parity.fft_features_np) by construction.  Computing them
with traced f32 transcendentals was the r4 on-chip parity residue:
XLA:TPU's f32 arctan2/sqrt round knife-edge pixels (exact diagonals,
perfect-square radii — e.g. theta = pi/4 lands exactly on the pi/8-sector
boundary) into DIFFERENT bins than numpy f64, shifting whole pixels of
spectral mass between features (measured up to 3.3e-2 in FFT-SVM decision
values while cell pixels matched at 1.2e-7; BENCH.md r4s2).  CPU-mesh
tests could not catch this: CPU f32 libm rounds the knife edges the same
way as f64, TPU's polynomial approximations do not.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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

    # static f64 host-side geometry (see module docstring: bit-identical to
    # the float64 oracle's binning; traced f32 transcendentals are NOT —
    # knife-edge pixels bin differently under XLA:TPU's approximations)
    cy, cx = h // 2, w // 2
    yy64 = (np.arange(h) - cy).astype(np.float64)[:, None]
    xx64 = (np.arange(w) - cx).astype(np.float64)[None, :]
    r64 = np.sqrt(yy64 * yy64 + xx64 * xx64)
    r_norm64 = r64 / (min(h, w) / 2.0)      # 1.0 at the Nyquist ring
    theta64 = np.arctan2(yy64, xx64) % np.pi  # [0, pi): point symmetry

    dc = jnp.asarray(r64 == 0.0)
    ac_power = jnp.where(dc[None], 0.0, power)
    total = jnp.sum(ac_power, axis=(-2, -1))
    total_safe = jnp.maximum(total, 1e-20)

    # radial annuli over r_norm in [0, 1]; energy beyond the Nyquist ring
    # (the spectrum corners) folds into the last bin
    r_bin = np.clip((r_norm64 * radial_bins).astype(np.int64), 0, radial_bins - 1)
    r_onehot = jnp.asarray(np.eye(radial_bins, dtype=np.float32)[r_bin])  # (H, W, R)
    radial = jnp.einsum("bhw,hwr->br", ac_power, r_onehot,
                        precision=prec.highest("fft")) / total_safe[:, None]

    a_bin = np.clip((theta64 / np.pi * angular_bins).astype(np.int64), 0, angular_bins - 1)
    a_onehot = jnp.asarray(np.eye(angular_bins, dtype=np.float32)[a_bin])
    angular = jnp.einsum("bhw,hwa->ba", ac_power, a_onehot,
                         precision=prec.highest("fft")) / total_safe[:, None]

    r_norm = jnp.asarray(r_norm64.astype(np.float32))
    high_mask = jnp.asarray(r_norm64 > 0.5)
    centroid = jnp.sum(ac_power * r_norm[None], axis=(-2, -1)) / total_safe
    high_freq = jnp.sum(jnp.where(high_mask[None], ac_power, 0.0), axis=(-2, -1)) / total_safe
    tp = jnp.log10(total_safe) if log_power else total

    return jnp.concatenate(
        [radial, angular, centroid[:, None], high_freq[:, None], tp[:, None]], axis=1
    )
