#!/usr/bin/env python
"""On-chip accuracy of XLA:TPU's f32 FFT vs a DFT-operator-matmul
formulation at HIGHEST, both against numpy f64 (r3: the parity FFT flip).

TPU has no native FFT hardware; XLA's lowering is fast but low-precision.
A 64x64 FFT is exactly two DFT matrix products, which the MXU can run at
HIGHEST (3-pass f32) — the framework's standard precision-controlled path.
"""
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

n = 64
rng = np.random.default_rng(0)
x = rng.uniform(0, 1, (32, n, n)).astype(np.float32)

ref = np.abs(np.fft.fft2(x.astype(np.float64))) ** 2

k = np.arange(n)
ang = 2 * np.pi * np.outer(k, k) / n
C = np.cos(ang)
S = np.sin(ang)
Cj, Sj = jnp.asarray(C, jnp.float32), jnp.asarray(S, jnp.float32)
HI = jax.lax.Precision.HIGHEST


@jax.jit
def xla_fft_power(x):
    return jnp.abs(jnp.fft.fft2(x)) ** 2


@jax.jit
def dft_power(x):
    t = jnp.einsum("bhw,kw->bhk", x, Cj, precision=HI)
    u = jnp.einsum("bhw,kw->bhk", x, Sj, precision=HI)
    re = (jnp.einsum("kh,bhw->bkw", Cj, t, precision=HI)
          - jnp.einsum("kh,bhw->bkw", Sj, u, precision=HI))
    im = -(jnp.einsum("kh,bhw->bkw", Cj, u, precision=HI)
           + jnp.einsum("kh,bhw->bkw", Sj, t, precision=HI))
    return re * re + im * im


for name, f in (("xla_fft", xla_fft_power), ("dft_matmul", dft_power)):
    p = np.asarray(f(jnp.asarray(x)), np.float64)
    rel = np.abs(p - ref).max() / ref.max()
    print(f"{name}: max rel power err vs numpy f64 = {rel:.3e}", flush=True)
