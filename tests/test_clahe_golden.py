"""Independent literal-loop CLAHE spec vs the vectorized oracle.

ops/oracle/clahe_np.py is the executable specification the device kernels
are tested against; skimage itself is not installed, so this file guards the
oracle with a SECOND, independently written transcription of the published
Zuiderveld/skimage algorithm — scalar per-pixel/per-tile loops, no shared
helpers — so a vectorization or indexing bug in the oracle cannot hide.
Residual clip-redistribution follows the same first-pass rule; the bounded
divergences vs real skimage are documented in the oracle's docstring.
"""

import numpy as np
import pytest

from cell_image_analysis_tpu.ops.oracle.clahe_np import equalize_adapthist_np

NR = 2 ** 14


def _clip_hist_literal(hist, clim):
    hist = [int(v) for v in hist]
    n = len(hist)
    n_excess = sum(v - clim for v in hist if v > clim)
    hist = [min(v, clim) for v in hist]

    bin_incr = n_excess // n
    upper = clim - bin_incr
    for i in range(n):
        if hist[i] < upper:
            hist[i] += bin_incr
            n_excess -= bin_incr
    for i in range(n):
        if upper <= hist[i] < clim:
            n_excess -= clim - hist[i]
            hist[i] = clim
    while n_excess > 0:
        step = max(1, n // max(n_excess, 1))
        progressed = False
        idx = 0
        while idx < n and n_excess > 0:
            if hist[idx] < clim:
                hist[idx] += 1
                n_excess -= 1
                progressed = True
            idx += step
        if not progressed:
            break
    return hist


def _clahe_literal(image, clip_limit=0.02, nbins=256, grid=8):
    """Scalar transcription of the published algorithm (see module
    docstring).  O(H*W) python loops — test-sized inputs only."""
    image = np.asarray(image, np.float64)
    h, w = image.shape
    lo, hi = image.min(), image.max()
    if hi <= lo:
        return np.zeros_like(image)
    img14 = np.round((image - lo) / (hi - lo) * (NR - 1)).astype(np.int64)

    kh, kw = max(1, h // grid), max(1, w // grid)
    pad_top, pad_left = kh // 2, kw // 2
    pad_bot = (kh - h % kh) % kh + int(np.ceil(kh / 2.0))
    pad_right = (kw - w % kw) % kw + int(np.ceil(kw / 2.0))
    padded = np.pad(img14, ((pad_top, pad_bot), (pad_left, pad_right)),
                    mode="reflect")
    bin_size = 1 + NR // nbins
    binned = padded // bin_size

    ns_h = padded.shape[0] // kh - 1
    ns_w = padded.shape[1] // kw - 1
    # f32 product per the oracle's documented divergence 4 (device mirror)
    clim = max(1, int(np.float32(clip_limit) * np.float32(kh * kw)))

    maps = {}
    for ty in range(ns_h):
        for tx in range(ns_w):
            hist = [0] * nbins
            for r in range(kh):
                for c in range(kw):
                    hist[binned[pad_top + ty * kh + r, pad_left + tx * kw + c]] += 1
            hist = _clip_hist_literal(hist, clim)
            m, acc = [], 0
            for v in hist:
                acc += v
                m.append(min((acc * (NR - 1)) // (kh * kw), NR - 1))
            maps[(ty, tx)] = m

    out = np.zeros((h, w), np.float64)
    for y in range(h):
        for x in range(w):
            yp, xp = y + pad_top, x + pad_left
            ty, tx = yp // kh, xp // kw
            ay, ax = yp % kh, xp % kw
            b = binned[yp, xp]
            # exact integer bilinear blend: floor(S / (kh*kw)) per the
            # oracle's documented divergence 3
            acc = 0
            for ey in (0, 1):
                my = min(max(ty - 1 + ey, 0), ns_h - 1)
                ny = ay if ey else kh - ay
                for ex in (0, 1):
                    mx = min(max(tx - 1 + ex, 0), ns_w - 1)
                    nx = ax if ex else kw - ax
                    acc += int(ny) * int(nx) * maps[(my, mx)][b]
            out[y, x] = acc // (kh * kw)
    lo2, hi2 = out.min(), out.max()
    if hi2 <= lo2:
        return np.zeros_like(out)
    return (out - lo2) / (hi2 - lo2)


@pytest.mark.parametrize("shape", [(24, 24), (31, 45), (64, 64)])
def test_oracle_matches_literal_spec(rng, shape):
    img = rng.random(shape)
    got = equalize_adapthist_np(img)
    want = _clahe_literal(img)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_oracle_matches_literal_spec_structured(rng):
    # a blob-like crop (the real workload shape): smooth + ring + noise
    yy, xx = np.mgrid[0:48, 0:40]
    img = np.exp(-(((yy - 24) / 12.0) ** 2 + ((xx - 20) / 10.0) ** 2))
    img = img + 0.1 * rng.random((48, 40))
    got = equalize_adapthist_np(img)
    want = _clahe_literal(img)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_oracle_flat_image_is_zero():
    assert np.all(equalize_adapthist_np(np.full((32, 32), 3.7)) == 0.0)
