"""Localize the residual one-quantum CLAHE divergence (VERDICT r3 item 1).

Compares kernel vs oracle intermediates stage by stage for the failing
150x97 case from tests/test_clahe.py: quantized img14, binned, per-tile
histograms, clipped histograms, maps, and the integer interp output.
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from cell_image_analysis_tpu.ops import clahe as K
from cell_image_analysis_tpu.ops.oracle import clahe_np as O

rng = np.random.default_rng(1234)
# conftest uses rng fixture; replicate the test's generator order: the test
# builds all sizes from one rng; easier to just scan seeds for a failing img.
h, w = 150, 97
grid = 8
nbins = 256

def oracle_stages(image):
    image = np.asarray(image, dtype=np.float64)
    lo, hi = image.min(), image.max()
    k = (image - lo).astype(np.int64)
    D = int(hi - lo)
    t = 2 * k * (O.NR_OF_GRAY - 1) + D
    q = t // (2 * D)
    tie = (t % (2 * D)) == 0
    img14 = q - (tie & (q % 2 == 1))
    kh, kw = max(1, h // grid), max(1, w // grid)
    pad_top, pad_left = kh // 2, kw // 2
    pad_bot = (kh - h % kh) % kh + int(np.ceil(kh / 2.0))
    pad_right = (kw - w % kw) % kw + int(np.ceil(kw / 2.0))
    padded = np.pad(img14, ((pad_top, pad_bot), (pad_left, pad_right)), mode="reflect")
    bin_size = 1 + O.NR_OF_GRAY // nbins
    binned = padded // bin_size
    ns_h = padded.shape[0] // kh - 1
    ns_w = padded.shape[1] // kw - 1
    clim = max(1, int(0.02 * kh * kw))
    hists = np.zeros((ns_h, ns_w, nbins), np.int64)
    chists = np.zeros((ns_h, ns_w, nbins), np.int64)
    maps = np.zeros((ns_h, ns_w, nbins), np.int64)
    for ty in range(ns_h):
        for tx in range(ns_w):
            tile = binned[pad_top + ty*kh : pad_top + (ty+1)*kh,
                          pad_left + tx*kw : pad_left + (tx+1)*kw]
            hist = np.bincount(tile.ravel(), minlength=nbins)[:nbins]
            hists[ty, tx] = hist
            ch = O.clip_histogram(hist, clim)
            chists[ty, tx] = ch
            m = (np.cumsum(ch) * (O.NR_OF_GRAY - 1)) // (kh * kw)
            maps[ty, tx] = np.minimum(m, O.NR_OF_GRAY - 1)
    # interp
    ys, xs = np.mgrid[0:h, 0:w]
    yp, xp = ys + pad_top, xs + pad_left
    ty_, tx_ = yp // kh, xp // kw
    cy = (yp % kh) / kh
    cx = (xp % kw) / kw
    b = binned[pad_top:pad_top+h, pad_left:pad_left+w]
    out = np.zeros((h, w), np.float64)
    for ey in (0, 1):
        my = np.clip(ty_ - 1 + ey, 0, ns_h - 1)
        wy = cy if ey else 1.0 - cy
        for ex in (0, 1):
            mx = np.clip(tx_ - 1 + ex, 0, ns_w - 1)
            wx = cx if ex else 1.0 - cx
            out += wy * wx * maps[my, mx, b]
    out = np.floor(out)
    return dict(img14=img14, binned_core=b, hists=hists, chists=chists,
                maps=maps, out=out, clim=clim, kh=kh, kw=kw, ns_h=ns_h, ns_w=ns_w)


def kernel_stages(image, cap=192, impl="scatter"):
    crop = np.zeros((cap, cap), np.float32)
    crop[:h, :w] = image
    crop[h:, :] = 1e9
    crop_j = jnp.asarray(crop)
    hj = jnp.int32(h); wj = jnp.int32(w)
    ys = jnp.arange(cap)
    valid = (ys[:, None] < hj) & (ys[None, :] < wj)
    img14, lo, hi = K._quantize14(crop_j, valid)
    bin_size = 1 + K.NR_OF_GRAY // nbins
    binned = jnp.clip(img14 // bin_size, 0, nbins - 1)
    kh = max(1, h // grid); kw = max(1, w // grid)
    ns_h = -(-h // kh); ns_w = -(-w // kw)
    vcap = cap + max(1, cap // grid)
    yv = jnp.arange(vcap)
    src = np.asarray(binned)[np.asarray(K._reflect(yv, hj))[:, None],
                             np.asarray(K._reflect(yv, wj))[None, :]]
    ty = np.arange(vcap)[:, None] // kh
    tx = np.arange(vcap)[None, :] // kw
    vvalid = (np.arange(vcap)[:, None] < ns_h*kh) & (np.arange(vcap)[None, :] < ns_w*kw)
    hists = np.zeros((K.NS_CAP*K.NS_CAP, nbins), np.int64)
    np.add.at(hists, (ty*K.NS_CAP + tx)[vvalid], np.eye(nbins, dtype=np.int64)[src[vvalid]])
    clim = int(np.int32(np.float32(0.02) * np.float32(kh * kw)))
    clim = max(1, clim)
    chists = np.stack([np.asarray(K._clip_histogram(jnp.asarray(hh, jnp.int32), jnp.int32(clim), nbins)) for hh in hists])
    cdf = np.cumsum(chists, axis=-1)
    maps = np.minimum(cdf * (K.NR_OF_GRAY - 1) // (kh * kw), K.NR_OF_GRAY - 1)
    # interp (scatter twin)
    ysn = np.arange(cap)
    yp = ysn[:, None] + kh // 2
    xp = ysn[None, :] + kw // 2
    pty = yp // kh; ptx = xp // kw
    cy = (yp % kh).astype(np.float32) / np.float32(kh)
    cx = (xp % kw).astype(np.float32) / np.float32(kw)
    out = np.zeros((cap, cap), np.float32)
    bn = np.asarray(binned)
    for ey in (0, 1):
        my = np.clip(pty - 1 + ey, 0, ns_h - 1)
        wy = cy if ey else 1.0 - cy
        for ex in (0, 1):
            mx = np.clip(ptx - 1 + ex, 0, ns_w - 1)
            wx = cx if ex else 1.0 - cx
            out += (wy * wx) * maps[(my*K.NS_CAP + mx), bn].astype(np.float32)
    out = np.floor(out)
    hists_g = hists.reshape(K.NS_CAP, K.NS_CAP, nbins)[:ns_h, :ns_w]
    chists_g = chists.reshape(K.NS_CAP, K.NS_CAP, nbins)[:ns_h, :ns_w]
    maps_g = maps.reshape(K.NS_CAP, K.NS_CAP, nbins)[:ns_h, :ns_w]
    return dict(img14=np.asarray(img14)[:h, :w], binned_core=bn[:h, :w],
                hists=hists_g, chists=chists_g, maps=maps_g, out=out[:h, :w],
                clim=clim, kh=kh, kw=kw, ns_h=ns_h, ns_w=ns_w)


# find a failing image quickly (same family as the test)
for seed in range(40):
    r = np.random.default_rng(seed)
    image = (r.uniform(size=(h, w)) * 4000).astype(np.uint16).astype(np.float32)
    o = oracle_stages(image)
    kk = kernel_stages(image)
    nbad = int((o["out"] != kk["out"]).sum())
    if nbad:
        print(f"seed {seed}: {nbad} px differ in integer out")
        print("clim oracle/kernel:", o["clim"], kk["clim"])
        print("kh kw ns:", o["kh"], o["kw"], o["ns_h"], o["ns_w"], "|", kk["kh"], kk["kw"], kk["ns_h"], kk["ns_w"])
        print("img14 equal:", np.array_equal(o["img14"], kk["img14"]))
        print("binned_core equal:", np.array_equal(o["binned_core"], kk["binned_core"]))
        print("raw hists equal:", np.array_equal(o["hists"], kk["hists"]))
        if not np.array_equal(o["hists"], kk["hists"]):
            d = np.argwhere((o["hists"] != kk["hists"]).any(-1))
            print("  tiles differing:", d[:10].tolist())
            ty, tx = d[0]
            diffb = np.argwhere(o["hists"][ty, tx] != kk["hists"][ty, tx]).ravel()
            print(f"  tile ({ty},{tx}) bins:", diffb[:10],
                  "oracle:", o["hists"][ty, tx][diffb[:10]],
                  "kernel:", kk["hists"][ty, tx][diffb[:10]])
        print("clipped equal:", np.array_equal(o["chists"], kk["chists"]))
        if np.array_equal(o["hists"], kk["hists"]) and not np.array_equal(o["chists"], kk["chists"]):
            d = np.argwhere((o["chists"] != kk["chists"]).any(-1))
            print("  clip-diff tiles:", d[:10].tolist())
            ty, tx = d[0]
            diffb = np.argwhere(o["chists"][ty, tx] != kk["chists"][ty, tx]).ravel()
            print(f"  tile ({ty},{tx}) bins:", diffb[:20])
            print("  oracle:", o["chists"][ty, tx][diffb[:20]])
            print("  kernel:", kk["chists"][ty, tx][diffb[:20]])
            print("  raw hist:", o["hists"][ty, tx][diffb[:20]], "clim:", o["clim"])
        print("maps equal:", np.array_equal(o["maps"], kk["maps"]))
        break
else:
    print("no failing seed found in 0..39")
