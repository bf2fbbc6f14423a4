"""Synthetic fluorescence-microscopy data generator.

Produces multi-channel TIFF frames statistically shaped like the reference's
inputs (SURVEY.md section 2.1: channel 2 = segmentation/nuclear marker,
channel 1 = green analysis channel) for tests, benchmarks, and the golden-file
end-to-end suite (SURVEY.md section 4: "golden-file integration tests for the
two entry points on a small synthetic TIFF set").

Cells are elliptical Gaussian blobs with ring texture; "mutant" frames get a
fraction of morphologically deviant cells (larger/brighter/lumpier) so
screening has signal to detect.
"""

from __future__ import annotations

import os

import numpy as np

from cell_image_analysis_tpu.io.tiff import imwrite


def make_frame(
    rng: np.random.Generator,
    size: int = 512,
    n_cells: int = 25,
    mutant_fraction: float = 0.0,
    background: float = 80.0,
    noise: float = 10.0,
) -> np.ndarray:
    """One (size, size, 3) uint16 frame."""
    seg = np.full((size, size), background, np.float64)
    green = np.full((size, size), background, np.float64)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)

    for _ in range(n_cells):
        mutant = rng.uniform() < mutant_fraction
        cy, cx = rng.uniform(30, size - 30, 2)
        r = rng.uniform(9, 16) * (1.6 if mutant else 1.0)
        aspect = rng.uniform(1.0, 1.8)
        theta = rng.uniform(0, np.pi)
        amp = rng.uniform(900, 1500) * (1.8 if mutant else 1.0)

        dy, dx = yy - cy, xx - cx
        u = np.cos(theta) * dy + np.sin(theta) * dx
        v = -np.sin(theta) * dy + np.cos(theta) * dx
        d2 = (u / (r * aspect)) ** 2 + (v / r) ** 2
        body = np.exp(-d2 * 2.5)
        seg += amp * body
        # green channel: body + ring texture; mutants get lumpy texture
        ring = np.exp(-((np.sqrt(d2) - 0.7) ** 2) * 14.0)
        tex = 1.0
        if mutant:
            tex = 1.0 + 0.5 * np.sin(u * 1.3) * np.sin(v * 1.3)
        green += 0.7 * amp * (0.55 * body + 0.45 * ring) * tex

    frame = np.zeros((size, size, 3), np.float64)
    frame[..., 2] = seg
    frame[..., 1] = green
    frame[..., 0] = background
    frame += rng.normal(0, noise, frame.shape)
    return np.clip(frame, 0, 65535).astype(np.uint16)


def make_frame_instances(
    rng: np.random.Generator,
    size: int = 512,
    n_cells: int = 25,
    mutant_fraction: float = 0.0,
    background: float = 80.0,
    noise: float = 10.0,
    clustering: float = 0.0,
    fg_d2: float = 1.1,
    cutoff: float = 3.0,
) -> tuple[np.ndarray, np.ndarray]:
    """One (size, size, 3) uint16 frame + TRUE instance labels (size, size).

    Unlike `make_frame` (whose ground truth can only be recovered by a
    threshold oracle, i.e. only for well-separated blobs), labels here come
    from the generator's own geometry: each cell's elliptical footprint is
    ``d2 <= fg_d2`` and contested pixels belong to the cell with the smallest
    normalized distance — exact even when cells touch or overlap.  With
    ``clustering > 0`` that fraction of cells is placed adjacent to an
    existing cell (centre distance ~1.6-2.6 r), producing the touching-
    instance packs StarDist exists to separate (the reference's pretrained
    `2D_versatile_fluo` is trained on crowded fluorescence plates —
    CAE_improved_modeltrain.py:118).

    Cells render into local windows (``cutoff`` normalized radii, where the
    Gaussian body has decayed to exp(-2.5*cutoff^2) ~ 1e-10), so a frame
    costs O(n_cells * r^2) instead of `make_frame`'s O(n_cells * size^2) —
    plate-scale (4096^2) generation drops from ~hours to seconds.
    """
    seg = np.full((size, size), background, np.float64)
    green = np.full((size, size), background, np.float64)
    labels = np.zeros((size, size), np.int32)
    best_d2 = np.full((size, size), np.inf, np.float64)
    centers: list[tuple[float, float, float]] = []  # (cy, cx, r_eff)

    for idx in range(1, n_cells + 1):
        mutant = rng.uniform() < mutant_fraction
        r = rng.uniform(9, 16) * (1.6 if mutant else 1.0)
        aspect = rng.uniform(1.0, 1.8)
        theta = rng.uniform(0, np.pi)
        amp = rng.uniform(900, 1500) * (1.8 if mutant else 1.0)
        r_eff = r * (1 + aspect) / 2

        if centers and rng.uniform() < clustering:
            cy0, cx0, r0 = centers[int(rng.integers(len(centers)))]
            ang = rng.uniform(0, 2 * np.pi)
            d = rng.uniform(1.6, 2.6) * max(r_eff, r0)
            cy = float(np.clip(cy0 + d * np.sin(ang), 30, size - 30))
            cx = float(np.clip(cx0 + d * np.cos(ang), 30, size - 30))
        else:
            cy, cx = (float(v) for v in rng.uniform(30, size - 30, 2))
        centers.append((cy, cx, r_eff))

        # local window covering `cutoff` normalized radii
        w_half = int(np.ceil(cutoff * r * max(aspect, 1.0))) + 1
        y0, y1 = max(0, int(cy) - w_half), min(size, int(cy) + w_half + 1)
        x0, x1 = max(0, int(cx) - w_half), min(size, int(cx) + w_half + 1)
        yy, xx = np.mgrid[y0:y1, x0:x1].astype(np.float64)

        dy, dx = yy - cy, xx - cx
        u = np.cos(theta) * dy + np.sin(theta) * dx
        v = -np.sin(theta) * dy + np.cos(theta) * dx
        d2 = (u / (r * aspect)) ** 2 + (v / r) ** 2
        body = np.exp(-d2 * 2.5)
        seg[y0:y1, x0:x1] += amp * body
        ring = np.exp(-((np.sqrt(d2) - 0.7) ** 2) * 14.0)
        tex = 1.0
        if mutant:
            tex = 1.0 + 0.5 * np.sin(u * 1.3) * np.sin(v * 1.3)
        green[y0:y1, x0:x1] += 0.7 * amp * (0.55 * body + 0.45 * ring) * tex

        own = (d2 <= fg_d2) & (d2 < best_d2[y0:y1, x0:x1])
        labels[y0:y1, x0:x1][own] = idx
        bwin = best_d2[y0:y1, x0:x1]
        bwin[own] = d2[own]
        best_d2[y0:y1, x0:x1] = bwin

    frame = np.zeros((size, size, 3), np.float64)
    frame[..., 2] = seg
    frame[..., 1] = green
    frame[..., 0] = background
    frame += rng.normal(0, noise, frame.shape)
    return np.clip(frame, 0, 65535).astype(np.uint16), labels


def make_dataset(
    folder: str,
    n_frames: int = 4,
    size: int = 512,
    n_cells: int = 25,
    mutant_fraction: float = 0.0,
    seed: int = 0,
) -> list[str]:
    """Write n_frames TIFFs into `folder`; returns the file paths."""
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n_frames):
        frame = make_frame(rng, size=size, n_cells=n_cells, mutant_fraction=mutant_fraction)
        p = os.path.join(folder, f"frame_{i:03d}.tif")
        imwrite(p, frame)
        paths.append(p)
    return paths


def make_cells(rng: np.random.Generator, n: int, size: int = 64, mutant: bool = False) -> np.ndarray:
    """Pre-extracted normalized cell tensors in [0,1] (BASELINE.json config #1
    shape), bypassing segmentation."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
    out = np.empty((n, size, size), np.float32)
    for i in range(n):
        cy, cx = rng.uniform(size * 0.35, size * 0.65, 2)
        r = rng.uniform(size * 0.15, size * 0.28) * (1.5 if mutant else 1.0)
        d2 = ((yy - cy) ** 2 + (xx - cx) ** 2) / (r * r)
        body = np.exp(-d2 * 2.0)
        ring = np.exp(-((np.sqrt(d2) - 0.8) ** 2) * 10.0)
        img = 0.6 * body + 0.4 * ring
        if mutant:
            img *= 1.0 + 0.4 * np.sin(yy * 0.9) * np.sin(xx * 0.9)
        img += rng.normal(0, 0.03, (size, size))
        out[i] = np.clip(img, 0, 1)
    return out
