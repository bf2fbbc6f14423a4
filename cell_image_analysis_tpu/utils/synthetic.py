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
