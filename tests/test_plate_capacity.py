"""Plate-scale capacity hardening regression tests (VERDICT r4 item 5).

Round 4 found BOTH plate-scale bench rows silently capacity-bound: the
StarDist `max_candidates` top-K does not scale with frame area and dropped
~95% of planted cells on 4096^2 plates with every other overflow flag green
(BENCH.md r4s3).  Two features fixed it — `InstanceDetails.cand_overflow`
(models/stardist.py: above-threshold local-maxima count vs the cap) and
area-scaled production capacities (pipeline/screening.py::_segment_for) —
and neither had a test.  These are those tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cell_image_analysis_tpu.utils.bench import stardist_backend
from cell_image_analysis_tpu.utils.synthetic import make_frame_instances


def _norm_seg(frame):
    return jnp.asarray(frame[..., 2].astype(np.float32))


def test_cand_overflow_fires_when_candidate_cap_binds(rng):
    """A dense plate with more prob-map local maxima than max_candidates
    must set cand_overflow (the r4s3 silent-loss signal); the same plate
    under a non-binding cap must not, and must keep far more instances."""
    frame, labels = make_frame_instances(rng, size=512, n_cells=60,
                                         clustering=0.2)
    seg = _norm_seg(frame)
    planted = int(labels.max())

    from cell_image_analysis_tpu.models.stardist import predict_instances

    small = stardist_backend(max_candidates=16, raster_cap=64)
    _, details_small = predict_instances(seg, small.variables, small.cfg,
                                         model=small.model)
    assert bool(details_small.cand_overflow), (
        "16 candidates on a ~60-cell plate must trip cand_overflow"
    )

    big = stardist_backend(max_candidates=1024, raster_cap=256,
                           nms_max_pairs=1 << 17)
    _, details_big = predict_instances(seg, big.variables, big.cfg,
                                       model=big.model)
    assert not bool(details_big.cand_overflow)

    kept_small = int(np.sum(np.asarray(details_small.keep)))
    kept_big = int(np.sum(np.asarray(details_big.keep)))
    assert kept_small <= 16
    # the non-binding cap recovers the plate (synthetic U-Net coverage is
    # ~0.7 on dense/touching packs — assert the order of magnitude, not
    # detector perfection)
    assert kept_big >= 0.6 * planted, (kept_big, planted)
    assert kept_big > 2 * kept_small


def test_cand_overflow_ignores_reflect_pad_mirror_peaks(rng):
    """ADVICE r4 #3: peaks in the reflect-pad region must not double-count.
    A frame whose size is NOT a multiple of the U-Net alignment gets
    reflect-padded; with the count masked to the unpadded grid, a cap just
    above the true peak count must not spuriously overflow."""
    frame, labels = make_frame_instances(rng, size=500, n_cells=30)
    seg = _norm_seg(frame)

    from cell_image_analysis_tpu.models.stardist import predict_instances

    probe = stardist_backend(max_candidates=256, raster_cap=128)
    _, details = predict_instances(seg, probe.variables, probe.cfg,
                                   model=probe.model)
    n_kept = int(np.sum(np.asarray(details.keep)))
    assert n_kept > 10
    assert not bool(details.cand_overflow)


def test_capacity_scale_is_frame_area_multiple():
    from cell_image_analysis_tpu.pipeline.screening import (
        ProductionMutantScreening,
    )

    scale = ProductionMutantScreening._capacity_scale
    assert scale(None, 512, 512) == 1
    assert scale(None, 1024, 1024) == 1
    assert scale(None, 1024, 2048) == 2
    assert scale(None, 2048, 2048) == 4
    assert scale(None, 4096, 4096) == 16
    assert scale(None, 1025, 1024) == 2  # ceil, never truncate
