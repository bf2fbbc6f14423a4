"""Training checkpoint/resume: interrupted run continues deterministically."""

import pytest
import numpy as np

from cell_image_analysis_tpu.config import TrainConfig
from cell_image_analysis_tpu.train.trainer import fit_cae
from tests.test_cae_training import _cells


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path, rng):
    cells = _cells(rng, n=64)
    full_cfg = TrainConfig(epochs=6, batch_size=32)

    # uninterrupted reference run
    _, _, hist_full = fit_cae(cells, train_cfg=full_cfg, verbose=False)

    # run 3 epochs, "crash", resume for the remaining 3
    ck = str(tmp_path / "ck")
    _, _, h1 = fit_cae(cells, train_cfg=TrainConfig(epochs=3, batch_size=32),
                       verbose=False, checkpoint_dir=ck)
    _, _, h2 = fit_cae(cells, train_cfg=full_cfg, verbose=False,
                       checkpoint_dir=ck, resume=True)

    assert len(h2.history["loss"]) == 6
    assert h2.history["loss"][:3] == h1.history["loss"]
    # the resumed trajectory must match the uninterrupted one closely
    # (bitwise-identical modulo cross-process float nondeterminism)
    np.testing.assert_allclose(h2.history["loss"], hist_full.history["loss"], rtol=1e-4)
    np.testing.assert_allclose(h2.history["val_loss"], hist_full.history["val_loss"], rtol=1e-4)


def test_resume_without_checkpoint_starts_fresh(tmp_path, rng):
    cells = _cells(rng, n=64)
    _, _, h = fit_cae(cells, train_cfg=TrainConfig(epochs=2, batch_size=32),
                      verbose=False, checkpoint_dir=str(tmp_path / "none"), resume=True)
    assert len(h.history["loss"]) == 2
