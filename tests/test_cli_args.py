"""CLI argument-contract tests (no artifacts needed).

The screen subcommand's `--sample NAME=FOLDER` dict semantics mirror the
reference's `test_folders_dict` (improved_detection.py:406-436); malformed
values must fail with a clean argparse error, not a traceback.
"""

import pytest

from cell_image_analysis_tpu import cli


def test_malformed_sample_argument_is_clean_argparse_error(capsys):
    with pytest.raises(SystemExit) as exc:
        cli.main(["screen", "--models", "/nonexistent",
                  "--sample", "no_equals_sign", "--output", "/tmp/x"])
    assert exc.value.code == 2
    assert "--sample must be NAME=FOLDER" in capsys.readouterr().err


def test_screen_requires_at_least_one_sample(capsys):
    with pytest.raises(SystemExit) as exc:
        cli.main(["screen", "--models", "/nonexistent", "--output", "/tmp/x"])
    assert exc.value.code == 2
    assert "at least one --sample" in capsys.readouterr().err


def test_unknown_subcommand_errors():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])
