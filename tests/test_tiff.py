"""TIFF codec round-trips and PIL oracle comparisons."""

import numpy as np
import pytest
from PIL import Image

from cell_image_analysis_tpu.io.tiff import imread, imwrite


def test_roundtrip_uint16_multichannel(tmp_path, rng):
    img = (rng.uniform(size=(120, 90, 3)) * 65535).astype(np.uint16)
    p = str(tmp_path / "x.tif")
    imwrite(p, img)
    back = imread(p)
    np.testing.assert_array_equal(back, img)


def test_roundtrip_float32(tmp_path, rng):
    img = rng.normal(size=(64, 64)).astype(np.float32)
    p = str(tmp_path / "f.tif")
    imwrite(p, img)
    np.testing.assert_array_equal(imread(p), img)


def test_pil_reads_our_output(tmp_path, rng):
    img = (rng.uniform(size=(50, 70)) * 65535).astype(np.uint16)
    p = str(tmp_path / "g.tif")
    imwrite(p, img)
    pil = np.array(Image.open(p))
    np.testing.assert_array_equal(pil, img)


def test_we_read_pil_output_uint8_rgb(tmp_path, rng):
    img = (rng.uniform(size=(40, 60, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.tif")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(imread(p), img)


def test_we_read_pil_uint16(tmp_path, rng):
    img = (rng.uniform(size=(40, 60)) * 65535).astype(np.uint16)
    p = str(tmp_path / "u16.tif")
    Image.fromarray(img, mode="I;16").save(p)
    np.testing.assert_array_equal(imread(p), img)


@pytest.mark.parametrize("comp", ["packbits", "tiff_lzw", "tiff_adobe_deflate"])
def test_we_read_compressed(tmp_path, rng, comp):
    img = (rng.uniform(size=(40, 60, 3)) * 255).astype(np.uint8)
    img[:, :20] = 7  # compressible region
    p = str(tmp_path / f"{comp}.tif")
    Image.fromarray(img).save(p, compression=comp)
    np.testing.assert_array_equal(imread(p), img)


def test_reject_non_tiff(tmp_path):
    p = str(tmp_path / "bad.tif")
    with open(p, "wb") as f:
        f.write(b"hello world")
    with pytest.raises(ValueError):
        imread(p)
