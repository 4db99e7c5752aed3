"""PNG envelope extensions: Adam7 interlace + palette color, pinned by
round trips at pass-grid edge sizes and cross-validated both directions
against Java ImageIO (so the codec pair is not self-consistent)."""

from __future__ import annotations

import numpy as np
import pytest

from simple_data_engineering_project_spark.operators.multimodal import (
    decode_png_pixels,
    encode_png_adam7,
    encode_png_palette,
)


def _arr(w, h, ch):
    return (
        (np.arange(w * h * ch, dtype=np.int64) * 37 % 256)
        .astype(np.uint8)
        .reshape(h, w, ch)
    )


@pytest.mark.parametrize(
    "w,h,ch", [(1, 1, 1), (7, 3, 3), (8, 8, 4), (13, 11, 2), (33, 17, 3),
               (2, 9, 1)]
)
def test_adam7_roundtrip_at_pass_grid_edges(w, h, ch):
    # tiny/odd sizes leave several of the 7 passes empty or 1-wide —
    # exactly where scatter arithmetic goes wrong
    px = _arr(w, h, ch)
    back = decode_png_pixels(encode_png_adam7(px))
    assert back.shape == (h, w, ch) and (back == px).all()


def test_palette_with_and_without_trns():
    idx = (np.arange(15 * 9) % 7).astype(np.uint8).reshape(9, 15)
    pal = (np.arange(21) * 31 % 256).astype(np.uint8).reshape(7, 3)
    back = decode_png_pixels(encode_png_palette(idx, pal))
    assert back.shape == (9, 15, 3) and (back == pal[idx]).all()
    backa = decode_png_pixels(
        encode_png_palette(idx, pal, trns=bytes([10, 20, 30]))
    )
    assert backa.shape == (9, 15, 4)
    want_a = np.where(idx < 3, (idx * 10 + 10).astype(np.uint8), 255)
    assert (backa[:, :, 3] == want_a).all()


def test_imageio_cross_validation(spark):
    jvm = spark.sparkContext._jvm

    def imageio_rgb(payload):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(payload))
        img = jvm.javax.imageio.ImageIO.read(bais)
        h, w = img.getHeight(), img.getWidth()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                v = img.getRGB(x, y)
                out[y, x] = [(v >> 16) & 255, (v >> 8) & 255, v & 255]
        return out

    px = _arr(13, 7, 3)
    assert (imageio_rgb(encode_png_adam7(px)) == px).all()
    idx = (np.arange(15 * 9) % 7).astype(np.uint8).reshape(9, 15)
    pal = (np.arange(21) * 31 % 256).astype(np.uint8).reshape(7, 3)
    assert (imageio_rgb(encode_png_palette(idx, pal)) == pal[idx]).all()
    # reverse direction: ImageIO-written PNG parses with our decoder
    img = jvm.java.awt.image.BufferedImage(
        9, 5, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(5):
        for x in range(9):
            img.setRGB(x, y, (x * 20 << 16) | (y * 40 << 8) | ((x + y) * 10))
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(img, "png", baos)
    ours = decode_png_pixels(bytes(baos.toByteArray()))
    for y in range(5):
        for x in range(9):
            assert tuple(int(v) for v in ours[y, x]) == (
                x * 20, y * 40, (x + y) * 10,
            )
