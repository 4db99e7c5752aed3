"""GIF LZW codec unit tests — real variable-width decompression, not
palette-table sniffing.
"""

from __future__ import annotations

import numpy as np
import pytest

from simple_data_engineering_project_spark.operators.gif import (
    decode_gif_pixels,
    encode_gif,
)


def test_gradient_roundtrip_and_closed_form_sum():
    w, h, base = 20, 12, 100
    idx = np.fromfunction(lambda y, x: base + x + y, (h, w)).astype(np.uint8)
    px = decode_gif_pixels(encode_gif(w, h, idx))
    assert px.shape == (h, w, 3)
    assert (px[:, :, 0] == idx).all() and (px[:, :, 2] == idx).all()
    assert int(px[:, :, 0].sum()) == (
        w * h * base + h * (w * (w - 1)) // 2 + w * (h * (h - 1)) // 2
    )


def test_constant_image_hits_kwkwk():
    # all-same pixels force code == next_code immediately (KwKwK)
    idx = np.full((9, 17), 42, dtype=np.uint8)
    px = decode_gif_pixels(encode_gif(17, 9, idx))
    assert (px[:, :, 0] == 42).all()


def test_noise_exercises_width_growth_and_table_reset():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 256, size=(256, 300)).astype(np.uint8)
    # 76,800 px of noise blows through 9/10/11/12-bit widths and forces
    # at least one table-overflow CLEAR
    px = decode_gif_pixels(encode_gif(300, 256, idx))
    assert (px[:, :, 0] == idx).all()


def test_interlace_roundtrip():
    idx = np.arange(20 * 12, dtype=np.uint8).reshape(12, 20)
    px = decode_gif_pixels(encode_gif(20, 12, idx, interlace=True))
    assert (px[:, :, 0] == idx).all()


def test_small_palette_maps_rgb():
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, size=(10, 10)).astype(np.uint8)
    px = decode_gif_pixels(encode_gif(10, 10, idx, palette=pal))
    for y in range(10):
        for x in range(10):
            assert tuple(px[y, x]) == pal[idx[y, x]]


def test_rejects_non_gif():
    with pytest.raises(ValueError):
        decode_gif_pixels(b"\xff\xd8 not a gif")


def test_animated_frames_and_composition():
    import numpy as np

    from simple_data_engineering_project_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    # full-canvas frames round-trip with delays
    W, H, N = 12, 7, 5
    frames = [
        ((np.arange(H * W).reshape(H, W) + f * 11) % 220).astype(np.uint8)
        for f in range(N)
    ]
    out = decode_gif_frames(encode_gif_animated(frames, delays_cs=[50] * N))
    assert len(out) == N
    for f, (delay, rgb) in enumerate(out):
        assert delay == 50
        assert (rgb == frames[f][..., None].repeat(3, axis=2)).all()


def test_animated_partial_transparency_and_disposal():
    import numpy as np

    import pytest as _pytest

    from simple_data_engineering_project_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animated,
    )

    base = np.full((6, 10), 5, dtype=np.uint8)
    patch = np.full((2, 3), 9, dtype=np.uint8)
    patch[0, 1] = 200  # transparent index
    # disposal 1 (leave): patch paints at (left=4, top=2); transparent
    # pixel keeps the base underneath
    out = decode_gif_frames(
        encode_gif_animated(
            [base, patch], [10, 20], rects=[(0, 0), (4, 2)], transparent=200
        )
    )
    f1 = out[1][1]
    assert (f1[2, 4] == 9).all() and (f1[2, 5] == 5).all()
    # disposal 3 (restore previous): the third frame must NOT see the
    # second frame's patch
    out3 = decode_gif_frames(
        encode_gif_animated(
            [base, patch, patch],
            [10, 10, 10],
            rects=[(0, 0), (4, 2), (0, 0)],
            disposals=[1, 3, 1],
        )
    )
    assert (out3[1][1][2, 4] == 9).all()
    assert (out3[2][1][2, 4] == 5).all()
    # disposal 2 (restore background): the rect reverts to bg color
    out2 = decode_gif_frames(
        encode_gif_animated(
            [base, patch, base],
            [10, 10, 10],
            rects=[(0, 0), (4, 2), (0, 0)],
            disposals=[1, 2, 1],
        )
    )
    assert (out2[1][1][2, 4] == 9).all() and (out2[2][1][2, 4] == 5).all()
