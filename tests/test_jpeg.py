"""Baseline JPEG codec unit tests — the decoder must parse real
entropy-coded bytes (Huffman, EXTEND, EOB/ZRL, stuffing), not headers.
"""

from __future__ import annotations

import numpy as np
import pytest

from simple_data_engineering_project_spark.operators.jpeg import (
    _C,
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_blocks,
)


def test_dc_only_pixels_are_exact_per_block():
    w, h, base = 20, 12, 100  # 3x2 blocks, right/bottom blocks cropped
    nbx, nby = 3, 2
    blocks = [
        (base + by * nbx + bx - 128, 0)
        for by in range(nby)
        for bx in range(nbx)
    ]
    px = decode_jpeg_pixels(encode_jpeg_blocks(w, h, blocks))
    assert px.shape == (h, w)
    for by in range(nby):
        for bx in range(nbx):
            region = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (region == base + by * nbx + bx).all()


def test_ac_coefficient_matches_direct_idct():
    blocks = [(-20, 1), (5, -1), (0, 0), (0, 0), (0, 0), (0, 0)]
    px = decode_jpeg_pixels(encode_jpeg_blocks(20, 12, blocks))
    blk = np.zeros((8, 8))
    blk[ZIGZAG[0]] = -20 * 8  # dequantized DC (q_dc=8)
    blk[ZIGZAG[1]] = 1 * 16  # dequantized AC1 (q_ac=16)
    ref = np.clip(np.round(_C.T @ blk @ _C + 128), 0, 255)
    assert (px[:8, :8] == ref).all()


def test_dc_diff_chain_crosses_zero_and_stuffs_bytes():
    # extreme DC swings force large categories and 0xFF scan bytes;
    # the decoder must unstuff and EXTEND correctly
    blocks = [(127, 0), (-128, 0), (127, 0), (0, 1), (-1, 0), (100, 1)]
    px = decode_jpeg_pixels(encode_jpeg_blocks(20, 12, blocks))
    assert px.shape == (12, 20)
    assert (px[:8, :8] == 255).all()  # clamp at 127+128


def test_single_block_exact_sum():
    px = decode_jpeg_pixels(encode_jpeg_blocks(5, 3, [(42 - 128, 0)]))
    assert px.shape == (3, 5)
    assert int(px.sum()) == 5 * 3 * 42


def test_rejects_unsupported_envelopes():
    payload = bytearray(encode_jpeg_blocks(8, 8, [(0, 0)]))
    # flip SOF0 -> SOF3 (lossless sequential)
    idx = bytes(payload).index(b"\xff\xc0")
    payload[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(payload))

    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"BM not a jpeg")


def _expect_rgb(y_dc, cb_dc, cr_dc):
    y, cb, cr = y_dc + 128.0, cb_dc + 128.0, cr_dc + 128.0
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return tuple(int(np.clip(np.round(v), 0, 255)) for v in (r, g, b))


def test_ycbcr420_constant_color_decodes_exactly():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_ycbcr420,
    )

    # non-MCU-aligned dims exercise padding/crop; interleaved MCUs
    # exercise per-component DC predictors and 2x2 luma ordering
    for w, h in [(16, 16), (20, 12), (33, 17)]:
        for y_dc, cb_dc, cr_dc in [(0, 0, 0), (-50, 30, -40), (100, -100, 60)]:
            px = decode_jpeg_pixels(
                encode_jpeg_ycbcr420(w, h, y_dc, cb_dc, cr_dc)
            )
            e = _expect_rgb(y_dc, cb_dc, cr_dc)
            assert px.shape == (h, w, 3)
            for i in range(3):
                assert (px[:, :, i] == e[i]).all()


def test_ycbcr420_with_restart_intervals():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_ycbcr420,
    )

    px = decode_jpeg_pixels(
        encode_jpeg_ycbcr420(48, 32, -50, 30, -40, restart_interval=2)
    )
    assert px.shape == (32, 48, 3)
    assert tuple(px[0, 0]) == _expect_rgb(-50, 30, -40)


def test_rejects_non_integral_upsampling():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_ycbcr420,
    )

    payload = bytearray(encode_jpeg_ycbcr420(16, 16, 0, 0, 0))
    idx = bytes(payload).index(b"\xff\xc0")
    payload[idx + 11] = 0x33  # luma 3x3 ...
    payload[idx + 14] = 0x22  # ... vs chroma 2x2: 3/2 is non-integral
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bytes(payload))


def test_restart_intervals_reset_predictors_and_realign():
    base = 100
    blocks = [(base + k - 128, 0) for k in range(6)]
    expect = np.zeros((12, 20))
    for by in range(2):
        for bx in range(3):
            expect[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = base + by * 3 + bx
    for ri in (1, 2, 4, 5):
        px = decode_jpeg_pixels(
            encode_jpeg_blocks(20, 12, blocks, restart_interval=ri)
        )
        assert (px == expect[:12, :20]).all(), f"restart_interval={ri}"
    # more than 8 restart segments exercises the RST0-7 marker cycle
    many = [(i % 40 - 20, 0) for i in range(24)]
    px = decode_jpeg_pixels(encode_jpeg_blocks(64, 24, many, restart_interval=1))
    assert px.shape == (24, 64)


def test_progressive_equals_baseline_decode():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_progressive_gray,
    )

    # mixed DC/AC coefficients + long EOB runs, at three DC point
    # transforms (al=0 is pure spectral selection; al>0 adds DC
    # successive-approximation refinement scans)
    blocks = [(k % 7 - 3, 1 if k % 4 == 0 else 0) for k in range(15)]
    base = decode_jpeg_pixels(encode_jpeg_blocks(40, 24, blocks))
    for al in (0, 1, 2):
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive_gray(40, 24, blocks, dc_al=al)
        )
        assert (prog == base).all(), f"dc_al={al}"


def test_progressive_dc_only_closed_form():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_progressive_gray,
    )

    blocks = [(100 + k - 128, 0) for k in range(6)]
    px = decode_jpeg_pixels(
        encode_jpeg_progressive_gray(20, 12, blocks, dc_al=1)
    )
    for by in range(2):
        for bx in range(3):
            assert (px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8][
                : min(8, 12 - by * 8), : min(8, 20 - bx * 8)
            ] == 100 + by * 3 + bx).all()


def _idct_expected(w, h, blocks, q_dc=8, q_ac1=16):
    """Closed-form pixels for per-block (dc, ac1) coefficients — an
    independent IDCT of the coefficient table, no entropy decode. Used
    where the baseline encoder's minimal size-1 AC table cannot carry
    the multi-bit magnitudes the refinement tests need."""
    import numpy as np

    from simple_data_engineering_project_spark.operators import jpeg as J

    nbx, nby = (w + 7) // 8, (h + 7) // 8
    out = np.zeros((nby * 8, nbx * 8))
    for i, (dc, ac) in enumerate(blocks):
        by, bx = divmod(i, nbx)
        blk = np.zeros((8, 8))
        blk[0, 0] = dc * q_dc
        r, c = J.ZIGZAG[1]
        blk[r, c] = ac * q_ac1
        out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            J._C.T @ blk @ J._C + 128.0
        )
    return np.clip(np.round(out[:h, :w]), 0, 255).astype("uint8")


def test_progressive_ac_refinement_matches_idct():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_progressive_gray,
    )

    # AC successive approximation: first scan at al=ac_al sees ±1, each
    # refinement scan appends one magnitude bit or newly reveals a
    # coefficient whose top bit sits below ac_al. Magnitudes exercise
    # every refinement branch: already-visible correction (|ac|≥2^ac_al,
    # bits 1 and 0), newly visible mid-plane (|ac|<2^ac_al), and
    # zero-history blocks.
    for ac_al in (1, 2):
        lo, hi = 1 << ac_al, (1 << (ac_al + 1)) - 1
        blocks = []
        for k in range(15):
            if k % 4 == 0:
                ac = (lo + k % (hi - lo + 1)) * (1 if k % 8 == 0 else -1)
            elif k % 4 == 1 and ac_al == 2:
                ac = 2 * (1 if k % 3 else -1)  # newly visible at bit 1
            else:
                ac = 0
            blocks.append((k % 7 - 3, ac))
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive_gray(40, 24, blocks, ac_al=ac_al)
        )
        assert (prog == _idct_expected(40, 24, blocks)).all(), f"{ac_al}"


def test_progressive_restart_intervals_match_idct():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_progressive_gray,
    )

    # RSTn inside progressive scans: DC prediction and EOB-run state
    # reset at every segment boundary, in first AND refinement scans.
    blocks = [(k % 7 - 3, [0, 5, -6, 0][k % 4]) for k in range(15)]
    want = _idct_expected(40, 24, blocks)
    for ri in (1, 2, 4):
        prog = decode_jpeg_pixels(
            encode_jpeg_progressive_gray(
                40, 24, blocks, dc_al=1, ac_al=2, restart_interval=ri
            )
        )
        assert (prog == want).all(), f"ri={ri}"


def test_multiscan_baseline_decodes():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_multiscan,
    )

    # three non-interleaved scans, one per component; neutral chroma
    # (dc=0 -> 128 exactly) makes R=G=B=Y = dc+128 per block
    y = [(20, 0), (-20, 0)]
    neutral = [(0, 0)] * 2
    img = decode_jpeg_pixels(
        encode_jpeg_multiscan(16, 8, [y, neutral, neutral])
    )
    assert img.shape == (8, 16, 3)
    assert np.all(img[:, :8] == 148) and np.all(img[:, 8:] == 108)
    # chroma planes decoded from their own scans shift colors per BT.601
    img2 = decode_jpeg_pixels(
        encode_jpeg_multiscan(8, 8, [[(0, 0)], [(0, 0)], [(10, 0)]])
    )
    assert tuple(img2[0, 0]) == (142, 121, 128)  # R=+1.402*10, G=-0.714*10
    # restart markers segment each scan independently
    dcs = [(i, 0) for i in range(4)]
    img3 = decode_jpeg_pixels(
        encode_jpeg_multiscan(32, 8, [dcs, [(0, 0)] * 4, [(0, 0)] * 4],
                              restart_interval=2)
    )
    assert [int(v) for v in img3[0, ::8, 1]] == [128, 129, 130, 131]


def test_baseline_scan_with_progressive_params_raises():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_progressive_gray,
    )

    # a spectral-selection stream re-labelled SOF0 is malformed: a
    # baseline scan must declare the full 0..63 band with no point
    # transform — raise loudly instead of decoding garbage
    payload = bytearray(encode_jpeg_progressive_gray(8, 8, [(0, 1)]))
    i = payload.index(b"\xff\xc2")
    payload[i + 1] = 0xC0
    with pytest.raises(ValueError, match="progressive spectral"):
        decode_jpeg_pixels(bytes(payload))


def test_progressive_420_equals_baseline_420():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_progressive_ycbcr420,
        encode_jpeg_ycbcr420,
    )

    # subsampled progressive: interleaved DC scan walks 4Y+Cb+Cr blocks
    # per MCU on the PADDED grid; AC scans walk each component's OWN
    # ceil(cw/8)×ceil(ch/8) grid — non-multiple-of-16 dims make the two
    # grids genuinely differ. Restart intervals split the DC scan.
    for (w, h) in [(48, 32), (20, 14), (17, 9)]:
        base = decode_jpeg_pixels(encode_jpeg_ycbcr420(w, h, -50, 30, -40))
        for ri in (0, 2):
            prog = decode_jpeg_pixels(
                encode_jpeg_progressive_ycbcr420(
                    w, h, -50, 30, -40, restart_interval=ri
                )
            )
            assert (prog == base).all(), (w, h, ri)


def test_lossless_roundtrip_all_predictors_and_precisions():
    import numpy as np

    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    rng = np.random.RandomState(7)
    for pred in range(1, 8):
        a = rng.randint(0, 256, size=(13, 17))
        got = decode_jpeg_pixels(encode_jpeg_lossless(a, predictor=pred))
        assert got.dtype == np.uint8 and np.array_equal(got, a)
        a3 = rng.randint(0, 256, size=(9, 11, 3))
        got = decode_jpeg_pixels(encode_jpeg_lossless(a3, predictor=pred))
        assert got.shape == (9, 11, 3) and np.array_equal(got, a3)
        a16 = rng.randint(0, 65536, size=(8, 10))
        got = decode_jpeg_pixels(
            encode_jpeg_lossless(a16, predictor=pred, precision=16)
        )
        assert got.dtype == np.uint16 and np.array_equal(got, a16)
        # point transform: decoder returns (v >> pt) << pt
        a12 = rng.randint(0, 4096, size=(6, 7))
        got = decode_jpeg_pixels(
            encode_jpeg_lossless(a12, predictor=pred, precision=12, pt=2)
        )
        assert np.array_equal(got, (a12 >> 2) << 2)


def test_lossless_closed_form_anchors():
    import numpy as np

    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    # single sample: only the 2^(P-1) default-prediction path
    assert decode_jpeg_pixels(encode_jpeg_lossless(np.array([[200]])))[
        0, 0
    ] == 200
    # the category-16 special code: diff ≡ 32768 (mod 2^16), no extra
    # bits — 32768 -> 0 after the default predictor 32768 hits it
    w = np.array([[32768, 0], [1, 65535]], dtype=np.int64)
    got = decode_jpeg_pixels(encode_jpeg_lossless(w, precision=16))
    assert np.array_equal(got, w)
    # predictor arithmetic is integer with arithmetic >> (floor), per
    # Annex H: row [10, 0] over row [0, ...] with predictor 5
    # (a + (b-c)>>1): at (1,1) a=0? — pin exact plane instead
    a = np.array([[10, 0], [0, 250]])
    for pred in range(1, 8):
        got = decode_jpeg_pixels(encode_jpeg_lossless(a, predictor=pred))
        assert np.array_equal(got, a), pred


def test_lossless_envelope_raises():
    import numpy as np
    import pytest

    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_lossless,
    )

    blob = bytearray(encode_jpeg_lossless(np.full((4, 4), 9)))
    # splice a DRI segment after SOI -> restart intervals are outside
    # the lossless envelope and must raise, not desync
    dri = b"\xff\xdd\x00\x04\x00\x02"
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_pixels(bytes(blob[:2]) + dri + bytes(blob[2:]))
    with pytest.raises(ValueError):
        encode_jpeg_lossless(np.full((2, 2), 1), predictor=9)


def test_unknown_scan_component_raises_cleanly():
    from simple_data_engineering_project_spark.operators.jpeg import (
        encode_jpeg_blocks,
    )

    # rewrite the SOS component id 1 -> 9 (absent from SOF): must be a
    # clean ValueError before any entropy decode, not a KeyError
    payload = bytearray(encode_jpeg_blocks(8, 8, [(0, 0)]))
    at = payload.index(b"\xff\xda")
    # SOS: marker(2) len(2) ns(1) then (cid, tables) pairs
    assert payload[at + 5] == 1
    payload[at + 5] = 9
    with pytest.raises(ValueError, match="absent from the SOF"):
        decode_jpeg_pixels(bytes(payload))
