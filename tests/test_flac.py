"""FLAC codec pins beyond the oracle entry: losslessness per strategy,
CRC tamper detection, stereo decorrelation exactness, envelope raises.
"""

from __future__ import annotations

import pytest

from simple_data_engineering_project_spark.operators.flac import (
    decode_flac,
    encode_flac,
)


def _sig(n, seed):
    return [((seed * 31 + i * 17) % 4001) - 2000 for i in range(n)]


@pytest.mark.parametrize(
    "strategy",
    ["verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc"],
)
def test_lossless_roundtrip_every_strategy(strategy):
    chans = [_sig(700, 3)]
    d = decode_flac(
        encode_flac(chans, strategy=strategy, lpc_coefs=[19, -7, 2], lpc_shift=4)
    )
    assert d["samples"] == chans
    assert d["n_samples"] == 700


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_exact(mode):
    chans = [_sig(600, 5), _sig(600, 11)]
    d = decode_flac(encode_flac(chans, strategy="fixed2", stereo_mode=mode))
    assert d["samples"] == chans
    assert d["channels"] == 2


def test_constant_blocks_and_extremes():
    d = decode_flac(encode_flac([[1234] * 500], strategy="constant"))
    assert d["samples"] == [[1234] * 500]
    wild = [[32767, -32768] * 200]  # rice blowup → raw-escape partitions
    assert decode_flac(encode_flac(wild, strategy="fixed2"))["samples"] == wild


def test_short_tail_block_clamps_predictor_order():
    # 257 samples at blocksize 256 → a 1-sample tail block that cannot
    # carry an order-2 warmup; the encoder must drop the order, and the
    # stream still decodes losslessly
    chans = [_sig(257, 157)]
    for strategy in ("fixed2", "fixed4", "lpc"):
        d = decode_flac(
            encode_flac(chans, strategy=strategy, lpc_coefs=[19, -7, 2])
        )
        assert d["samples"] == chans, strategy


def test_crc_tamper_detected():
    p = bytearray(encode_flac([_sig(300, 9)], strategy="fixed1"))
    # flip one bit deep in the last frame's residuals: CRC-16 must catch
    p[-20] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(p))


def test_envelope_rejections():
    p = bytearray(encode_flac([_sig(300, 9)]))
    # tamper STREAMINFO to claim 24-bit: the frame headers still code
    # 16-bit, so the per-frame consistency check must catch it
    packed = int.from_bytes(p[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | ((24 - 1) << 36)
    p[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="differs from STREAMINFO"):
        decode_flac(bytes(p))
    with pytest.raises(ValueError):
        decode_flac(b"OggS not a flac")
    with pytest.raises(ValueError, match="cover the signal"):
        encode_flac([_sig(300, 9)], variable_blocksizes=[100, 100])
    # a wasted-bit request the data cannot support CLAMPS per subframe
    # (real encoders derive k from the data) instead of failing
    odd = [3] * 100
    d = decode_flac(encode_flac([odd], strategy="verbatim", wasted=2))
    assert d["samples"][0] == odd


@pytest.mark.parametrize("bps", [8, 12, 20, 24])
def test_bit_depths_roundtrip(bps):
    import random

    rng = random.Random(bps)
    lim = (1 << (bps - 1)) - 1
    s = [rng.randint(-lim - 1, lim) for _ in range(500)]
    d = decode_flac(encode_flac([s], strategy="fixed2", bps=bps))
    assert d["samples"][0] == s
    # stereo decorrelation carries the +1-bit side channel at any depth
    l = [rng.randint(-lim - 1, lim) for _ in range(400)]
    r = [rng.randint(-lim - 1, lim) for _ in range(400)]
    d = decode_flac(
        encode_flac([l, r], strategy="fixed1", stereo_mode="mid_side", bps=bps)
    )
    assert d["samples"] == [l, r]


@pytest.mark.parametrize(
    "strategy", ["verbatim", "fixed2", "lpc", "constant"]
)
def test_wasted_bits_roundtrip(strategy):
    base = [64] * 350 if strategy == "constant" else [
        v * 8 for v in _sig(350, 5)
    ]
    d = decode_flac(
        encode_flac(
            [base], strategy=strategy, wasted=3,
            lpc_coefs=[19, -7, 2], lpc_shift=4,
        )
    )
    assert d["samples"][0] == base


def test_wasted_bits_clamp_with_mid_side():
    # mid = (l+r)>>1 only guarantees HALF the input's shared zero bits:
    # the encoder must clamp that subframe's wasted count, not raise
    l = [v * 4 for v in _sig(300, 3)]
    r = [v * 4 + 4 for v in _sig(300, 7)]  # mid is a multiple of 2 only
    d = decode_flac(
        encode_flac([l, r], strategy="fixed1", stereo_mode="mid_side",
                    wasted=2)
    )
    assert d["samples"] == [l, r]


def test_variable_blocksize_roundtrip():
    s = _sig(1000, 11)
    d = decode_flac(
        encode_flac(
            [s], strategy="fixed2", variable_blocksizes=[300, 137, 400, 163]
        )
    )
    assert d["samples"][0] == s
    # combined: variable + 24-bit + wasted + stereo left/side
    l = [v * 4 for v in _sig(700, 13)]
    r = [v * 4 for v in _sig(700, 29)]
    d = decode_flac(
        encode_flac(
            [l, r], strategy="lpc", stereo_mode="left_side", bps=24,
            wasted=2, variable_blocksizes=[512, 188],
            lpc_coefs=[19, -7, 2], lpc_shift=4,
        )
    )
    assert d["samples"] == [l, r]
