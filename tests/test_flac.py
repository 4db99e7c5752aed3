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
    # claim 24-bit depth in STREAMINFO (bits-per-sample field)
    packed = int.from_bytes(p[18:26], "big")
    packed = (packed & ~(0x1F << 36)) | ((24 - 1) << 36)
    p[18:26] = packed.to_bytes(8, "big")
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_flac(bytes(p))
    with pytest.raises(ValueError):
        decode_flac(b"OggS not a flac")
