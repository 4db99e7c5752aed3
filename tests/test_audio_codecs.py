"""G.711 + IMA-ADPCM codec pins (the oracle entry covers the G.711
byte-stream math end-to-end; these pin codec-level anchors, the lossy
ADPCM state machine, and the container dispatch)."""

from __future__ import annotations

import math
import struct

import pytest

from simple_data_engineering_project_spark.operators.audio_codecs import (
    WAVE_FORMAT_ALAW,
    WAVE_FORMAT_IMA_ADPCM,
    WAVE_FORMAT_MULAW,
    alaw_decode_byte,
    alaw_encode_sample,
    decode_wav_compressed,
    encode_wav_compressed,
    ima_adpcm_decode,
    ima_adpcm_encode,
    mulaw_decode_byte,
    mulaw_encode_sample,
)


def test_g711_anchor_values():
    # standard table anchors: 0xFF is μ-law zero; 0x7F is negative zero;
    # A-law 0xD5/0x55 are ±8 (sign bit SET = positive, inverted vs μ)
    assert mulaw_decode_byte(0xFF) == 0
    assert mulaw_decode_byte(0x7F) == 0
    # 0x00 complements to 0xFF (sign set) → largest negative; 0x80 → 0x7F
    assert mulaw_decode_byte(0x00) == -32124
    assert mulaw_decode_byte(0x80) == 32124
    assert alaw_decode_byte(0xD5) == 8
    assert alaw_decode_byte(0x55) == -8
    assert alaw_decode_byte(alaw_encode_sample(32767)) == 32256
    assert alaw_decode_byte(alaw_encode_sample(-32768)) == -32256


def test_g711_roundtrip_within_quantization():
    # logarithmic companding: relative error bounded by the segment step
    for s in range(-32768, 32768, 97):
        m = mulaw_decode_byte(mulaw_encode_sample(s))
        a = alaw_decode_byte(alaw_encode_sample(s))
        assert abs(m - max(-32635, min(32635, s))) <= abs(s) / 16 + 40, s
        assert abs(a - s) <= abs(s) / 12 + 40, s


def test_ima_adpcm_exact_decode_of_known_nibbles():
    # one mono block, predictor 100, index 0 (step 7): nibble 0 adds
    # step>>3 = 0 (index drops to 0); nibble 4 adds step; nibble 12 (=4|8)
    # subtracts — the exact state walk, low nibble first
    block = struct.pack("<hBB", 100, 0, 0) + bytes([0x40, 0xCC])
    #                    nibbles: 0x0, 0x4, 0xC, 0xC
    out = ima_adpcm_decode(block, block_align=8)
    # step walk: idx0 step7: n=0 → +0 (idx→0); n=4 → +7, idx+2 → 2
    # (step 9); n=12=8|4 → −(1+9)=−10, idx+2 → 4 (step 11);
    # n=12 → −(1+11)=−12
    assert out == [100, 100, 107, 97, 85]


def test_ima_adpcm_sine_snr():
    sig = [int(8000 * math.sin(2 * math.pi * 50 * i / 8000)) for i in range(2000)]
    dec = ima_adpcm_decode(ima_adpcm_encode(sig, 256), 256)[: len(sig)]
    num = sum(x * x for x in sig)
    den = sum((a - b) ** 2 for a, b in zip(sig, dec))
    snr = 10 * math.log10(num / max(den, 1))
    assert snr > 30, snr  # 4-bit ADPCM lands ~40 dB on a slow sine


def test_container_dispatch_and_unknown_format():
    sig = [i * 11 % 2000 - 1000 for i in range(300)]
    mu = encode_wav_compressed(
        bytes(mulaw_encode_sample(s) for s in sig), WAVE_FORMAT_MULAW
    )
    d = decode_wav_compressed(mu)
    assert d["format"] == WAVE_FORMAT_MULAW and d["n_samples"] == 300
    al = encode_wav_compressed(
        bytes(alaw_encode_sample(s) for s in sig), WAVE_FORMAT_ALAW
    )
    assert decode_wav_compressed(al)["format"] == WAVE_FORMAT_ALAW
    ad = encode_wav_compressed(
        ima_adpcm_encode(sig, 64), WAVE_FORMAT_IMA_ADPCM, block_align=64
    )
    d3 = decode_wav_compressed(ad)
    assert d3["format"] == WAVE_FORMAT_IMA_ADPCM
    assert d3["samples"][0] == sig[0]  # block header carries sample 0
    # MP3-in-WAV (format 0x0055) is outside the envelope
    bad = bytearray(mu)
    fmt_off = bad.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_off, 0x0055)
    with pytest.raises(NotImplementedError, match="0x0055"):
        decode_wav_compressed(bytes(bad))
    with pytest.raises(ValueError):
        decode_wav_compressed(b"RIFF\x00\x00\x00\x00AVI )")


def test_mp3_walk_closed_form_and_tag_skipping():
    from simple_data_engineering_project_spark.operators.mp3 import (
        encode_mp3_frames,
        walk_mp3,
    )

    # v1 L3 128 kbps / 44100: frame = 144*128000//44100 (+pad)
    m = walk_mp3(encode_mp3_frames(10, bitrate_idx=9, rate_idx=0))
    assert m == {
        "n_frames": 10, "total_samples": 11520, "sample_rate": 44100,
        "total_bytes": sum(417 + (1 - i % 2) for i in range(10)),
        "bitrates_kbps": [128],
    }
    # ID3v2 prefix + trailing ID3v1 are skipped; v2 frames are 576-sample
    m = walk_mp3(
        encode_mp3_frames(
            7, bitrate_idx=12, rate_idx=0, version=2, pad_every=0,
            id3v2_bytes=33, id3v1=True,
        )
    )
    assert (m["n_frames"], m["total_samples"], m["sample_rate"]) == (
        7, 7 * 576, 22050,
    )


def test_mp3_walk_rejects_desync_and_free_format():
    import pytest

    from simple_data_engineering_project_spark.operators.mp3 import (
        encode_mp3_frames,
        walk_mp3,
    )

    good = bytearray(encode_mp3_frames(4, bitrate_idx=9, rate_idx=0))
    good[0] = 0x00  # break the first sync
    with pytest.raises(ValueError, match="sync"):
        walk_mp3(bytes(good))
    with pytest.raises(ValueError, match="past end"):
        walk_mp3(encode_mp3_frames(4, bitrate_idx=9, rate_idx=0)[:-10])
    free = bytearray(encode_mp3_frames(1, bitrate_idx=9, rate_idx=0))
    free[2] &= 0x0F  # bitrate index -> 0 (free format)
    with pytest.raises(NotImplementedError, match="free-format"):
        walk_mp3(bytes(free))


def test_id3v2_all_versions_and_encodings():
    from simple_data_engineering_project_spark.operators.mp3 import (
        encode_id3v2,
        encode_mp3_frames,
        parse_id3v2,
        walk_mp3,
    )

    frames = [("TIT2", "Title héllo"), ("TPE1", "Artist"), ("TALB", "Al")]
    for major in (3, 4):  # plain vs syncsafe frame sizes
        for enc in (0, 1, 3):  # latin-1, utf-16+BOM, utf-8
            got = parse_id3v2(encode_id3v2(frames, major=major, encoding=enc))
            assert got == dict(frames), (major, enc)
    # the tag skip and the frame walk must agree on the audio start
    blob = encode_id3v2([("TIT2", "T")], major=4, encoding=3) + (
        encode_mp3_frames(5, bitrate_idx=9, rate_idx=0)
    )
    assert walk_mp3(blob)["n_frames"] == 5
    assert parse_id3v2(blob) == {"TIT2": "T"}
    # v2.4 FOOTER flag: 10 extra bytes not counted in the size field —
    # the walker must skip them too
    blob = encode_id3v2(
        [("TIT2", "T")], major=4, encoding=3, footer=True
    ) + encode_mp3_frames(3, bitrate_idx=9, rate_idx=0)
    assert walk_mp3(blob)["n_frames"] == 3
    assert parse_id3v2(blob) == {"TIT2": "T"}

    import pytest

    with pytest.raises(ValueError, match="ID3"):
        parse_id3v2(b"\xff\xfb no tag here")
    v22 = b"ID3\x02\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    with pytest.raises(NotImplementedError, match="ID3v2.2"):
        parse_id3v2(v22)


def test_mp3_mixed_layer_same_kbps_is_distinct():
    """bitrates_kbps is distinct at the KBPS level: a spec-legal
    mixed-layer stream whose layers map different header tuples to the
    same kbps (V1-L3 idx9 and V1-L2 idx8 are both 128) must report
    [128] once, not twice."""
    from simple_data_engineering_project_spark.operators.mp3 import (
        _frame_info,
        walk_mp3,
    )

    out = bytearray()
    for layer_bits, br_idx in ((0b01, 9), (0b10, 8)):  # L3@128, L2@128
        hdr = (
            (0x7FF << 21) | (0b11 << 19) | (layer_bits << 17)
            | (0b1 << 16) | (br_idx << 12) | (0 << 10) | (0 << 9)
        )
        length, _s, _r = _frame_info(hdr)
        out += hdr.to_bytes(4, "big") + bytes(length - 4)
    m = walk_mp3(bytes(out))
    assert m["n_frames"] == 2
    assert m["bitrates_kbps"] == [128]
