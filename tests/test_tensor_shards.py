"""Tensor-shard pins: numpy cross-validation (every dtype, C/F order,
3-D, npz stored+deflated), object-array refusal, safetensors offset
validation and round trips."""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from simple_data_engineering_project_spark.operators.tensor_shards import (
    encode_safetensors,
    parse_npy,
    parse_npz,
    parse_safetensors,
)


@pytest.mark.parametrize(
    "dt",
    [np.float64, np.float32, np.float16, np.int64, np.int32, np.int16,
     np.uint8, np.bool_],
)
@pytest.mark.parametrize("order", ["C", "F"])
def test_npy_numpy_cross_validation(dt, order):
    a = (np.arange(24).reshape(4, 6) % 7).astype(dt)
    buf = io.BytesIO()
    np.save(buf, np.asarray(a, order=order))
    shape, _descr, vals = parse_npy(buf.getvalue())
    assert shape == (4, 6)
    assert vals == list(a.ravel(order="C").tolist())


def test_npy_3d_fortran_and_npz_both_codecs():
    a = np.arange(60, dtype=np.int32).reshape(3, 4, 5)
    buf = io.BytesIO()
    np.save(buf, np.asfortranarray(a))
    shape, _d, vals = parse_npy(buf.getvalue())
    assert shape == (3, 4, 5) and vals == list(a.ravel().tolist())

    for writer in (np.savez, np.savez_compressed):
        buf = io.BytesIO()
        writer(
            buf,
            emb=np.arange(12, dtype=np.float32).reshape(3, 4),
            ids=np.array([7, 8, 9]),
        )
        got = parse_npz(buf.getvalue())
        assert got["emb"][0] == (3, 4) and got["ids"][2] == [7, 8, 9]


def test_npy_object_arrays_refused():
    buf = io.BytesIO()
    np.save(buf, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(NotImplementedError, match="dtype"):
        parse_npy(buf.getvalue())
    with pytest.raises(ValueError):
        parse_npy(b"PK not an npy")


def test_safetensors_roundtrip_and_validation():
    blob = encode_safetensors(
        {
            "w": ((2, 3), "F32", [0.5, 1.5, 2.5, 3.5, 4.5, 5.5]),
            "b": ((3,), "I64", [1, -2, 3]),
            "h": ((4,), "F16", [0.5, 1.0, -2.0, 0.25]),
        },
        metadata={"format": "pt"},
    )
    t, m = parse_safetensors(blob)
    assert t["w"]["values"] == [0.5, 1.5, 2.5, 3.5, 4.5, 5.5]
    assert t["b"]["values"] == [1, -2, 3]
    assert t["h"]["values"] == [0.5, 1.0, -2.0, 0.25]
    assert m == {"format": "pt"} and t["w"]["shape"] == (2, 3)

    bad = bytearray(blob)
    bad[0:8] = (10**9).to_bytes(8, "little")  # header claims past EOF
    with pytest.raises(ValueError, match="header"):
        parse_safetensors(bytes(bad))

    # offsets past buffer end must be rejected, not sliced short
    hdr = {"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 16]}}
    import json

    hj = json.dumps(hdr).encode()
    short = struct.pack("<Q", len(hj)) + hj + b"\x00" * 8  # only 8 bytes
    with pytest.raises(ValueError, match="offsets|size"):
        parse_safetensors(short)


def test_safetensors_bf16_round_trip_and_anchors():
    """BF16 = high half of float32. Closed-form anchors pin the bit
    convention (not just enc/dec self-consistency), the rounding test
    pins round-to-nearest-even on the dropped half."""
    import math
    import struct

    from simple_data_engineering_project_spark.operators.tensor_shards import (
        _bf16_to_float,
        _float_to_bf16,
        encode_safetensors,
        parse_safetensors,
    )

    # decode anchors (public bfloat16 bit patterns)
    assert _bf16_to_float(0x3F80) == 1.0
    assert _bf16_to_float(0xC000) == -2.0
    assert _bf16_to_float(0x3FC0) == 1.5
    assert _bf16_to_float(0x0000) == 0.0
    assert _bf16_to_float(0x7F80) == math.inf
    assert math.isnan(_bf16_to_float(0x7FC0))
    # round-to-nearest-even: 0x3F808000 is the exact tie -> stays at
    # the even 0x3F80; one ulp above the tie rounds up
    assert _float_to_bf16(struct.unpack("<f", struct.pack("<I", 0x3F808000))[0]) == 0x3F80
    assert _float_to_bf16(struct.unpack("<f", struct.pack("<I", 0x3F808001))[0]) == 0x3F81
    assert _float_to_bf16(struct.unpack("<f", struct.pack("<I", 0x3F818000))[0]) == 0x3F82
    assert math.isnan(_bf16_to_float(_float_to_bf16(math.nan)))

    # file-level round trip with exactly-representable values
    vals = [1.0, -2.0, 1.5, 0.0, 3.140625, -0.4375]
    blob = encode_safetensors({"w": ((2, 3), "BF16", vals)})
    tensors, _meta = parse_safetensors(blob)
    assert tensors["w"]["dtype"] == "BF16"
    assert tensors["w"]["shape"] == (2, 3)
    assert tensors["w"]["values"] == vals
