"""Tensor shard formats in pure stdlib (SURVEY §2 C3/C4).

Embedding dumps and model/activation shards overwhelmingly ship in two
formats this engine must ingest without their host libraries:

- **NumPy ``.npy`` / ``.npz``**: ``\\x93NUMPY`` magic + version +
  a length-prefixed Python-literal header dict ({'descr', 'fortran_order',
  'shape'}) + raw buffer. The header is parsed with
  ``ast.literal_eval`` (never ``eval``), the descr through an explicit
  dtype table (little-endian numerics + bools), and ``.npz`` is a zip
  of ``.npy`` members — read through :mod:`.zipshard`'s CRC-verified
  central-directory walk. Fortran order is honored by stride-swapping;
  tests cross-validate BOTH directions against numpy itself.

- **safetensors**: the modern weight-shard layout — 8-byte LE header
  length + a JSON header mapping tensor names to {dtype, shape,
  data_offsets [begin, end)} + one contiguous byte buffer. Offsets are
  validated (within buffer, end >= begin); the optional ``__metadata__``
  entry is surfaced. Dtypes F64/F32/F16/I64/I32/I16/I8/U8/BOOL decode
  (F16 via struct 'e'), and BF16 — the dominant dtype of real
  checkpoint shards — decodes/encodes explicitly: a bfloat16 is
  exactly the high half of a float32, so decode widens ``h << 16`` and
  encode rounds the dropped half to nearest-even (NaNs preserved).

Out of envelope (honest ``NotImplementedError``): pickled object
arrays (``.npy`` with dtype 'O' — a code-execution hazard refused by
design) and npy format v3 unicode headers beyond ASCII. (∅ in
reference; Tier C extension.)
"""

from __future__ import annotations

import ast
import json
import struct

_NPY_MAGIC = b"\x93NUMPY"

_DESCR = {
    "<f8": ("d", 8), "<f4": ("f", 4), "<i8": ("q", 8), "<i4": ("i", 4),
    "<i2": ("h", 2), "<u8": ("Q", 8), "<u4": ("I", 4), "<u2": ("H", 2),
    "|i1": ("b", 1), "|u1": ("B", 1), "|b1": ("?", 1), "<f2": ("e", 2),
}


def parse_npy(payload: bytes) -> tuple[tuple[int, ...], str, list]:
    """(shape, descr, flat values in C order) of one .npy buffer."""
    if payload[:6] != _NPY_MAGIC:
        raise ValueError("not an npy payload")
    major = payload[6]
    if major == 1:
        (hlen,) = struct.unpack_from("<H", payload, 8)
        at = 10
    elif major in (2, 3):
        (hlen,) = struct.unpack_from("<I", payload, 8)
        at = 12
    else:
        raise NotImplementedError(f"npy format version {major}")
    header = ast.literal_eval(payload[at : at + hlen].decode("ascii"))
    descr = header["descr"]
    if descr not in _DESCR:
        raise NotImplementedError(f"npy dtype {descr!r}")
    fmt, size = _DESCR[descr]
    shape = tuple(header["shape"])
    n = 1
    for s in shape:
        n *= s
    data_at = at + hlen
    vals = list(struct.unpack_from(f"<{n}{fmt}", payload, data_at))
    if header["fortran_order"] and len(shape) > 1:
        # transpose from column-major storage to C-order values
        out = [None] * n
        strides = [1] * len(shape)
        for i in range(1, len(shape)):  # F-order strides
            strides[i] = strides[i - 1] * shape[i - 1]
        idx = [0] * len(shape)
        for c in range(n):
            f = sum(i * s for i, s in zip(idx, strides))
            out[c] = vals[f]
            for d in range(len(shape) - 1, -1, -1):
                idx[d] += 1
                if idx[d] < shape[d]:
                    break
                idx[d] = 0
        vals = out
    return shape, descr, vals


def parse_npz(payload: bytes) -> dict[str, tuple[tuple[int, ...], str, list]]:
    """name (without .npy suffix) -> parse_npy result, via the zip
    central-directory walk."""
    from .zipshard import parse_zip

    out = {}
    for name, data in parse_zip(payload):
        key = name[:-4] if name.endswith(".npy") else name
        out[key] = parse_npy(data)
    return out


_ST_DTYPES = {
    "F64": ("d", 8), "F32": ("f", 4), "F16": ("e", 2),
    "I64": ("q", 8), "I32": ("i", 4), "I16": ("h", 2),
    "I8": ("b", 1), "U8": ("B", 1), "BOOL": ("?", 1),
    # BF16 has no struct letter: stored as u16, converted explicitly
    # (a bfloat16 is exactly the high half of a float32)
    "BF16": ("H", 2),
}


def _bf16_to_float(h: int) -> float:
    return struct.unpack("<f", struct.pack("<I", h << 16))[0]


def _float_to_bf16(v: float) -> int:
    (u,) = struct.unpack("<I", struct.pack("<f", v))
    if (u & 0x7F800000) == 0x7F800000 and (u & 0x007FFFFF):
        return (u >> 16) | 0x0040  # NaN: keep it a NaN after truncation
    # round-to-nearest-even on the dropped half, the checkpoint-writer
    # convention (plain truncation biases toward zero)
    return ((u + 0x7FFF + ((u >> 16) & 1)) >> 16) & 0xFFFF


def parse_safetensors(payload: bytes) -> tuple[dict, dict]:
    """(tensors: name -> {shape, dtype, values}, metadata dict)."""
    if len(payload) < 8:
        raise ValueError("not a safetensors payload")
    (hlen,) = struct.unpack_from("<Q", payload, 0)
    if hlen > len(payload) - 8:
        raise ValueError("safetensors header longer than file")
    header = json.loads(payload[8 : 8 + hlen].decode("utf-8"))
    buf_at = 8 + hlen
    buf_len = len(payload) - buf_at
    meta = header.pop("__metadata__", {})
    tensors = {}
    for name, spec in header.items():
        dtype = spec["dtype"]
        if dtype not in _ST_DTYPES:
            raise NotImplementedError(f"safetensors dtype {dtype}")
        fmt, size = _ST_DTYPES[dtype]
        b0, b1 = spec["data_offsets"]
        if not (0 <= b0 <= b1 <= buf_len):
            raise ValueError(f"safetensors offsets out of range: {name}")
        n = 1
        for s in spec["shape"]:
            n *= s
        if (b1 - b0) != n * size:
            raise ValueError(f"safetensors size mismatch: {name}")
        vals = list(struct.unpack_from(f"<{n}{fmt}", payload, buf_at + b0))
        if dtype == "BF16":
            vals = [_bf16_to_float(h) for h in vals]
        tensors[name] = {
            "shape": tuple(spec["shape"]),
            "dtype": dtype,
            "values": vals,
        }
    return tensors, meta


def encode_safetensors(
    tensors: dict[str, tuple[tuple[int, ...], str, list]],
    metadata: dict | None = None,
) -> bytes:
    """Write a conformant safetensors blob from name -> (shape, dtype,
    flat values)."""
    header: dict = {}
    buf = bytearray()
    for name in sorted(tensors):
        shape, dtype, vals = tensors[name]
        fmt, _size = _ST_DTYPES[dtype]
        if dtype == "BF16":
            vals = [_float_to_bf16(v) for v in vals]
        b0 = len(buf)
        buf += struct.pack(f"<{len(vals)}{fmt}", *vals)
        header[name] = {
            "dtype": dtype,
            "shape": list(shape),
            "data_offsets": [b0, len(buf)],
        }
    if metadata:
        header["__metadata__"] = metadata
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    return struct.pack("<Q", len(hjson)) + hjson + bytes(buf)
