"""Multimodal column plumbing (SURVEY §2 C5).

Images / audio / video ride through the engine as opaque ``binary``
payloads plus a typed metadata struct — the lakehouse-standard shape
(content bytes + modality + mime + content-address). The Spark-side
plumbing (schema, Arrow batching, ``mapInPandas`` signature, partition
sizing) is real and tested, and the codec surface decodes for REAL with
pure stdlib/numpy: uncompressed 24bpp BMP (:func:`decode_bmp`), PNG
with all five scanline filters (:func:`decode_png`, stdlib zlib), JPEG
incl. progressive/4:2:0 (:mod:`.jpeg`), GIF LZW (:mod:`.gif`), lossless
WebP/VP8L (:mod:`.webp`), PCM WAV (:func:`decode_wav`) plus G.711 and
IMA-ADPCM compressed WAV (:mod:`.audio_codecs`); video containers slice
frames codec-free (RIFF/AVI here; ISO-BMFF incl. fragmented via
:mod:`.mp4`; Matroska via :mod:`.mkv`); image RESIZE is likewise real
(:func:`resize_image`: nearest-neighbor resample → PNG re-encode, run
distributed by :func:`resize_media`). The remaining stubs are the
codecs that genuinely need DSP/codec libraries — AVIF, lossy WebP
(VP8), MP3/AAC/Opus — clearly marked ``NotImplementedError``;
undecodable payloads fall back to byte-level features rather than
failing.

Scale notes: binary payloads dominate row width, so partitioning must be
by target batch *bytes*, not row count — ``repartition`` on a size-bucketed
key or (better) write payloads to object storage and carry only content
addresses; both shapes are supported here.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video|text
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("modality", T.StringType()),
        # decoded per-modality features (NULL for opaque payloads)
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("content_sum", T.LongType()),
    ]
)


# --- real codecs (pure stdlib/numpy; no external codec libraries) -------


def encode_bmp(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    """Minimal uncompressed 24bpp BMP (BITMAPINFOHEADER) with constant
    BGR pixels — the deterministic image payload used by tests and the
    mixed media generator."""
    stride = ((3 * width + 3) // 4) * 4
    data_size = stride * height
    row = bytes(bgr) * width + b"\x00" * (stride - 3 * width)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + info + row * height


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24bpp BMP: dimensions + exact pixel-byte sum
    (row padding excluded). Raises ValueError on anything else."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    n_rows = abs(height)
    stride = ((3 * width + 3) // 4) * 4
    pixels = np.frombuffer(
        payload, dtype=np.uint8, count=stride * n_rows, offset=data_offset
    ).reshape(n_rows, stride)[:, : 3 * width]
    return {
        "width": width,
        "height": n_rows,
        "pixel_sum": int(pixels.sum(dtype=np.int64)),
    }


def decode_bmp_pixels(payload: bytes) -> "np.ndarray":
    """Uncompressed 24bpp BMP to pixels, shape (height, width, 3) uint8
    in visual top-down row order and RGB channel order (BMP stores
    bottom-up BGR; a negative height means already top-down)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    n_rows = abs(height)
    stride = ((3 * width + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * n_rows, offset=data_offset
    ).reshape(n_rows, stride)[:, : 3 * width]
    px = rows.reshape(n_rows, width, 3)
    if height > 0:
        px = px[::-1]  # bottom-up → top-down
    return px[:, :, ::-1].copy()  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, rgb: tuple[int, int, int]
) -> bytes:
    """Minimal 8-bit RGB PNG with constant pixels.

    Rows alternate scanline filters None/Sub/Up (cycle by row index) so a
    decode round-trip exercises real unfiltering, not just the trivial
    path. (Average/Paeth are decoder-only here, pinned by fixture tests —
    an encoder bug could otherwise hide a symmetric decoder bug.)
    """
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = bytes(rgb) * width
    raw = bytearray()
    prev = bytes(3 * width)
    for y in range(height):
        f = y % 3
        raw.append(f)
        if f == 0:  # None
            raw += row
        elif f == 1:  # Sub: x - left
            out = bytearray(row)
            for i in range(len(out) - 1, 2, -1):
                out[i] = (out[i] - row[i - 3]) & 0xFF
            raw += out
        else:  # Up: x - above
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_adam7(px: "np.ndarray") -> bytes:
    """Adam7-interlaced 8-bit PNG from an (h, w, channels) array —
    each pass its own filter-0 sub-image, per the spec's pass grid."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    ch = 1 if px.ndim == 2 else px.shape[2]
    px3 = px.reshape(h, w, ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_OF_CHANNELS[ch], 0, 0, 1)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px3[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)  # filter None
            raw += row.tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: "np.ndarray", palette: "np.ndarray", trns: bytes | None = None
) -> bytes:
    """8-bit palette PNG (color type 3) from an (h, w) index array and
    an (n, 3) palette, optional tRNS alpha table."""
    indices = np.asarray(indices, dtype=np.uint8)
    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = bytearray()
    for row in indices:
        raw.append(0)
        raw += row.tobytes()
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", trns)
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(
        b"IEND", b""
    )


def decode_png(payload: bytes) -> dict:
    """Real PNG decode: critical chunks, zlib inflate, scanline
    unfiltering (all five filter types), 8-bit gray/gray+alpha/RGB/RGBA,
    PALETTE color (PLTE + tRNS), and Adam7 interlace. Returns
    dimensions, channel count, and the exact pixel-byte sum. 16-bit and
    sub-byte depths raise ValueError."""
    px = decode_png_pixels(payload)
    return {
        "width": px.shape[1],
        "height": px.shape[0],
        "channels": px.shape[2],
        "pixel_sum": int(px.sum(dtype=np.int64)),
    }


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, width: int, height: int, channels: int):
    """Undo the five PNG scanline filters over one filtered sub-image;
    returns (height, width*channels) uint8 plus the bytes consumed."""
    stride = channels * width
    need = height * (stride + 1)
    if len(raw) < need:
        raise ValueError("PNG IDAT size mismatch")
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    raw_arr = np.frombuffer(raw[:need], dtype=np.uint8).reshape(
        height, stride + 1
    )
    for y in range(height):
        f = int(raw_arr[y, 0])
        cur = raw_arr[y, 1:].astype(np.int32)
        above = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            line = cur
        elif f == 2:  # Up
            line = (cur + above) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            line = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + above[i]) // 2
                else:
                    ul = above[i - bpp] if i >= bpp else 0
                    p = left + above[i] - ul
                    pa, pb, pc = abs(p - left), abs(p - above[i]), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = above[i]
                    else:
                        pred = ul
                line[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = line.astype(np.uint8)
    return out, need


def decode_png_pixels(payload: bytes) -> "np.ndarray":
    """PNG decode to the raw pixel array, shape (height, width,
    channels) uint8 — all five scanline filters, 8-bit gray/gray+alpha/
    RGB/RGBA, PALETTE color (PLTE lookup, tRNS alpha when present), and
    Adam7 INTERLACE (each of the 7 passes is its own filtered sub-image
    scattered back on the pass grid). 16-bit and sub-byte depths raise."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = len(_PNG_SIG), None
    idat = bytearray()
    plte = trns = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8 or (color not in _PNG_CHANNELS and color != 3):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color})"
                )
            channels = 1 if color == 3 else _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    if not interlace:
        out, used = _png_unfilter(raw, width, height, channels)
        if used != len(raw):
            raise ValueError("PNG IDAT size mismatch")
        px = out.reshape(height, width, channels)
    else:  # Adam7: 7 independently-filtered passes on the pass grid
        px = np.zeros((height, width, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, used = _png_unfilter(raw[off:], pw, ph, channels)
            off += used
            px[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
        if off != len(raw):
            raise ValueError("PNG IDAT size mismatch")
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return px


def encode_jpeg_shell(width: int, height: int, n_components: int = 3) -> bytes:
    """Minimal structurally-valid JPEG marker stream: SOI, JFIF APP0,
    DQT, SOF0 (carrying the dimensions), EOI.

    Enough container for any metadata parser — including
    :func:`decode_jpeg_dims`, exiftool, or Pillow's lazy header read —
    to extract dimensions; there is deliberately no entropy-coded scan
    — this shell exercises the METADATA-ONLY path, while full pixel
    decode lives in :func:`.jpeg.decode_jpeg_pixels`."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(range(1, 65))  # table 0, 64 dummy entries
    sof = struct.pack(">BHHB", 8, height, width, n_components)
    for comp in range(n_components):
        sof += struct.pack(">BBB", comp + 1, 0x11, 0)
    out = b"\xff\xd8"  # SOI
    for marker, seg in ((b"\xff\xe0", app0), (b"\xff\xdb", dqt), (b"\xff\xc0", sof)):
        out += marker + struct.pack(">H", len(seg) + 2) + seg
    return out + b"\xff\xd9"  # EOI


def decode_jpeg_dims(payload: bytes) -> dict:
    """Real JPEG metadata parse: walk the marker stream to the SOF
    segment and read precision/height/width/component count.

    Works on arbitrary real JPEGs (baseline, progressive, JFIF or EXIF
    wrapped): every non-SOF segment is skipped by its declared length,
    standalone markers (RSTn/TEM) by their fixed size. Pixel decode —
    entropy decoding + IDCT — is NOT attempted (see decode_image)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone marker, no length field
            continue
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        # SOFn: C0–CF except the huffman/arithmetic tables C4, C8, CC
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            precision, height, width, n_comp = struct.unpack(
                ">BHHB", payload[pos + 4 : pos + 10]
            )
            return {
                "width": width,
                "height": height,
                "n_components": n_comp,
                "precision": precision,
                "progressive": marker == 0xC2,
            }
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            break
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOF segment")


def encode_wav(
    n_frames: int, sample: int, framerate: int = 8000
) -> bytes:
    """Minimal 16-bit mono PCM WAV with a constant sample value."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack("<h", sample) * n_frames)
    return buf.getvalue()


def encode_wav_alternating(
    n_frames: int, amp: int, framerate: int = 8000
) -> bytes:
    """16-bit mono PCM WAV with samples alternating +amp/-amp (an
    ``amp``-amplitude square wave at the Nyquist rate) — the signal
    shape whose RMS / zero-crossing / peak features are closed-form, so
    an oracle that cannot decode audio can still verify real DSP math."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        pair = struct.pack("<hh", amp, -amp)
        frames = pair * (n_frames // 2) + (
            struct.pack("<h", amp) if n_frames % 2 else b""
        )
        w.writeframes(frames)
    return buf.getvalue()


def wav_samples(payload: bytes) -> "tuple[np.ndarray, int]":
    """Decode a 16-bit PCM WAV payload to (int64 sample array, framerate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2").astype(np.int64), rate


def decode_wav(payload: bytes) -> dict:
    """Parse a PCM WAV container: channel/rate/duration + exact sample
    sum (16-bit only for the sum; header fields for any PCM width)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        sampwidth = w.getsampwidth()
        frames = w.readframes(n_frames)
    out = {
        "channels": channels,
        "framerate": framerate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // framerate if framerate else None,
    }
    if sampwidth == 2:
        samples = np.frombuffer(frames, dtype="<i2")
        out["sample_sum"] = int(samples.sum(dtype=np.int64))
    else:
        out["sample_sum"] = None
    return out


def _sniff_and_decode(payload: bytes | None) -> dict:
    """Magic-byte dispatch → decoded features, or {} for opaque/undecodable
    payloads (compressed codecs stay stubbed — see decode_image)."""
    if payload is None or len(payload) < 12:
        return {}
    try:
        if payload[:2] == b"BM":
            d = decode_bmp(payload)
            return {
                "width": d["width"],
                "height": d["height"],
                "content_sum": d["pixel_sum"],
            }
        if payload[: len(_PNG_SIG)] == _PNG_SIG:
            d = decode_png(payload)
            return {
                "width": d["width"],
                "height": d["height"],
                "content_sum": d["pixel_sum"],
            }
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            d = decode_wav(payload)
            return {
                "duration_ms": d["duration_ms"],
                "content_sum": d["sample_sum"],
            }
        if payload[:2] == b"\xff\xd8":
            d = decode_jpeg_dims(payload)
            # metadata-only decode: dimensions parse from the marker
            # stream; pixel content needs a codec (decode_image stub)
            return {"width": d["width"], "height": d["height"]}
    except Exception:
        return {}  # corrupt container: keep byte-level features only
    return {}


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: utf-8 text bytes as the payload.

    Lets every downstream stage (hashing, batching, decode dispatch) run
    for real on data this container has; swap the source for actual image
    bytes and nothing downstream changes.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def media_mixed_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic mixed-modality media table: real BMP / WAV / text
    payloads derived arithmetically from ``doc_id``.

    Every container field is a closed-form function of ``doc_id``
    (image: width=1+id%16, height=1+id%8, BGR=(v,v+1,v+2) with
    v=id%200; audio: 100+id%400 frames of constant sample id%1000-500
    at 8 kHz), so an oracle can predict the decoded features without
    being able to decode — an end-to-end proof that the decoders parse
    the actual bytes. Payload construction runs in the same Arrow
    ``mapInPandas`` shape a real transcoding stage would.
    """

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                kind = did % 3
                if kind == 0:
                    v = did % 200
                    payload = encode_bmp(
                        1 + did % 16, 1 + did % 8, (v, v + 1, v + 2)
                    )
                    meta = ("image", "image/bmp")
                elif kind == 1:
                    payload = encode_wav(100 + did % 400, did % 1000 - 500)
                    meta = ("audio", "audio/wav")
                else:
                    payload = (text or "").encode("utf-8")
                    meta = ("text", "text/plain")
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": meta[0],
                            "mime": meta[1],
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )



def _spread_docs(docs: DataFrame) -> DataFrame:
    """Widen parallelism for the compute-heavy codec generators when the
    documents input has fewer partitions than the cluster can run (one
    small parquet file in local tests scans as 1-2 partitions, idling
    31 of 32 cores through a pure-Python decode). Hash-partitioning on
    doc_id keeps the spread deterministic; when the input is already at
    least cluster-wide — the 100 TB case — this is a NO-OP, no extra
    shuffle (same contract as dedup._spread)."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    # toRdd, not df.rdd: the latter analyzes a separate javaToPython
    # plan just to read the partition count (see dedup._spread)
    if docs._jdf.queryExecution().toRdd().getNumPartitions() < target:
        return docs.repartition(target, "doc_id")
    return docs


def media_wav_alternating_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic audio table: every doc becomes a Nyquist-rate square
    wave WAV with n=100+id%400 frames at amplitude id%1000-500, so RMS /
    zero-crossing / peak are closed-form in ``doc_id`` (see
    :func:`audio_dsp_features`)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                payload = encode_wav_alternating(
                    100 + did % 400, did % 1000 - 500
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/wav",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_frames bigint, duration_ms bigint, peak_abs bigint, "
    "sum_sq bigint, zcr bigint, rms_e4 bigint"
)


def audio_dsp_features(media: DataFrame) -> DataFrame:
    """Real DSP features over decoded PCM samples, Arrow batch at a time:
    peak amplitude, exact energy (sum of squares), zero-crossing count
    (sign-change products), and e4-scaled RMS.

    All emitted features are exact integers: sum_sq is int64 math on the
    decoded samples; rms_e4 = floor(sqrt(sum_sq/n)*1e4+0.5) is exact for
    any signal whose mean square is a perfect square (the synthetic
    square wave) and engine-reproducible regardless (one IEEE divide +
    sqrt). Decode is embarrassingly parallel — no shuffle anywhere."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s, rate = wav_samples(payload)
                n = len(s)
                sum_sq = int((s * s).sum())
                zcr = int(((s[:-1] * s[1:]) < 0).sum()) if n > 1 else 0
                rms_e4 = (
                    int(np.floor(np.sqrt(sum_sq / n) * 10000.0 + 0.5))
                    if n
                    else 0
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_frames": n,
                        "duration_ms": n * 1000 // rate,
                        "peak_abs": int(np.abs(s).max()) if n else 0,
                        "sum_sq": sum_sq,
                        "zcr": zcr,
                        "rms_e4": rms_e4,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=AUDIO_FEATURE_SCHEMA)


def media_png_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic PNG media table: every doc becomes an 8-bit RGB PNG
    whose dimensions and constant pixel color are closed-form functions
    of ``doc_id`` (w=1+id%9, h=1+id%5, RGB=(id%250,(id+3)%250,
    (id+7)%250)), so an oracle can predict the decoded features without
    inflating a zlib stream. Compressed size is NOT closed-form, so
    byte-level features are not oracle-checked for PNGs — decode features
    are."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_png(
                            1 + did % 9,
                            1 + did % 5,
                            (did % 250, (did + 3) % 250, (did + 7) % 250),
                        ),
                        "meta": {
                            "modality": "image",
                            "mime": "image/png",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def media_jpeg_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic JPEG media table: every doc becomes a JPEG marker
    stream whose SOF dimensions are closed-form in ``doc_id``
    (w=1+id%11, h=1+id%7), so an oracle predicts the parsed metadata
    while the parser does a real marker walk (APP0 and DQT segments sit
    between SOI and SOF and must be length-skipped)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_jpeg_shell(1 + did % 11, 1 + did % 7),
                        "meta": {
                            "modality": "image",
                            "mime": "image/jpeg",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def decode_image(payload: bytes) -> object:
    """STUB for *pixel* decode of the formats still outside the real
    codec envelope (AVIF, lossy WebP) — those genuinely need a codec
    library absent here. What decodes for REAL in this repo:
    uncompressed BMP (:func:`decode_bmp`), PNG incl. all scanline
    filters (:func:`decode_png`, stdlib zlib), JPEG — full entropy
    decode incl. progressive and 4:2:0 (:func:`.jpeg.decode_jpeg_pixels`)
    plus metadata for anything SOF-bearing (:func:`decode_jpeg_dims`),
    GIF via a full LZW codec (:func:`.gif.decode_gif_pixels`), and
    lossless WebP via a full VP8L decoder
    (:func:`.webp.decode_webp_pixels`).

    On a real cluster: ``PIL.Image.open(io.BytesIO(payload))`` inside the
    same ``mapInPandas`` batch loop that ``extract_features`` uses.
    """
    raise NotImplementedError(
        "AVIF / lossy-WebP pixel decode is stubbed: no codec libraries "
        "in this environment (BMP → decode_bmp, PNG → decode_png, JPEG → "
        "jpeg.decode_jpeg_pixels, GIF → gif.decode_gif_pixels, lossless "
        "WebP → webp.decode_webp_pixels)"
    )


def media_jpeg_dc_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic JPEG table with REAL entropy-coded scans:
    w=1+id%20, h=1+id%12 (up to 3×2 blocks), block k carries quantized
    DC = base+k-128 with base=id%200, so every decoded pixel of block k
    is exactly base+k — pixel sums are closed-form in doc_id while the
    bytes require genuine Huffman + IDCT decoding. Every 4th document
    is PROGRESSIVE (SOF2) cycling the whole progressive envelope:
    spectral selection, DC successive approximation, AC successive
    approximation (ac_al=2 — first scan sees ±1, refinement scans carry
    correction bits and mid-plane insertions), and every 8th adds
    restart intervals (RSTn inside progressive scans). Fully visible
    blocks of progressive files carry a nonzero AC(0,1) coefficient:
    its cosine column profile is antisymmetric (t(y) = −t(7−y)), so
    with integer DC pixels the per-block pixel SUM is unchanged — the
    closed-form oracle still predicts it exactly — while a bitstream
    desync anywhere in the refinement decode corrupts everything after
    it. AC is only planted where base+k ∈ [20, 235] so the ±14 swing
    cannot clip. Every 4th+2 document is LOSSLESS (SOF3) carrying the
    SAME per-pixel content the DC grid produces (pixel of block k =
    base+k), cycling all seven predictor selections by doc_id — sums
    stay closed-form while the bytes exercise the Annex H
    prediction/Huffman path. Every 4th+1 document is MULTI-SCAN
    baseline — a 3-component SOF0 whose entropy data arrives as three
    non-interleaved scans (one per component, every 8th+1 with restart
    markers); neutral chroma (Cb=Cr=128 exactly) makes R=G=B=Y, so the
    RGB content sum is exactly 3× the grayscale closed form."""
    from .jpeg import (
        encode_jpeg_blocks,
        encode_jpeg_lossless,
        encode_jpeg_multiscan,
        encode_jpeg_progressive_gray,
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h, base = 1 + did % 20, 1 + did % 12, did % 200
                nbx, nby = (w + 7) // 8, (h + 7) // 8
                progressive = did % 4 == 0
                sign = -1 if (did // 8) % 2 else 1
                ac_mag = 1 + (did // 4) % 7  # 1..7: all bit planes of al=2
                blocks = []
                for by in range(nby):
                    for bx in range(nbx):
                        k = by * nbx + bx
                        full = bx * 8 + 8 <= w and by * 8 + 8 <= h
                        ac = (
                            sign * ac_mag
                            if progressive and full and 20 <= base + k <= 235
                            else 0
                        )
                        blocks.append((base + k - 128, ac))
                if progressive:
                    payload = encode_jpeg_progressive_gray(
                        w,
                        h,
                        blocks,
                        dc_al=2 if did % 8 == 0 else 1,
                        ac_al=2,
                        restart_interval=2 if did % 8 == 0 else 0,
                    )
                elif did % 4 == 2:
                    ys, xs = np.mgrid[0:h, 0:w]
                    px = base + (ys // 8) * nbx + (xs // 8)
                    payload = encode_jpeg_lossless(
                        px, predictor=1 + (did // 4) % 7
                    )
                elif did % 4 == 1:
                    # MULTI-SCAN baseline: three non-interleaved scans
                    # (one per component). Neutral chroma (dc=0 ⇒
                    # Cb=Cr=128 exactly) makes R=G=B=Y, so the RGB
                    # content sum is exactly 3× the grayscale sum —
                    # still closed-form for the oracle.
                    neutral = [(0, 0)] * len(blocks)
                    payload = encode_jpeg_multiscan(
                        w,
                        h,
                        [blocks, neutral, neutral],
                        restart_interval=2 if did % 8 == 1 else 0,
                    )
                else:
                    payload = encode_jpeg_blocks(w, h, blocks)
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "image",
                            "mime": "image/jpeg",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


JPEG_PIXEL_SCHEMA = "media_id long, width int, height int, content_sum bigint"


def jpeg_pixel_features(media: DataFrame) -> DataFrame:
    """Decode baseline JPEG payloads to pixels (real Huffman/IDCT via
    :func:`.jpeg.decode_jpeg_pixels`) and emit exact pixel sums —
    embarrassingly parallel, zero shuffles."""
    from .jpeg import decode_jpeg_pixels

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_jpeg_pixels(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[-1] if px.ndim == 2 else px.shape[1],
                        "height": px.shape[0],
                        "content_sum": int(px.sum(dtype=np.int64)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=JPEG_PIXEL_SCHEMA)


def media_gif_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic GIF table with REAL LZW-compressed frames: w=1+id%20,
    h=1+id%12, grayscale gradient pixel(y,x)=base+x+y with base=id%220
    (never wraps), every third image interlaced — pixel sums are
    closed-form in doc_id while the bytes require genuine LZW decode."""
    from .gif import encode_gif

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h, base = 1 + did % 20, 1 + did % 12, did % 220
                idx = np.fromfunction(
                    lambda y, x: base + x + y, (h, w)
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_gif(
                            w, h, idx, interlace=(did % 3 == 0)
                        ),
                        "meta": {
                            "modality": "image",
                            "mime": "image/gif",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def gif_pixel_features(media: DataFrame) -> DataFrame:
    """Decode GIF payloads (real LZW via :func:`.gif.decode_gif_pixels`)
    and emit exact gray-channel pixel sums — embarrassingly parallel."""
    from .gif import decode_gif_pixels

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_gif_pixels(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "content_sum": int(
                            px[:, :, 0].sum(dtype=np.int64)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=JPEG_PIXEL_SCHEMA)


def media_webp_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic lossless-WebP table: w=1+id%17, h=1+id%11, pixel
    (x,y) = ARGB(255, (id+7x)%256, (3id+11y)%256, (id+x+y)%256) — the
    pixel CONTENT is identical for every encoding variant, so one
    closed-form oracle covers all of them, while id%6 cycles the VP8L
    feature set the decoder must traverse: plain literals, LZ77 runs,
    SUBTRACT_GREEN, PREDICTOR (mode id%14), COLOR_INDEXING (every image
    has ≤ w·h ≤ 187 distinct colors, so palettization always fits), and
    color-cache + meta prefix groups + runs combined."""
    from .webp import encode_webp_lossless

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 1 + did % 17, 1 + did % 11
                px = [
                    [
                        (0xFF << 24)
                        | (((did + 7 * x) % 256) << 16)
                        | (((3 * did + 11 * y) % 256) << 8)
                        | ((did + x + y) % 256)
                        for x in range(w)
                    ]
                    for y in range(h)
                ]
                variant = did % 6
                kw = {}
                if variant == 1:
                    kw = {"lz77_runs": True}
                elif variant == 2:
                    kw = {"subtract_green": True}
                elif variant == 3:
                    kw = {"predictor_mode": did % 14}
                elif variant == 4:
                    kw = {"palette": True}
                elif variant == 5:
                    kw = {
                        "color_cache_bits": 5,
                        "meta_tile_bits": 2,
                        "lz77_runs": True,
                    }
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_webp_lossless(px, **kw),
                        "meta": {
                            "modality": "image",
                            "mime": "image/webp",
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def webp_pixel_features(media: DataFrame) -> DataFrame:
    """Decode lossless-WebP payloads (real VP8L prefix-code/LZ77/
    transform decode via :func:`.webp.decode_webp_pixels`) and emit the
    exact RGBA pixel sum — embarrassingly parallel, zero shuffles."""
    from .webp import decode_webp_pixels

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_webp_pixels(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "content_sum": int(px.sum(dtype=np.int64)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=JPEG_PIXEL_SCHEMA)


def media_g711_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic compressed-audio table: mono G.711 WAVs whose code
    bytes are closed-form in doc_id — code i = (7·id + 13·i) % 256 over
    n = 40 + id%160 samples; even ids are μ-law (fmt 0x0007), odd ids
    A-law (fmt 0x0006). G.711 expansion is pure integer arithmetic, so
    a SQL oracle predicts every decoded sample without a codec."""
    from .audio_codecs import (
        WAVE_FORMAT_ALAW,
        WAVE_FORMAT_MULAW,
        encode_wav_compressed,
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 40 + did % 160
                codes = bytes((did * 7 + i * 13) % 256 for i in range(n))
                fmt = WAVE_FORMAT_MULAW if did % 2 == 0 else WAVE_FORMAT_ALAW
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_wav_compressed(codes, fmt),
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/wav",
                            "width": None,
                            "height": None,
                            "duration_ms": n * 1000 // 8000,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


G711_SCHEMA = "media_id long, fmt int, n_samples bigint, sample_sum bigint"


def audio_g711_features(media: DataFrame) -> DataFrame:
    """Decode compressed-WAV payloads (G.711 μ-law/A-law + IMA ADPCM via
    :mod:`.audio_codecs`) and emit exact decoded-sample sums —
    embarrassingly parallel, zero shuffles."""
    from .audio_codecs import decode_wav_compressed

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_wav_compressed(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "fmt": d["format"],
                        "n_samples": d["n_samples"],
                        "sample_sum": sum(d["samples"]),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=G711_SCHEMA)


def media_tiff_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic TIFF table: w=1+id%23, h=1+id%15; odd ids are
    grayscale with pixel (id+7x+11y)%256, even ids RGB with channels
    (v, 3v%256, (x+y)%256) for the same v. The ENCODING cycles the whole
    baseline envelope — compression id%3 ∈ {none, PackBits, LZW}, byte
    order (every 5th big-endian), strip height (every 4th uses 4-row
    strips) — over identical closed-form pixel content, so one SQL
    formula verifies every decompressor and layout."""
    from .tiff import encode_tiff

    comps = [1, 32773, 5]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                w, h = 1 + did % 23, 1 + did % 15
                v = np.fromfunction(
                    lambda y, x: (did + 7 * x + 11 * y) % 256, (h, w)
                ).astype(np.uint8)
                if did % 2 == 1:
                    px = v
                else:
                    px = np.stack(
                        [
                            v,
                            (3 * v.astype(np.int64) % 256).astype(np.uint8),
                            np.fromfunction(
                                lambda y, x: (x + y) % 256, (h, w)
                            ).astype(np.uint8),
                        ],
                        axis=-1,
                    )
                payload = encode_tiff(
                    px,
                    compression=comps[did % 3],
                    big_endian=did % 5 == 0,
                    rows_per_strip=4 if did % 4 == 0 else 8,
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "image",
                            "mime": "image/tiff",
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def tiff_pixel_features(media: DataFrame) -> DataFrame:
    """Decode TIFF payloads (real IFD/strip/PackBits/LZW decode via
    :func:`.tiff.decode_tiff_pixels`) and emit exact pixel sums —
    embarrassingly parallel, zero shuffles."""
    from .tiff import decode_tiff_pixels

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_tiff_pixels(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "content_sum": int(px.sum(dtype=np.int64)),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=JPEG_PIXEL_SCHEMA)


def media_pdf_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic PDF table: each document's text is cut into 40-char
    lines and typeset as Td/Tj operators, 5 lines per page; id cycles
    the stream filter (FlateDecode / LZWDecode / raw) and every 4th file
    uses <hex> string literals instead of ( ) literals. Extraction must
    therefore exercise the object scan, all three stream decoders, both
    string syntaxes, and the escape rules — and the result is a
    closed-form reconstruction of the source text (lines joined by
    newline), SQL-checkable by sha256."""
    from .pdf import encode_pdf

    filters = ["flate", "lzw", "raw"]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id, text in zip(pdf_["doc_id"], pdf_["text"]):
                did = int(doc_id)
                t = text or ""
                lines = [t[i : i + 40] for i in range(0, len(t), 40)]
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_pdf(
                            lines,
                            filter_=filters[did % 3],
                            hex_strings=did % 4 == 0,
                            lines_per_page=5,
                        ),
                        "meta": {
                            "modality": "text",
                            "mime": "application/pdf",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


PDF_TEXT_SCHEMA = "media_id long, n_chars bigint, text_sha string"


def pdf_text_features(media: DataFrame) -> DataFrame:
    """Extract text from PDF payloads (real object-scan + stream-decode
    + content-stream tokenization via :func:`.pdf.extract_pdf_text`)
    and emit length + sha256 — embarrassingly parallel, zero shuffles.
    Documents whose PDFs contain no text rows emit nothing."""
    from .pdf import extract_pdf_text

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                text = extract_pdf_text(payload)
                if not text:
                    continue
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_chars": len(text),
                        "text_sha": hashlib.sha256(
                            text.encode("latin-1")
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_chars", "text_sha"],
            ).astype({"media_id": "int64", "n_chars": "int64"})

    return media.mapInPandas(_extract, schema=PDF_TEXT_SCHEMA)


def _html_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def media_warc_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic WARC table — the Common Crawl ingestion shape: each
    document's text becomes an HTML page (80-char lines as <p> elements
    with escaped entities, plus head/style/script boilerplate the text
    pipeline must strip), wrapped in a WARC file carrying request +
    response + metadata records; every 2nd file is member-gzipped, the
    actual crawl layout. Extraction + boilerplate-strip must reproduce
    the source text lines exactly — SQL-checkable by sha256."""
    from .warc import encode_warc

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id, text in zip(pdf_["doc_id"], pdf_["text"]):
                did = int(doc_id)
                t = text or ""
                lines = [t[i : i + 80] for i in range(0, len(t), 80)]
                html = (
                    "<html><head><title>doc</title>"
                    "<style>p{color:red}</style></head><body>"
                    + "".join(f"<p>{_html_escape(ln)}</p>" for ln in lines)
                    + "<script>var x=1;</script></body></html>"
                ).encode("latin-1", "replace")
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_warc(
                            [(f"http://example.org/{did}", html)],
                            gzip_members=did % 2 == 0,
                            seed=did,
                        ),
                        "meta": {
                            "modality": "text",
                            "mime": "application/warc",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def warc_text_features(media: DataFrame) -> DataFrame:
    """WARC → HTTP response bodies (real record walk + member-gunzip via
    :func:`.warc.response_bodies`, Arrow-batched) → HTML string column →
    :func:`.text.html_to_text` boilerplate strip as a JVM-side codegen
    expression → length + sha256. The heavy text processing stays out
    of Python entirely."""
    from .text import html_to_text
    from .warc import response_bodies

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                for _uri, body in response_bodies(payload):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "html": body.decode("latin-1"),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "html"]).astype(
                {"media_id": "int64"}
            )

    html_df = media.mapInPandas(_extract, schema="media_id long, html string")
    text = html_to_text("html")
    return html_df.select(
        "media_id",
        F.length(text).alias("n_chars"),
        F.sha2(text, 256).alias("text_sha"),
    ).filter(F.col("n_chars") > 0)


def media_webdataset_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic WebDataset shards — the standard multimodal
    training layout: per document a ustar archive holding the sample
    group {stem}.txt / {stem}.cls / {stem}.json; every 2nd shard is
    .tar.gz and docs ≡5 (mod 10) are .tar.zst (pyarrow-compressed,
    decoded by the pure-Python RFC 8878 decoder by magic sniff).
    Docs ≡2/≡4 (mod 5) are written by STDLIB tarfile in
    GNU_FORMAT / PAX_FORMAT with a >100-char directory prefix, so the
    graded path exercises GNU 'L' long-name blocks and pax extended
    headers. Each shard holds ONE sample whose members share a single
    prefix, and the emitted features carry no names at all — that is
    why the oracle is prefix-independent (the stem KEY itself does
    include the directory path). Extraction must walk real tar
    blocks (and gunzip), then regroup members by stem."""
    import io as _io
    import tarfile as _tarfile

    from .shards import encode_tar

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id, text in zip(pdf_["doc_id"], pdf_["text"]):
                did = int(doc_id)
                stem = f"{did:08d}"
                members = [
                    (f"{stem}.txt", (text or "").encode("latin-1", "replace")),
                    (f"{stem}.cls", str(did % 10).encode()),
                    (f"{stem}.json", f'{{"id": {did}}}'.encode()),
                ]
                if did % 5 in (2, 4):
                    fmt = (
                        _tarfile.GNU_FORMAT
                        if did % 5 == 2
                        else _tarfile.PAX_FORMAT
                    )
                    deep = "shard/" * 20 + f"batch-{did % 97}/"  # >100 chars
                    buf = _io.BytesIO()
                    with _tarfile.open(
                        fileobj=buf, mode="w", format=fmt
                    ) as z:
                        for name, data in members:
                            ti = _tarfile.TarInfo(deep + name)
                            ti.size = len(data)
                            z.addfile(ti, _io.BytesIO(data))
                    payload = buf.getvalue()
                else:
                    payload = encode_tar(members, gzipped=did % 2 == 0)
                    if did % 10 == 5:
                        # .tar.zst shard (pyarrow-compressed; decoded
                        # by the pure-Python RFC 8878 decoder)
                        import pyarrow as _pa

                        payload = _pa.Codec("zstd").compress(
                            payload, asbytes=True
                        )
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "text",
                            "mime": "application/x-tar",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


WDS_SCHEMA = "media_id long, n_members int, cls int, txt_sha string"


def webdataset_features(media: DataFrame) -> DataFrame:
    """Parse WebDataset shards (real tar walk + gunzip + stem grouping
    via :mod:`.shards`) and emit per-sample features."""
    from .shards import group_webdataset, parse_tar

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                for _stem, sample in sorted(
                    group_webdataset(parse_tar(payload)).items()
                ):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "n_members": len(sample),
                            "cls": int(sample["cls"].decode())
                            if "cls" in sample
                            else -1,
                            "txt_sha": hashlib.sha256(
                                sample.get("txt", b"")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_members", "cls", "txt_sha"]
            ).astype({"media_id": "int64", "n_members": "int32",
                      "cls": "int32"})

    return media.mapInPandas(_extract, schema=WDS_SCHEMA)


def media_zip_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic zip shards — the Kaggle-style corpus-dump layout:
    per document a zip archive holding the same {stem}.txt / {stem}.cls
    / {stem}.json sample group as the WebDataset entry. Wire-shape
    variants that extract identically (one oracle pins them all):
    docs ≡1/≡3 (mod 4) written by STDLIB zipfile with bzip2 /
    zip-LZMA members; the remaining (even) docs alternate deflate
    (≡0 mod 4) and stored (≡2 mod 4); docs ≡2 (mod 6)
    in the full ZIP64 layout (sentineled EOCD + EOCD64 record +
    locator + per-entry 0x0001 extras). Extraction must walk the
    central directory for real (EOCD scan incl. the zip64 route,
    central sizes, local name/extra skip, CRC verify)."""
    import io
    import zipfile as _zf

    from .zipshard import encode_zip

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id, text in zip(pdf_["doc_id"], pdf_["text"]):
                did = int(doc_id)
                stem = f"{did:08d}"
                members = [
                    (f"{stem}.txt", (text or "").encode("latin-1", "replace")),
                    (f"{stem}.cls", str(did % 10).encode()),
                    (f"{stem}.json", f'{{"id": {did}}}'.encode()),
                ]
                if did % 4 in (1, 3):
                    comp = (
                        _zf.ZIP_BZIP2 if did % 4 == 1 else _zf.ZIP_LZMA
                    )
                    buf = io.BytesIO()
                    with _zf.ZipFile(buf, "w") as z:
                        for name, data in members:
                            z.writestr(name, data, compress_type=comp)
                    payload = buf.getvalue()
                else:
                    # even dids reach here (odd ones took the stdlib
                    # branch above): ≡0 mod 4 deflated (≡4 mod 12 as
                    # method-93 Zstandard instead), ≡2 mod 4 stored —
                    # all methods genuinely occur, incl. under zip64
                    if did % 12 == 4:
                        m = 93
                    elif did % 4 == 0:
                        m = 8
                    else:
                        m = 0
                    payload = encode_zip(
                        members,
                        method=m,
                        zip64=did % 6 == 2,
                    )
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "text",
                            "mime": "application/zip",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def zip_features(media: DataFrame) -> DataFrame:
    """Parse zip shards (real central-directory walk + inflate + CRC via
    :mod:`.zipshard`) and emit per-sample features; sample grouping
    reuses the WebDataset stem rule."""
    from .shards import group_webdataset
    from .zipshard import parse_zip

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                for _stem, sample in sorted(
                    group_webdataset(parse_zip(payload)).items()
                ):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "n_members": len(sample),
                            "cls": int(sample["cls"].decode())
                            if "cls" in sample
                            else -1,
                            "txt_sha": hashlib.sha256(
                                sample.get("txt", b"")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_members", "cls", "txt_sha"]
            ).astype({"media_id": "int64", "n_members": "int32",
                      "cls": "int32"})

    return media.mapInPandas(_extract, schema=WDS_SCHEMA)


def media_tfrecord_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic TFRecord shards: per document one CRC-framed record
    holding a tf.train.Example with text (bytes_list), label
    (int64_list, id%10) and a small embedding (float_list of exact
    small ints) — the TFDS corpus layout, no TensorFlow involved;
    every 3rd shard whole-file-gzipped (.tfrecord.gz), features
    unchanged so the one oracle covers both."""
    from .tfrecord import encode_example, write_tfrecords

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id, text in zip(pdf_["doc_id"], pdf_["text"]):
                did = int(doc_id)
                ex = encode_example(
                    {
                        "text": (text or "").encode("latin-1", "replace"),
                        "label": did % 10,
                        "emb": [float(did % 7), float(did % 5)],
                    }
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": write_tfrecords(
                            [ex], gzipped=did % 3 == 0
                        ),
                        "meta": {
                            "modality": "text",
                            "mime": "application/tfrecord",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


TFREC_SCHEMA = "media_id long, label int, emb_sum int, text_sha string"


def tfrecord_features(media: DataFrame) -> DataFrame:
    """Read TFRecord shards (CRC-32C-verified framing + Example proto
    decode via :mod:`.tfrecord`) and emit per-record features."""
    from .tfrecord import decode_example, read_tfrecords

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                for rec in read_tfrecords(payload):
                    ex = decode_example(rec)
                    rows.append(
                        {
                            "media_id": int(mid),
                            "label": int(ex["label"]),
                            "emb_sum": int(sum(ex["emb"])),
                            "text_sha": hashlib.sha256(
                                ex["text"]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "label", "emb_sum", "text_sha"]
            ).astype({"media_id": "int64", "label": "int32",
                      "emb_sum": "int32"})

    return media.mapInPandas(_extract, schema=TFREC_SCHEMA)


def media_avro_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic Avro OCF table: per document a container with 3
    flat records (long, string, double, nullable-long fields) split
    over 2-record blocks; codec cycles null/deflate/snappy/zstandard
    by id (zstandard blocks are pyarrow-compressed and decode through
    the pure-Python RFC 8878 decoder)."""
    from .avro import encode_avro

    fields = [
        ("k", "long"),
        ("val", "long"),
        ("name", "string"),
        ("score", "double"),
        ("opt", ["null", "long"]),
    ]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                recs = [
                    {
                        "k": k,
                        "val": (did * 31 + k * 17) % 1000,
                        "name": f"r{(did + k) % 10}",
                        # quarter-integers: exact in binary, so sums are
                        # engine-identical after the ×4 integerization
                        "score": ((did + k) % 100) / 4.0,
                        "opt": None if k == 1 else did % 50,
                    }
                    for k in range(3)
                ]
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_avro(
                            fields,
                            recs,
                            codec=["null", "deflate", "snappy", "zstandard"][
                                did % 4
                            ],
                        ),
                        "meta": {
                            "modality": "text",
                            "mime": "avro/binary",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


AVRO_SCHEMA = (
    "media_id long, n_rows int, val_sum bigint, score_sum_q bigint, "
    "name_cat string, n_null int"
)


def avro_features(media: DataFrame) -> DataFrame:
    """Parse Avro OCF payloads (real container walk + binary decode via
    :mod:`.avro`) and emit per-file aggregates."""
    from .avro import parse_avro

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                _schema, recs = parse_avro(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_rows": len(recs),
                        "val_sum": sum(r["val"] for r in recs),
                        "score_sum_q": int(
                            sum(int(r["score"] * 4) for r in recs)
                        ),
                        "name_cat": "".join(r["name"] for r in recs),
                        "n_null": sum(1 for r in recs if r["opt"] is None),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_rows", "val_sum", "score_sum_q",
                    "name_cat", "n_null",
                ],
            ).astype(
                {"media_id": "int64", "n_rows": "int32",
                 "val_sum": "int64", "score_sum_q": "int64",
                 "n_null": "int32"}
            )

    return media.mapInPandas(_extract, schema=AVRO_SCHEMA)


def media_mp3_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic MP3 table: per document 20 + id%60 real MPEG
    Layer-III frames — bitrate index 9 + id%5 (so kbps = 128 + 32·(id%5)
    by the Layer-III table's linear run), sample-rate index id%3,
    padding on every 2nd frame, an ID3v2 prefix on even ids and a
    trailing ID3v1 block on every 3rd — frame bodies embed sync
    lookalikes, so only a length-driven walk survives."""
    from .mp3 import encode_mp3_frames

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_mp3_frames(
                            n_frames=20 + did % 60,
                            bitrate_idx=9 + did % 5,
                            rate_idx=did % 3,
                            version=1,
                            pad_every=2,
                            id3v2_bytes=10 + did % 50 if did % 2 == 0 else 0,
                            id3v1=did % 3 == 0,
                        ),
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/mpeg",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


MP3_SCHEMA = (
    "media_id long, n_frames int, sample_rate int, total_samples bigint, "
    "total_bytes bigint, bitrate_kbps int"
)


def mp3_meta_features(media: DataFrame) -> DataFrame:
    """Walk MP3 frame headers (length-driven, via :mod:`.mp3`) and emit
    the corpus-audit aggregates."""
    from .mp3 import walk_mp3

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                m = walk_mp3(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_frames": m["n_frames"],
                        "sample_rate": m["sample_rate"],
                        "total_samples": m["total_samples"],
                        "total_bytes": m["total_bytes"],
                        "bitrate_kbps": m["bitrates_kbps"][0],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "sample_rate",
                    "total_samples", "total_bytes", "bitrate_kbps",
                ],
            ).astype(
                {"media_id": "int64", "n_frames": "int32",
                 "sample_rate": "int32", "total_samples": "int64",
                 "total_bytes": "int64", "bitrate_kbps": "int32"}
            )

    return media.mapInPandas(_extract, schema=MP3_SCHEMA)


def media_exif_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic EXIF'd JPEG table: real baseline JPEGs (one
    DC-only block) with a conformant APP1 segment — IFD0 carrying
    orientation/make/model, the ExifIFD carrying ISO, exposure
    RATIONAL, and pixel dims; byte order alternates II/MM by id so
    both endiannesses hit the oracle gate."""
    from .exif import build_exif_app1, encode_exif_jpeg
    from .jpeg import encode_jpeg_blocks

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                base = encode_jpeg_blocks(8, 8, [(did % 100, 0)])
                app1 = build_exif_app1(
                    ifd0=[
                        (0x0112, 3, 1 + did % 8),
                        (0x010F, 2, f"Cam{did % 5}"),
                        (0x0110, 2, f"M-{did % 20}"),
                    ],
                    exif_ifd=[
                        (0x8827, 3, 100 * (1 + did % 16)),
                        (0x829A, 5, (1, 125 + did % 500)),
                        (0xA002, 4, 8),
                        (0xA003, 4, 8),
                    ],
                    byte_order="II" if did % 2 == 0 else "MM",
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_exif_jpeg(base, app1),
                        "meta": {
                            "modality": "image",
                            "mime": "image/jpeg",
                            "width": 8,
                            "height": 8,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


EXIF_SCHEMA = (
    "media_id long, orientation int, make string, model string, iso int, "
    "exp_denom int, px_w int, px_h int, pixel_sum bigint"
)


def exif_features(media: DataFrame) -> DataFrame:
    """Parse the APP1 EXIF tags (real IFD walk via :mod:`.exif`) AND
    decode the carrier JPEG's pixels — proving the APP1 insertion
    leaves the image stream intact."""
    from .exif import parse_exif
    from .jpeg import decode_jpeg_pixels

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                t = parse_exif(payload)
                px = decode_jpeg_pixels(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "orientation": t[0x0112],
                        "make": t[0x010F],
                        "model": t[0x0110],
                        "iso": t[0x8827],
                        "exp_denom": t[0x829A][1],
                        "px_w": t[0xA002],
                        "px_h": t[0xA003],
                        "pixel_sum": int(px.sum(dtype=np.int64)),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "orientation", "make", "model", "iso",
                    "exp_denom", "px_w", "px_h", "pixel_sum",
                ],
            ).astype(
                {"media_id": "int64", "orientation": "int32",
                 "iso": "int32", "exp_denom": "int32", "px_w": "int32",
                 "px_h": "int32", "pixel_sum": "int64"}
            )

    return media.mapInPandas(_extract, schema=EXIF_SCHEMA)


def media_npz_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic .npz table WRITTEN BY NUMPY (np.savez_compressed —
    the external reference implementation, so the gate cross-validates
    our reader): per document an archive holding 'emb' (2x3 float32
    quarter-integers) and 'ids' (3 int64), every 2nd doc
    Fortran-ordered so the stride swap is exercised."""
    import io as _io

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                emb = np.array(
                    [((did + k) % 40) / 4.0 for k in range(6)],
                    dtype=np.float32,
                ).reshape(2, 3)
                if did % 2 == 0:
                    emb = np.asfortranarray(emb)
                ids = np.array(
                    [(did * 31 + k * 17) % 1000 for k in range(3)],
                    dtype=np.int64,
                )
                buf = _io.BytesIO()
                writer = np.savez_compressed if did % 3 == 0 else np.savez
                writer(buf, emb=emb, ids=ids)
                rows.append(
                    {
                        "media_id": did,
                        "payload": buf.getvalue(),
                        "meta": {
                            "modality": "text",
                            "mime": "application/x-npz",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


NPZ_SCHEMA = (
    "media_id long, n_arrays int, emb_rows int, emb_cols int, "
    "emb_sum_q bigint, ids_sum bigint"
)


def npz_features(media: DataFrame) -> DataFrame:
    """Parse .npz shards (zip walk + npy header/buffer decode via
    :mod:`.tensor_shards`) and emit per-archive aggregates."""
    from .tensor_shards import parse_npz

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                arrs = parse_npz(payload)
                eshape, _d, evals = arrs["emb"]
                _is, _d2, ivals = arrs["ids"]
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_arrays": len(arrs),
                        "emb_rows": eshape[0],
                        "emb_cols": eshape[1],
                        "emb_sum_q": int(sum(int(v * 4) for v in evals)),
                        "ids_sum": sum(ivals),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_arrays", "emb_rows", "emb_cols",
                    "emb_sum_q", "ids_sum",
                ],
            ).astype(
                {"media_id": "int64", "n_arrays": "int32",
                 "emb_rows": "int32", "emb_cols": "int32",
                 "emb_sum_q": "int64", "ids_sum": "int64"}
            )

    return media.mapInPandas(_extract, schema=NPZ_SCHEMA)


def media_safetensors_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic safetensors table: per document a shard with a
    float32 weight (2x3 quarter-integers; every 3rd document stores it
    as BF16 — quarter-integers below 16 fit bfloat16's 8 mantissa bits
    exactly, so the aggregate oracle is dtype-independent), an int64
    bias (3), and a __metadata__ block."""
    from .tensor_shards import encode_safetensors

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                blob = encode_safetensors(
                    {
                        "layer.weight": (
                            (2, 3),
                            "BF16" if did % 3 == 0 else "F32",
                            [((did + k) % 40) / 4.0 for k in range(6)],
                        ),
                        "layer.bias": (
                            (3,), "I64",
                            [(did * 31 + k * 17) % 1000 for k in range(3)],
                        ),
                    },
                    metadata={"format": "pt", "doc": str(did)},
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": blob,
                        "meta": {
                            "modality": "text",
                            "mime": "application/x-safetensors",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


ST_SCHEMA = (
    "media_id long, n_tensors int, weight_sum_q bigint, bias_sum bigint, "
    "meta_doc string"
)


def safetensors_features(media: DataFrame) -> DataFrame:
    """Parse safetensors shards (header/offset validation + buffer
    decode via :mod:`.tensor_shards`) and emit per-shard aggregates."""
    from .tensor_shards import parse_safetensors

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                tensors, meta = parse_safetensors(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_tensors": len(tensors),
                        "weight_sum_q": int(
                            sum(
                                int(v * 4)
                                for v in tensors["layer.weight"]["values"]
                            )
                        ),
                        "bias_sum": sum(tensors["layer.bias"]["values"]),
                        "meta_doc": meta.get("doc", ""),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_tensors", "weight_sum_q", "bias_sum",
                    "meta_doc",
                ],
            ).astype(
                {"media_id": "int64", "n_tensors": "int32",
                 "weight_sum_q": "int64", "bias_sum": "int64"}
            )

    return media.mapInPandas(_extract, schema=ST_SCHEMA)


def media_mp3_id3_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic tagged-MP3 table: an ID3v2 tag (TIT2/TPE1/TALB)
    prefixing real Layer-III frames; the tag MAJOR version alternates
    2.3/2.4 by id (plain vs syncsafe frame sizes — the classic
    cross-version bug) and the text encoding cycles
    latin-1/utf-16/utf-8."""
    from .mp3 import encode_id3v2, encode_mp3_frames

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                tag = encode_id3v2(
                    [
                        ("TIT2", f"T-{did % 100}"),
                        ("TPE1", f"A-{did % 30}"),
                        ("TALB", f"L-{did % 12}"),
                    ],
                    major=3 if did % 2 == 0 else 4,
                    encoding=[0, 1, 3][did % 3],
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": tag
                        + encode_mp3_frames(
                            n_frames=5 + did % 10,
                            bitrate_idx=9,
                            rate_idx=0,
                        ),
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/mpeg",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


ID3_SCHEMA = (
    "media_id long, title string, artist string, album string, "
    "n_frames int"
)


def mp3_id3_features(media: DataFrame) -> DataFrame:
    """Parse the ID3v2 text frames AND walk the audio frames behind
    them (via :mod:`.mp3`) — the tag skip and the frame walk must
    agree on where the audio starts."""
    from .mp3 import parse_id3v2, walk_mp3

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                tags = parse_id3v2(payload)
                m = walk_mp3(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "title": tags.get("TIT2", ""),
                        "artist": tags.get("TPE1", ""),
                        "album": tags.get("TALB", ""),
                        "n_frames": m["n_frames"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "title", "artist", "album", "n_frames"],
            ).astype({"media_id": "int64", "n_frames": "int32"})

    return media.mapInPandas(_extract, schema=ID3_SCHEMA)


def media_arrow_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic Arrow IPC table WRITTEN BY PYARROW — the external
    reference implementation, so the gate itself cross-validates our
    reader: per document a 3-row table (long, string, exact
    quarter-integer double, nullable long), streamed in 2-row record
    batches; every 2nd document uses the FILE format (Feather v2)
    instead of the stream format. Wire-shape variants that aggregate
    identically (so one oracle pins them all): every 3rd document
    DICTIONARY-encodes the name column, every 4th≡1 adds a nested
    list<int64> column (ignored by the extractor but decoded on the
    wire), every 5th≡2 compresses bodies with LZ4_FRAME, every 5th≡4
    with ZSTD (through the pure-Python RFC 8878 decoder), every 7th≡3
    RUN-END-encodes the name column (same values, REE wire layout),
    every 7th≡5/≡6 adds a dense/sparse UNION column with custom type
    codes, and every 11th≡4/≡7/≡9 adds a tz-aware ns timestamp /
    month-day-nano interval / ns duration column — all ignored by the
    extractor but decoded on the wire, so a union offset slip, REE
    expansion bug, or temporal misread breaks the batch decode and the
    hash."""
    import io

    import pyarrow as pa
    import pyarrow.ipc as ipc

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                name_col = pa.array([f"r{(did + k) % 10}" for k in range(3)])
                if did % 7 == 3:
                    # REE takes precedence over dictionary when both
                    # residues hit (did ≡ 24 mod 21): one encoding per
                    # column keeps the fixture deterministic
                    import pyarrow.compute as _pc

                    name_col = _pc.run_end_encode(name_col)
                elif did % 3 == 0:
                    name_col = name_col.dictionary_encode()
                cols = {
                    "val": pa.array(
                        [(did * 31 + k * 17) % 1000 for k in range(3)],
                        type=pa.int64(),
                    ),
                    "name": name_col,
                    "score": pa.array(
                        [((did + k) % 100) / 4.0 for k in range(3)],
                        type=pa.float64(),
                    ),
                    "opt": pa.array(
                        [None if k == 1 else did % 50 for k in range(3)],
                        type=pa.int64(),
                    ),
                }
                if did % 4 == 1:
                    cols["tags"] = pa.array(
                        [[did % 7, k] for k in range(3)],
                        type=pa.list_(pa.int64()),
                    )
                if did % 7 == 5:
                    cols["wire_u"] = pa.UnionArray.from_dense(
                        pa.array([2, 9, 2], type=pa.int8()),
                        pa.array([0, 0, 1], type=pa.int32()),
                        [
                            pa.array([did, did + 1], type=pa.int64()),
                            pa.array([f"u{did % 5}"]),
                        ],
                        ["num", "txt"],
                        [2, 9],  # non-contiguous codes: typeIds remap
                    )
                elif did % 7 == 6:
                    cols["wire_u"] = pa.UnionArray.from_sparse(
                        pa.array([0, 1, 0], type=pa.int8()),
                        [
                            pa.array(
                                [did, None, did + 2], type=pa.int64()
                            ),
                            pa.array(["a", f"s{did % 3}", "c"]),
                        ],
                    )
                if did % 11 == 4:
                    cols["wire_ts"] = pa.array(
                        [did * 1_000_000_007 + k for k in range(3)],
                        type=pa.int64(),
                    ).cast(pa.timestamp("ns", tz="America/New_York"))
                elif did % 11 == 7:
                    cols["wire_iv"] = pa.array(
                        [
                            pa.MonthDayNano([did % 24, k, did * 11 + k])
                            for k in range(3)
                        ]
                    )
                elif did % 11 == 9:
                    cols["wire_d"] = pa.array(
                        [did * 13 + k for k in range(3)],
                        type=pa.duration("ns"),
                    )
                if did % 13 == 6:
                    # >12-byte values exercise the variadic data-buffer
                    # path; short ones the inline path
                    cols["wire_v"] = pa.array(
                        [f"doc-{did} padded well past twelve bytes",
                         f"s{did % 9}", None],
                        type=pa.string_view(),
                    )
                elif did % 13 == 10:
                    cols["wire_v"] = pa.array(
                        [[did % 7, k] for k in range(3)],
                        type=pa.list_view(pa.int64()),
                    )
                t = pa.table(cols)
                buf = io.BytesIO()
                opener = ipc.new_file if did % 2 == 0 else ipc.new_stream
                if did % 5 == 2:
                    opts = ipc.IpcWriteOptions(compression="lz4")
                elif did % 5 == 4:
                    # exercises the pure-Python RFC 8878 decoder
                    # (operators/zstd.py) through the IPC body path
                    opts = ipc.IpcWriteOptions(compression="zstd")
                else:
                    opts = None
                with opener(buf, t.schema, options=opts) as w:
                    w.write_table(t, max_chunksize=2)
                rows.append(
                    {
                        "media_id": did,
                        "payload": buf.getvalue(),
                        "meta": {
                            "modality": "text",
                            "mime": "application/vnd.apache.arrow.stream",
                            "width": None,
                            "height": None,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def arrow_features(media: DataFrame) -> DataFrame:
    """Parse Arrow IPC payloads (hand-rolled flatbuffers + buffer
    decode via :mod:`.arrow_ipc`) and emit per-file aggregates —
    same shape as :func:`avro_features`."""
    from .arrow_ipc import parse_arrow_ipc

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                _schema, recs = parse_arrow_ipc(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_rows": len(recs),
                        "val_sum": sum(r["val"] for r in recs),
                        "score_sum_q": int(
                            sum(int(r["score"] * 4) for r in recs)
                        ),
                        "name_cat": "".join(r["name"] for r in recs),
                        "n_null": sum(1 for r in recs if r["opt"] is None),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_rows", "val_sum", "score_sum_q",
                    "name_cat", "n_null",
                ],
            ).astype(
                {"media_id": "int64", "n_rows": "int32",
                 "val_sum": "int64", "score_sum_q": "int64",
                 "n_null": "int32"}
            )

    return media.mapInPandas(_extract, schema=AVRO_SCHEMA)


def media_gif_animated_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic ANIMATED GIF table: nf = 3 + id%4 full-canvas
    frames of w=1+id%20 × h=1+id%12, frame f a gradient of
    base_f + x + y with base_f = (id + 17f) % 220 (values stay < 256,
    so pixel sums are closed-form without wraparound), 50 cs (500 ms)
    per frame via per-frame Graphic Control Extensions."""
    from .gif import encode_gif_animated

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for doc_id in pdf_["doc_id"]:
                did = int(doc_id)
                w, h, nf = 1 + did % 20, 1 + did % 12, 3 + did % 4
                frames = []
                for f in range(nf):
                    base = (did + 17 * f) % 220
                    frames.append(
                        np.fromfunction(
                            lambda y, x: base + x + y, (h, w)
                        ).astype(np.uint8)
                    )
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_gif_animated(
                            frames, delays_cs=[50] * nf
                        ),
                        "meta": {
                            "modality": "video",
                            "mime": "image/gif",
                            "width": w,
                            "height": h,
                            "duration_ms": nf * 500,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


GIF_FRAME_SCHEMA = "media_id long, frame_no int, content_sum bigint"


def gif_frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample animated-GIF frames by GCE-delay time buckets (first frame
    per ``every_ms`` bucket, the same rule as the MP4/MKV samplers) and
    emit exact gray-channel pixel sums of the COMPOSED frames."""
    from .gif import decode_gif_frames

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            rows = []
            for mid, payload in zip(pdf_["media_id"], pdf_["payload"]):
                t_ms = 0
                seen: set[int] = set()
                kept = 0
                for delay_cs, rgb in decode_gif_frames(payload):
                    bucket = t_ms // every_ms
                    if bucket not in seen:
                        seen.add(bucket)
                        rows.append(
                            {
                                "media_id": int(mid),
                                "frame_no": kept,
                                "content_sum": int(
                                    rgb[:, :, 0].sum(dtype=np.int64)
                                ),
                            }
                        )
                        kept += 1
                    t_ms += delay_cs * 10
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "content_sum"]
            ).astype({"media_id": "int64", "frame_no": "int32",
                      "content_sum": "int64"})

    return media.mapInPandas(_extract, schema=GIF_FRAME_SCHEMA)


def media_flac_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic FLAC table with closed-form sample content: channel
    0 carries s_i = ((31·id + 17·i) % 4001) − 2000 over n = 100 + id%300
    samples (channel 1, on even ids, ((13·id + 29·i) % 3001) − 1500) —
    and id cycles the ENCODING across every subframe strategy (verbatim,
    fixed orders 0-4, explicit-coefficient LPC) and, for stereo files,
    all four decorrelation modes. Every 3rd id stores the same samples
    at 24-bit depth and every 5th id as a VARIABLE-blocksize stream
    (three uneven frames) — layout axes that change the bytes but not
    the samples. FLAC is lossless, so decoded sums equal the generator
    formula regardless of strategy — one SQL oracle covers every
    decode path."""
    from .flac import encode_flac

    strategies = [
        "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4", "lpc",
    ]
    modes = ["independent", "left_side", "right_side", "mid_side"]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                n = 100 + did % 300
                ch0 = [((did * 31 + i * 17) % 4001) - 2000 for i in range(n)]
                chans = [ch0]
                if did % 2 == 0:
                    chans.append(
                        [((did * 13 + i * 29) % 3001) - 1500 for i in range(n)]
                    )
                payload = encode_flac(
                    chans,
                    blocksize=256,
                    strategy=strategies[did % 7],
                    stereo_mode=modes[(did // 2) % 4],
                    lpc_coefs=[19, -7, 2],
                    lpc_shift=4,
                    bps=24 if did % 3 == 0 else 16,
                    variable_blocksizes=(
                        [n // 3, n // 3, n - 2 * (n // 3)]
                        if did % 5 == 0
                        else None
                    ),
                )
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/flac",
                            "width": None,
                            "height": None,
                            "duration_ms": n * 1000 // 16000,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


FLAC_SCHEMA = "media_id long, n_samples bigint, channels int, sample_sum bigint"


def audio_flac_features(media: DataFrame) -> DataFrame:
    """Decode FLAC payloads (real Rice/LPC/stereo-decorrelation decode
    via :func:`.flac.decode_flac`) and emit exact all-channel sample
    sums — embarrassingly parallel, zero shuffles."""
    from .flac import decode_flac

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_flac(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": d["n_samples"],
                        "channels": d["channels"],
                        "sample_sum": sum(sum(ch) for ch in d["samples"]),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(_extract, schema=FLAC_SCHEMA)


def decode_audio(payload: bytes) -> object:
    """STUB for compressed *psychoacoustic* audio codecs (MP3/AAC/Opus)
    — those require real DSP libraries, absent here. What decodes for
    REAL: PCM WAV (:func:`decode_wav`), and G.711 μ-law/A-law + IMA
    ADPCM WAVs (:func:`.audio_codecs.decode_wav_compressed`)."""
    raise NotImplementedError(
        "psychoacoustic audio decode (MP3/AAC/Opus) is stubbed: no codec "
        "libraries in this environment (PCM WAV → decode_wav, "
        "G.711/IMA-ADPCM WAV → audio_codecs.decode_wav_compressed)"
    )


_PNG_COLOR_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}  # samples/pixel → color type


def encode_png_pixels(px: "np.ndarray") -> bytes:
    """Encode an arbitrary uint8 pixel array (height, width, channels ∈
    {1,2,3,4}) as a non-interlaced 8-bit PNG, filter None on every row —
    the re-encode half of the resize path."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    height, width, channels = px.shape
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _PNG_COLOR_OF_CHANNELS[channels], 0, 0, 0
    )
    flat = px.reshape(height, width * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(height))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def image_pixels(payload: bytes) -> "np.ndarray":
    """Decode any supported image payload (PNG or uncompressed BMP) to a
    (height, width, channels) uint8 array via magic-byte dispatch."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png_pixels(payload)
    if payload[:2] == b"BM":
        return decode_bmp_pixels(payload)
    raise ValueError("unsupported image container for pixel decode")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize for the decodable containers: PNG / uncompressed
    BMP in, nearest-neighbor resample, 8-bit PNG out.

    Nearest-neighbor with the integer floor mapping
    ``src = (dst * src_dim) // dst_dim`` — deterministic (no float
    rounding, identical on any platform) and exactly predictable by an
    arithmetic oracle. Entropy-coded inputs (JPEG scan data, WebP) still
    raise via :func:`image_pixels`; see :func:`decode_image`.
    """
    px = image_pixels(payload)
    src_h, src_w = px.shape[:2]
    iy = (np.arange(height, dtype=np.int64) * src_h) // height
    ix = (np.arange(width, dtype=np.int64) * src_w) // width
    return encode_png_pixels(px[iy][:, ix])


def encode_avi(frames: list[bytes], us_per_frame: int = 40000) -> bytes:
    """Minimal RIFF/AVI writer: LIST hdrl (avih with the frame clock and
    count) + LIST movi with one ``00dc`` chunk per frame, even-byte
    padded per the RIFF rule. Enough container structure for any RIFF
    walker — including :func:`sample_video_frames` — to recover frame
    payloads and timing; the frame bytes themselves are opaque (MJPEG
    would put a JPEG per chunk)."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    avih = struct.pack("<I", us_per_frame) + b"\x00" * 12
    avih += struct.pack("<I", len(frames)) + b"\x00" * 36  # dwTotalFrames
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_video_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """REAL frame sampling for RIFF/AVI, ISO-BMFF/MP4, and Matroska/EBML
    containers.

    Slicing frames out of any of the three needs NO codec. AVI is a pure
    chunk walk: recurse through LIST chunks, read the frame clock from
    ``avih`` (microseconds per frame), collect every ``..dc``/``..db``
    stream chunk in order, then keep every k-th frame where
    ``k = every_ms·1000 // us_per_frame``. MP4 dispatches to
    :func:`.mp4.sample_mp4_frames` — an stbl sample-table walk
    (stts/stsz/stsc/stco/stss); MKV/WebM to
    :func:`.mkv.sample_mkv_frames` — an EBML walk to the video track's
    SimpleBlocks; both keep the first keyframe per ``every_ms`` bucket.
    Decoding a sampled frame's pixels is a separate concern (the image
    path's job). Fragmented MP4 (CMAF/DASH moof) decodes through the
    same MP4 path; laced/BlockGroup Matroska and unknown containers
    still raise."""
    if payload is not None and len(payload) >= 12 and payload[4:8] == b"ftyp":
        from .mp4 import sample_mp4_frames

        return sample_mp4_frames(payload, every_ms)
    if payload is not None and payload[:4] == b"\x1a\x45\xdf\xa3":
        from .mkv import sample_mkv_frames

        return sample_mkv_frames(payload, every_ms)
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise NotImplementedError(
            "only RIFF/AVI, ISO-BMFF/MP4, and Matroska/EBML containers "
            "are frame-sliceable without a codec"
        )
    us_per_frame = 40000  # AVI default 25 fps when no avih present
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal us_per_frame
        off = 0
        while off + 8 <= len(buf):
            fourcc = buf[off : off + 4]
            size = int.from_bytes(buf[off + 4 : off + 8], "little")
            data = buf[off + 8 : off + 8 + size]
            if fourcc == b"LIST":
                walk(data[4:])
            elif fourcc == b"avih" and size >= 4:
                v = int.from_bytes(data[0:4], "little")
                if v:
                    us_per_frame = v
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(data)
            off += 8 + size + (size % 2)  # RIFF chunks are even-aligned

    walk(payload[12:])
    stride = max(1, (every_ms * 1000) // us_per_frame)
    return frames[::stride]


def media_avi_from_documents(
    docs: DataFrame, frame_bytes: int = 64, us_per_frame: int = 500_000
) -> DataFrame:
    """Deterministic AVI media table: each document's utf-8 bytes are cut
    into ``frame_bytes`` frames and wrapped in a real RIFF/AVI container
    (:func:`encode_avi`) at ``us_per_frame`` per frame.

    Frame content is a closed-form byte slice of the text, so an oracle
    can predict each sampled frame's sha256 without parsing RIFF — an
    end-to-end proof that the sampler walks the actual container bytes
    (clock from avih, stride arithmetic, chunk padding)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8")
                frames = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                rows.append(
                    {
                        "media_id": int(doc_id),
                        "payload": encode_avi(frames, us_per_frame),
                        "meta": {
                            "modality": "video",
                            "mime": "video/x-msvideo",
                            "width": None,
                            "height": None,
                            "duration_ms": len(frames) * us_per_frame // 1000,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def media_mp4_from_documents(
    docs: DataFrame,
    frame_bytes: int = 64,
    delta_ms: int = 500,
    sync_every: int = 2,
) -> DataFrame:
    """Deterministic MP4 media table: each document's utf-8 bytes are cut
    into ``frame_bytes`` samples and wrapped in a real ISO-BMFF container
    (:func:`.mp4.encode_mp4`) at ``delta_ms`` per sample with every
    ``sync_every``-th sample a keyframe; every 5th document uses the
    64-bit co64/largesize layout so the >4 GiB offset path is
    exercised, and every 7th uses the FRAGMENTED (CMAF/DASH moof)
    layout so the per-fragment trun/tfdt/trex sample-table path runs
    under the oracle too.

    Sample content is a closed-form byte slice of the text, so an oracle
    can predict each sampled keyframe's sha256 without parsing boxes —
    an end-to-end proof that the sampler walks the actual stbl arrays
    (stts clock, stsz extents, stsc/stco chunk offsets, stss sync
    selection) or, for fragmented files, the moof/traf walk."""
    from .mp4 import encode_mp4, encode_mp4_fragmented

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                raw = (text or "").encode("utf-8")
                frames = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                if did % 7 == 0:
                    payload = encode_mp4_fragmented(
                        frames,
                        timescale=1000,
                        delta=delta_ms,
                        sync_every=sync_every,
                    )
                else:
                    payload = encode_mp4(
                        frames,
                        timescale=1000,
                        delta=delta_ms,
                        sync_every=sync_every,
                        use_co64=did % 5 == 0,
                    )
                rows.append(
                    {
                        "media_id": did,
                        "payload": payload,
                        "meta": {
                            "modality": "video",
                            "mime": "video/mp4",
                            "width": None,
                            "height": None,
                            "duration_ms": len(frames) * delta_ms,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def media_mkv_from_documents(
    docs: DataFrame,
    frame_bytes: int = 64,
    delta_ms: int = 500,
    sync_every: int = 2,
) -> DataFrame:
    """Deterministic Matroska media table: each document's utf-8 bytes
    are cut into ``frame_bytes`` frames wrapped in real EBML containers
    (:func:`.mkv.encode_mkv`) at ``delta_ms`` per frame with every
    ``sync_every``-th frame a keyframe; every 3rd document uses a
    non-default TimestampScale (2 ms ticks), docs ≡1/≡3 (mod 4) use
    Xiph/EBML LACING (2-frame clusters), and docs ≡2 (mod 7) use
    BlockGroup keyframe signalling — all layouts sample identically,
    so the one closed-form oracle pins every wire shape. Frame content
    is a closed-form byte slice of the text, so an oracle predicts
    each sampled keyframe's sha256 without parsing EBML."""
    from .mkv import encode_mkv

    # The laced layouts force 2-frame clusters whose keyframe flag is
    # taken from the cluster's FIRST frame; the one-oracle-fits-all
    # invariant therefore needs every cluster-leading frame (even
    # indices) to be a keyframe under sync_every — true for 0/1/2 only.
    # Guard it instead of silently mispredicting for laced documents.
    if sync_every not in (0, 1, 2):
        raise ValueError(
            "media_mkv_from_documents: laced layout variants require "
            f"sync_every in (0, 1, 2); got {sync_every}"
        )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                raw = (text or "").encode("utf-8")
                frames = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                if did % 3 == 0:  # 2 ms ticks: same absolute times
                    kw = {"timestamp_scale": 2_000_000,
                          "delta_ms": delta_ms // 2}
                else:
                    kw = {"delta_ms": delta_ms}
                # Layout variants that SAMPLE IDENTICALLY (so one
                # closed-form oracle covers all): laced 2-frame
                # clusters put both frames at the cluster tick whose
                # keyframe leads it — bucket keeps that same keyframe;
                # BlockGroups signal keyframes by ReferenceBlock
                # absence instead of the flag bit.
                if did % 4 == 1:
                    kw["lacing"] = "xiph"
                    kw["frames_per_cluster"] = 2
                elif did % 4 == 3:
                    kw["lacing"] = "ebml"
                    kw["frames_per_cluster"] = 2
                if did % 7 == 2:
                    kw["block_groups"] = True
                rows.append(
                    {
                        "media_id": did,
                        "payload": encode_mkv(
                            frames, sync_every=sync_every, **kw
                        ),
                        "meta": {
                            "modality": "video",
                            "mime": "video/x-matroska",
                            "width": None,
                            "height": None,
                            "duration_ms": len(frames) * delta_ms,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def media_ogg_from_documents(
    docs: DataFrame,
    packet_bytes: int = 64,
    delta_ms: int = 500,
    rate: int = 48000,
) -> DataFrame:
    """Deterministic Ogg media table: each document's utf-8 bytes cut
    into ``packet_bytes`` packets wrapped in real Ogg pages
    (:func:`.ogg.encode_ogg`, one packet per page so the granule clock
    has packet resolution), packet i stamped granule
    ``i · rate · delta_ms / 1000``. Packet content is a closed-form
    byte slice of the text, so an oracle predicts each sampled packet's
    sha256 without parsing a page."""
    from .ogg import encode_ogg

    spp = rate * delta_ms // 1000

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(doc_id)
                raw = (text or "").encode("utf-8")
                packets = [
                    (raw[i : i + packet_bytes], (i // packet_bytes) * spp)
                    for i in range(0, len(raw), packet_bytes)
                ]
                rows.append(
                    {
                        "media_id": did,
                        "payload": (
                            encode_ogg(packets, serial=0x1000 + did % 977)
                            if packets
                            else b""
                        ),
                        "meta": {
                            "modality": "audio",
                            "mime": "audio/ogg",
                            "width": None,
                            "height": None,
                            "duration_ms": len(packets) * delta_ms,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return _spread_docs(docs).select("doc_id", "text").mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def sample_frames_df(media: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """1→N frame sampling: each media row explodes into its frames.

    The row-multiplying batch shape real video pipelines need —
    ``mapInPandas`` may emit any number of output rows per input row, so
    one Arrow pass covers decode→sample→per-frame features with no
    intermediate shuffle. Frame extraction dispatches on modality: video
    payloads go through :func:`sample_video_frames` — REAL for RIFF/AVI,
    ISO-BMFF/MP4 (incl. fragmented) and Matroska containers (unknown
    formats raise); text/other payloads slice fixed-size byte windows, so
    batching, ordering (frame_no) and per-frame hashing run for real
    on every modality. Empty payloads emit zero frames.

    Scale: pair with :func:`partition_by_payload_bytes` so each task
    holds ~constant payload bytes; output rows stay within the task
    (narrow), and downstream per-frame ops see an already-exploded
    distributed table.
    """

    def _frames_of(payload: bytes, modality: str) -> list[bytes]:
        if modality == "video":
            return sample_video_frames(payload)  # STUB: raises here
        if payload is None:
            return []
        if modality == "audio" and payload[:4] == b"OggS":
            # Ogg audio: packets sampled by granule-position time
            # buckets — the container's codec-free clock
            from .ogg import sample_ogg_packets

            return sample_ogg_packets(payload)
        return [
            payload[i : i + frame_bytes]
            for i in range(0, len(payload), frame_bytes)
        ]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, sizes, digests = [], [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                modality = meta["modality"] if meta is not None else None
                for i, fr in enumerate(_frames_of(payload, modality)):
                    ids.append(mid)
                    nos.append(i)
                    sizes.append(len(fr))
                    digests.append(hashlib.sha256(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "sha256": pd.Series(digests, dtype="object"),
                }
            )

    return media.mapInPandas(_gen, schema=FRAME_SCHEMA)


def partition_by_payload_bytes(media: DataFrame, target_mb: int = 128) -> DataFrame:
    """Repartition a media table so each partition holds ~``target_mb`` of
    payload bytes.

    Binary payloads dominate row width, so row-count partitioning makes
    partition memory unpredictable (one partition of 4K thumbnails, the
    next of 4K videos). One cheap aggregate measures total bytes (a
    bounded driver scalar, not a data collect), then a round-robin
    repartition to ceil(total / target) partitions bounds per-task bytes
    for the decode stage.
    """
    total = media.select(
        F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, -(-int(total) // (target_mb * 1024 * 1024)))
    return media.repartition(n)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed image resize: every decodable image payload is
    resampled to (width, height) via :func:`resize_image` and re-emitted
    as a PNG payload with updated meta; undecodable payloads pass
    through untouched (same skip-don't-fail posture as the feature
    extractor).

    Runs in the same Arrow ``mapInPandas`` batch loop as
    ``extract_features`` — decode → transform → re-encode per batch, no
    per-row Python UDF overhead, pairs with
    ``partition_by_payload_bytes`` for byte-bounded tasks.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            out_meta = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    out_payloads.append(resize_image(payload, width, height))
                    m = dict(meta) if meta is not None else {}
                    m.update(mime="image/png", width=width, height=height)
                    out_meta.append(m)
                except (ValueError, NotImplementedError, TypeError):
                    out_payloads.append(payload)
                    out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams Arrow batches through Python once — the
    pattern real decoders plug into (decode → resize → embed per batch).
    Byte-level features (length, sha256) are computed for every payload;
    container decode dispatches on magic bytes — uncompressed BMP and PCM
    WAV decode for real (width/height/duration/exact content sums),
    compressed codecs stay stubbed and fall back to byte features with
    NULL decoded columns.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            decoded = [_sniff_and_decode(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                    "width": pd.Series(
                        [d.get("width") for d in decoded], dtype="Int32"
                    ),
                    "height": pd.Series(
                        [d.get("height") for d in decoded], dtype="Int32"
                    ),
                    "duration_ms": pd.Series(
                        [d.get("duration_ms") for d in decoded], dtype="Int64"
                    ),
                    "content_sum": pd.Series(
                        [d.get("content_sum") for d in decoded], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
