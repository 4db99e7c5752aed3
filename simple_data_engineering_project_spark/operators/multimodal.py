"""Multimodal column plumbing (SURVEY §2 C5).

Images / audio / video ride through the engine as opaque ``binary``
payloads plus a typed metadata struct — the lakehouse-standard shape
(content bytes + modality + mime + content-address). The Spark-side
plumbing (schema, Arrow batching, ``mapInPandas`` signature, partition
sizing) is real and tested; the *decoders* are stubs because codec
libraries (Pillow/ffmpeg/…) are not in this environment — each stub is
clearly marked and raises ``NotImplementedError`` unless given the
deterministic fake used by tests.

Scale notes: binary payloads dominate row width, so partitioning must be
by target batch *bytes*, not row count — ``repartition`` on a size-bucketed
key or (better) write payloads to object storage and carry only content
addresses; both shapes are supported here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
    ]
)


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


def decode_image(payload: bytes) -> object:
    """STUB — image decode requires a codec library absent here.

    On a real cluster: ``PIL.Image.open(io.BytesIO(payload))`` inside the
    same ``mapInPandas`` batch loop that ``extract_features`` uses.
    """
    raise NotImplementedError(
        "image decode is stubbed: no codec libraries in this environment"
    )


def decode_audio(payload: bytes) -> object:
    """STUB — audio decode (soundfile/ffmpeg) absent in this environment."""
    raise NotImplementedError(
        "audio decode is stubbed: no codec libraries in this environment"
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB — image resize requires a codec library absent here.

    On a real cluster: decode → ``img.resize((width, height))`` → re-encode,
    inside the same ``mapInPandas`` batch loop as ``extract_features``.
    """
    raise NotImplementedError(
        "image resize is stubbed: no codec libraries in this environment"
    )


def sample_video_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """STUB — video frame sampling (ffmpeg) absent in this environment."""
    raise NotImplementedError(
        "video frame sampling is stubbed: no ffmpeg in this environment"
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
    would call the ffmpeg-backed sampler (stubbed here,
    :func:`sample_video_frames`); the deterministic fake for text/other
    payloads slices fixed-size byte windows, so batching, ordering
    (frame_no) and per-frame hashing run for real. Empty payloads emit
    zero frames.

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


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams Arrow batches through Python once — this is
    the pattern real decoders plug into (decode → resize → embed per
    batch). The implemented features (byte length, sha256) are cheap but
    real, and define the batch shape + output contract.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
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
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
