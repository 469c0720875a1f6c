"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is real (schemas, mapInPandas batch shape, partition
sizing); the codec step is stubbed because no image/audio libraries ship
in this container — ``decode_image``/``decode_audio`` raise
NotImplementedError unless the libs import, and ``fake_decode_header``
provides a deterministic stand-in parser so the pipeline (including the
driver-checked metadata query) runs end-to-end.

At scale: binary payloads dominate row size — `maxRecordsPerBatch` is
lowered for these frames so Arrow batches stay ~64 MB, and decode runs
in ``mapInPandas`` (per-partition batch iterator: one Python worker per
partition, no per-row overhead).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal row: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_checksum", T.LongType()),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """Real decode — requires Pillow (absent in this container)."""
    pil = _try_import_pil()
    if pil is None:
        raise NotImplementedError(
            "image decode requires Pillow; container ships without codecs — "
            "use fake_decode_header for pipeline tests"
        )
    import io

    return pil.open(io.BytesIO(payload))


def decode_audio(payload: bytes):
    raise NotImplementedError(
        "audio decode requires soundfile/librosa; absent in this container"
    )


def fake_decode_header(payload: bytes) -> dict:
    """Deterministic stand-in 'decode': parses a fake 8-byte header
    (4 bytes width, 4 bytes height, big-endian) used by tests."""
    if len(payload) < 8:
        return {"width": 0, "height": 0}
    return {
        "width": int.from_bytes(payload[0:4], "big"),
        "height": int.from_bytes(payload[4:8], "big"),
    }


#: payload size above which per-payload NumPy sums beat the concatenated
#: segmented-reduce path (the ~1 µs/row NumPy call overhead amortizes;
#: measured crossover in BENCH/MULTIMODAL.md)
_BIG_PAYLOAD = 4096


def extract_metadata(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Byte-level metadata via mapInPandas, with NumPy doing all per-byte
    work (no Python interpreter loop over bytes):

    - media-sized payloads (≥4 KB mean): ``np.frombuffer(b).sum()`` per
      payload — SIMD summation at ~1.8 GB/s/core (~8× CPython
      ``sum(bytes)``), one O(1) NumPy call per row;
    - small payloads: one concatenation + ``np.add.reduceat`` segmented
      sum over the whole Arrow batch — no per-row NumPy call overhead.

    Measured numbers in BENCH/MULTIMODAL.md. At 100 TB of media the
    per-byte step IS the pipeline bottleneck, so it must run at memory
    bandwidth, not interpreter speed."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pay = pdf[payload_col].tolist()
            n = len(pay)
            lens = np.fromiter((len(b) for b in pay), dtype=np.int64, count=n)
            total = int(lens.sum())
            if n and total >= _BIG_PAYLOAD * n:
                sums = np.fromiter(
                    (int(np.frombuffer(b, np.uint8).sum(dtype=np.int64)) for b in pay),
                    dtype=np.int64, count=n,
                )
                first = np.fromiter((b[0] if b else -1 for b in pay), dtype=np.int64, count=n)
                last = np.fromiter((b[-1] if b else -1 for b in pay), dtype=np.int64, count=n)
            else:
                big = np.frombuffer(b"".join(pay), dtype=np.uint8)
                ends = np.cumsum(lens)
                starts = ends - lens
                ne = lens > 0
                sums = np.zeros(n, dtype=np.int64)
                if len(big):
                    sums[ne] = np.add.reduceat(big, starts[ne], dtype=np.int64)
                    first = np.where(ne, big[np.minimum(starts, len(big) - 1)], -1)
                    last = np.where(ne, big[np.maximum(ends - 1, 0)], -1)
                else:  # batch of only empty payloads
                    first = last = np.full(n, -1, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": lens,
                    "first_byte": first.astype("int32"),
                    "last_byte": last.astype("int32"),
                    "byte_checksum": sums % 999983,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, METADATA_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — plumbing only: emits (media_id, frame_idx)
    for a deterministic fake frame count derived from payload size (a
    real build decodes container headers here)."""
    n_frames = (F.length(F.col("payload")) / 1000).cast("int")
    return (
        df.select("media_id", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"))
        .where(F.col("frame_idx") % every_n == 0)
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_stub(
    df: DataFrame,
    factor: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Image/video resize — plumbing only: the batch shape, schema, and
    vectorized byte path of a real resize (decode → scale → re-encode,
    which needs codecs this container lacks; ``decode_image`` is the
    honest gate). The stand-in keeps every ``factor``-th byte of the
    payload (NumPy stride slice — no Python byte loops), so output size,
    Arrow batch behavior, and downstream partition sizing are realistic.
    """
    if factor < 1:
        raise ValueError("resize_stub: factor must be >= 1")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_payload = [
                np.frombuffer(p, dtype=np.uint8)[::factor].tobytes()
                if p is not None
                else None
                for p in b[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": b[id_col],
                    "payload": out_payload,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in out_payload
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, RESIZED_SCHEMA)


def extract_features(
    df: DataFrame,
    dim: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    seed: int = 7,
) -> DataFrame:
    """Media feature extraction: payload → L2-normalized float vector.
    Unlike the codec-gated decode, this path is REAL end to end — the
    feature is the byte-value histogram (256 bins, a legitimate if crude
    content signature) projected to ``dim`` dims by a seed-fixed random
    matrix, all vectorized NumPy inside one ``mapInPandas`` pass. The
    output column is exactly the ``embedding`` shape the ANN layer
    consumes, so media near-dup = extract_features → similarity ops
    (RP-LSH / IVF) with no adapter. Empty/NULL payloads yield a NULL
    embedding (explicit absence — filter before the ANN stage).
    """
    if dim < 1:
        raise ValueError("extract_features: dim must be >= 1")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = np.random.default_rng(seed).standard_normal((256, dim))
        for b in batches:
            out = []
            for p in b[payload_col]:
                if p is None or len(p) == 0:
                    # no content, no feature: NULL is explicit absence
                    # (a zero vector would silently vanish from cosine
                    # results — undefined norm — instead of being
                    # filterable)
                    out.append(None)
                    continue
                hist = np.bincount(
                    np.frombuffer(p, dtype=np.uint8), minlength=256
                ).astype(np.float64)
                v = hist @ proj
                n = np.linalg.norm(v)
                out.append((v / n if n > 0 else v).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": b[id_col], "embedding": out})

    return df.select(id_col, payload_col).mapInPandas(op, FEATURES_SCHEMA)
