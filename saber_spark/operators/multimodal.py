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


def extract_metadata(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Byte-level metadata via mapInPandas (vectorized per Arrow batch)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pay = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": pay.map(len).astype("int64"),
                    "first_byte": pay.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": pay.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                    "byte_checksum": pay.map(lambda b: sum(b) % 999983).astype("int64"),
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
