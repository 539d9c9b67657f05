"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The image/audio codec libraries are not in this container, so the decode
kernels are STUBS — a deterministic fake feature extractor clearly marked
as such — but the Spark-side plumbing is real and tested: schema contract,
Arrow-batched ``mapInPandas`` signature, per-batch iteration shape, and
partition sizing are exactly what a real decoder (PIL/ffmpeg/torchaudio)
would drop into.

At 100 TB: payloads stay in columnar storage; decode runs as Arrow batches
with spark.sql.files.maxPartitionBytes sized so one batch of decoded
frames fits executor memory; feature outputs are small typed columns, so
the expensive bytes never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the stub decoder — a real image decoder would produce
#: the same shape (dims + a small feature vector), just with real values
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, checksum bigint"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model an opaque binary column: payload = utf-8 bytes of the text
    (stand-in for image/audio bytes), plus typed metadata columns."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def decode_stub(df: DataFrame) -> DataFrame:
    """STUB decoder over ``mapInPandas``: derives deterministic fake
    image dimensions + checksum from the raw bytes.

    Replace ``_fake_decode_batch`` with a real codec (e.g. PIL.Image.open
    on io.BytesIO) — the Arrow batch plumbing, schema, and partition
    behavior stay identical.
    """

    def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["payload"]
            n_bytes = raw.str.len().astype("int64")
            # deterministic fake "dimensions" — NOT a real decode
            checksum = raw.map(lambda b: sum(b[:64]) if len(b) else 0).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "width": (checksum % 640 + 1).astype("int32"),
                    "height": (n_bytes % 480 + 1).astype("int32"),
                    "checksum": checksum,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        _fake_decode_batch, schema=DECODE_SCHEMA
    )


def frame_sample_stub(df: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """STUB frame sampler: explodes one row per sampled "frame" offset —
    the plumbing shape of video frame-sampling (explode + per-frame
    features) without a codec."""
    return (
        df.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.expr(f"CAST((n_bytes - 1) DIV {every_n_bytes} AS INT)"),
                        F.lit(0),
                    ),
                )
            ).alias("frame_no"),
            "n_bytes",
        )
        .withColumn("frame_offset", (F.col("frame_no") * every_n_bytes).cast("long"))
        .select("doc_id", F.col("frame_no").cast("long").alias("frame_no"), "frame_offset")
    )
