"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark-side plumbing is REAL (schemas, Arrow-batched mapInPandas pipelines,
partition sizing); the codec layer is STUBBED because no image/audio
libraries exist in this container: each decode function first tries the real
library (PIL/soundfile) and otherwise uses DETERMINISTIC FAKES derived from
the payload bytes — clearly marked, same output schema, so swapping in real
codecs changes no plan shape.

Design for 100 TB of media:
- payloads stay in `binary` columns; nothing ever collects to the driver;
- `mapInPandas` streams Arrow record batches through the Python worker —
  tune `spark.sql.execution.arrow.maxRecordsPerBatch` DOWN for large
  payloads (a 10 MB image at the default 10k rows/batch would be a 100 GB
  Arrow batch; `media_batch_conf` computes a sane value);
- feature extraction emits SMALL typed rows (never re-emit the payload) so
  downstream shuffles move features, not media;
- frame sampling is metadata-only arithmetic (no decode) and explodes to one
  row per frame JVM-side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, n_channels int, "
    "mean_luma double, sha256 string, decoder string"
)

AUDIO_FEATURES_SCHEMA = (
    "asset_id long, sample_rate int, duration_ms long, rms double, "
    "n_windows int, sha256 string, decoder string"
)

THUMBNAIL_SCHEMA = "asset_id long, width int, height int, thumb binary"


def media_batch_conf(avg_payload_bytes: int, target_batch_bytes: int = 1 << 28):
    """Arrow batch sizing for binary-heavy frames: rows per batch such that
    a batch stays near `target_batch_bytes` (default 256 MB)."""
    return max(1, target_batch_bytes // max(1, avg_payload_bytes))


def _fake_dims(digest: bytes) -> tuple[int, int, int]:
    # Deterministic fake: dimensions derived from the payload hash.
    w = 16 + digest[0] % 240
    h = 16 + digest[1] % 240
    ch = 1 if digest[2] % 4 == 0 else 3
    return w, h, ch


def image_features(assets: DataFrame) -> DataFrame:
    """Decode + feature-extract images: (asset_id, width, height, n_channels,
    mean_luma, sha256, decoder).

    STUB: without PIL the decode is a deterministic fake (hash-derived dims
    and luma); the mapInPandas shape, schema, and batch handling are real.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(data).digest()
                if _HAVE_PIL:  # pragma: no cover
                    raise NotImplementedError(
                        "real PIL decode path not exercised in this container"
                    )
                w, h, ch = _fake_dims(digest)
                luma = sum(digest[:16]) / (16 * 255.0)
                out.append(
                    (asset_id, w, h, ch, luma, digest.hex(), "fake-deterministic")
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "width", "height", "n_channels",
                    "mean_luma", "sha256", "decoder",
                ],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        fn, schema=IMAGE_FEATURES_SCHEMA
    )


def audio_features(assets: DataFrame, window_ms: int = 25) -> DataFrame:
    """Audio feature rows; STUB decode (deterministic RMS from payload hash),
    real windows-count arithmetic from metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.payload) if row.payload is not None else b""
                digest = hashlib.sha256(data).digest()
                # nullable integer columns surface as NaN floats in pandas
                dur = 0 if pd.isna(row.duration_ms) else int(row.duration_ms)
                sr = 16_000 if pd.isna(row.sample_rate) else int(row.sample_rate)
                rms = int.from_bytes(digest[:4], "big") / 0xFFFFFFFF
                out.append(
                    (row.asset_id, sr, dur, rms, max(0, dur // window_ms),
                     digest.hex(), "fake-deterministic")
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "sample_rate", "duration_ms", "rms",
                    "n_windows", "sha256", "decoder",
                ],
            )

    return assets.select(
        "asset_id", "payload", "duration_ms", "sample_rate"
    ).mapInPandas(fn, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Thumbnail pipeline; STUB: emits a deterministic pseudo-thumbnail
    (hash-expanded bytes of the target size), real batch plumbing."""

    nbytes = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                seed = hashlib.sha256(data).digest()
                buf = (seed * (nbytes // len(seed) + 1))[:nbytes]
                out.append((asset_id, width, height, buf))
            yield pd.DataFrame(
                out, columns=["asset_id", "width", "height", "thumb"]
            )

    return assets.select("asset_id", "payload").mapInPandas(
        fn, schema=THUMBNAIL_SCHEMA
    )


def sample_video_frames(
    assets: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """One row per sampled frame timestamp — metadata-only, fully JVM-side
    (sequence + explode); the actual frame decode would hang off this plan
    as a mapInPandas stage exactly like image_features."""
    n = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .select(
            "asset_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).cast("long").alias("frame_ts_ms"),
        )
    )
