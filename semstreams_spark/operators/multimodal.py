"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The decode step itself needs codec libraries that are NOT in this
runtime (PIL/ffmpeg/torchaudio) — those calls are stubbed behind
``decode_available()`` with a deterministic fake, but everything
Spark-side is real and tested: schema, partition-friendly layout, Arrow
batch shapes, ``mapInPandas`` UDF signatures, and the
feature-extraction pipeline over binary columns.

Layout contract for a 100 TB media table:
  (media_id long, kind string ∈ {image,audio,video}, media binary,
   meta struct<width int, height int, sample_rate int, n_frames int,
   codec string>, ts timestamp)
binary payloads dominate size → partition by ingest hour, keep metadata
in columnar form so Catalyst prunes `media` entirely for metadata-only
queries (check ReadSchema in .explain).
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>, "
    "ts timestamp"
)


def decode_available() -> bool:
    """True when real codec libraries are importable (not in this image)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: seed from content hash →
    pseudo-pixels. Keeps the whole pipeline testable without codecs; the
    REAL decode drops in by replacing this one function."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_image_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """media table → (media_id, mean_r, mean_g, mean_b, brightness,
    phash string) via Arrow-batched mapInPandas.

    Real Spark plumbing: binary column travels as Arrow binary; each
    batch decodes vectorized; output is a narrow numeric frame. Decode is
    the stub unless codecs exist (decode_available()).
    """
    if decode_available():  # pragma: no cover - not in this image
        raise NotImplementedError("real decode path: swap _fake_decode for PIL")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["media"], pdf["meta"]):
                w = int(meta["width"] or 8)
                h = int(meta["height"] or 8)
                px = _fake_decode(bytes(payload), w, h).astype(np.float64)
                means = px.mean(axis=(0, 1))
                # 64-bit average-hash fingerprint over an 8x8 downsample
                small = px.mean(axis=2)[:: max(1, h // 8), :: max(1, w // 8)][:8, :8]
                bits = (small > small.mean()).flatten()
                phash = "".join("1" if b else "0" for b in bits)
                rows.append((mid, means[0], means[1], means[2], px.mean(), phash))
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_r", "mean_g", "mean_b", "brightness", "phash"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        gen,
        schema="media_id long, mean_r double, mean_g double, mean_b double, brightness double, phash string",
    )


def sample_video_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling plan for video rows: emits (media_id, frame_idx)
    rows JVM-side (sequence+explode); the per-frame decode hangs off this
    with the same stub/real split as images."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_nth))
        ).alias("frame_idx"),
        "ts",
    )


def synth_wav_bytes(i: int) -> tuple[bytes, int, int]:
    """Deterministic mono 16-bit PCM WAV for synthetic media row i:
    sample_rate = 8000·(1 + (i%9)//3), n_frames = 400 + (i%5)·80,
    sample j = ((i·131 + j·197) mod 65536) − 32768. Returns
    (wav_bytes, sample_rate, n_frames); the standard PCM header is 44
    bytes, so len(wav_bytes) == 44 + 2·n_frames — the analytic contract
    the media gates' oracles recompute."""
    import io
    import wave

    rate = 8000 * (1 + (i % 9) // 3)
    n_frames = 400 + (i % 5) * 80
    samples = bytearray()
    for j in range(n_frames):
        v = ((i * 131 + j * 197) % 65536) - 32768
        samples += int(v).to_bytes(2, "little", signed=True)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(samples))
    return buf.getvalue(), rate, n_frames


def decode_wav_features(media: DataFrame, batch_hint: int = 64) -> DataFrame:
    """REAL audio decode over binary WAV payloads (stdlib ``wave`` — no
    external codec needed): audio rows → (media_id, sample_rate,
    n_channels, sampwidth, n_frames, duration_ms, sum_samples) via
    Arrow-batched mapInPandas. All outputs are exact integers (duration
    truncated to ms; sum of int16 samples as int64), so the gate has an
    analytic DuckDB oracle over the generator contract.

    This is the drop-in shape for other codecs: same plan (binary column
    through Arrow, narrow numeric frame out), different decoder inside
    the batch loop."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    rate = w.getframerate()
                    nch = w.getnchannels()
                    width = w.getsampwidth()
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                samples = np.frombuffer(raw, dtype=np.int16)
                rows.append(
                    (
                        mid,
                        rate,
                        nch,
                        width,
                        nf,
                        nf * 1000 // rate,
                        int(samples.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "sampwidth",
                    "n_frames",
                    "duration_ms",
                    "sum_samples",
                ],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        gen,
        schema=(
            "media_id long, sample_rate int, n_channels int, sampwidth int, "
            "n_frames int, duration_ms long, sum_samples long"
        ),
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read the binary column (column
    pruning; verify via .explain ReadSchema)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.sample_rate").alias("avg_sample_rate"),
        F.sum(F.length("media")).alias("total_bytes"),
    )


def synthesize_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payloads
    derived from the row id; no external data). Audio rows carry REAL
    decodable WAV bytes (synth_wav_bytes contract); image/video payloads
    stay opaque hash bytes (their codecs aren't in this runtime)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    base_ts = dt.datetime(2025, 1, 1)
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "audio":
            payload, rate, n_frames = synth_wav_bytes(i)
        else:
            payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 4)
            rate, n_frames = None, None
        meta = {
            "width": int(8 + (i % 4) * 8) if kind == "image" else None,
            "height": int(8 + (i % 3) * 8) if kind == "image" else None,
            "sample_rate": rate,
            "n_frames": n_frames if kind == "audio" else (int(30 + i) if kind == "video" else None),
            "codec": {"image": "png", "audio": "wav", "video": "h264"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta, base_ts + dt.timedelta(seconds=i)))
    _ = rng
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
