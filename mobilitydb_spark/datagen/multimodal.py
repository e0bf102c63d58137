"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake decoder) — but everything
Spark-side is real and tested: schemas, Arrow batch shapes,
mapInPandas iterator structure, partition-size control for large
binaries, and the metadata-extraction contract.  Swapping the stub
for Pillow/librosa/ffmpeg is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "mime string, width int, height int, duration_ms int")

FEATURE_SCHEMA = ("media_id bigint, kind string, feat array<float>, "
                  "n_frames int, decode_ok boolean")


def fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            kinds = np.where(ids % 3 == 0, "image",
                             np.where(ids % 3 == 1, "audio", "video"))
            rows = []
            for i, kind in zip(ids, kinds):
                rng = np.random.default_rng(int(i) + 1000)
                payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
                rows.append((int(i), str(kind), payload,
                             f"application/x-fake-{kind}",
                             64, 64, 1000 * (int(i) % 10 + 1)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height",
                "duration_ms"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB DECODER — the container has no image/audio libraries.

    Deterministic fake: interprets payload bytes as the "decoded"
    sample array.  Replace with e.g. PIL.Image.open / soundfile.read;
    the calling batch plumbing does not change.

    float64 samples so the downstream pooling is a plain IEEE double
    left fold — bit-replicable by the SQL oracle (per-element
    ord/255.0 then sequential sum), with the float32 quantization
    happening once at the feature boundary.
    """
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return arr / 255.0


def extract_features(media: DataFrame, n_dims: int = 16,
                     frame_sample: int = 4) -> DataFrame:
    """Decode → frame-sample → pooled feature vector, one Arrow batch
    at a time.  Real plumbing: per-batch vectorized pooling, stable
    output schema, per-row decode_ok flag instead of task failure."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # decode is inherently per-item; iterate with zip (iterrows
            # materializes a Series per row — the slowest pandas path)
            # and batch the pooling per item with vectorized numpy
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                try:
                    samples = _decode_stub(bytes(payload), kind)
                    # frame-sample: split into frame_sample chunks,
                    # mean-pool each via a STRICT sequential left fold
                    # (np.cumsum) — np.add.reduceat sums pairwise and
                    # would drift a few ULPs from the SQL oracle's
                    # sequential list_sum
                    edges = np.linspace(0, len(samples), frame_sample + 1,
                                        dtype=np.int64)
                    pooled = np.array([
                        np.cumsum(samples[a:b])[-1] / (b - a)
                        for a, b in zip(edges[:-1], edges[1:])])
                    feat = np.resize(pooled, n_dims).astype(np.float32)
                    out.append((mid, kind, feat.tolist(),
                                frame_sample, True))
                except Exception:
                    out.append((mid, kind, [0.0] * n_dims, 0, False))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "feat", "n_frames", "decode_ok"])

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = ("media_id bigint, kind string, payload binary, "
                  "width int, height int, decode_ok boolean")


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8
                  ) -> DataFrame:
    """Decode → area-resize → re-encode, one Arrow batch at a time
    (the image-normalization stage of a multimodal training-data
    pipeline).  The decode/encode endpoints use the deterministic
    stub (no codecs in the container); the batch plumbing — integer
    block mean-pool, dtype round-trip, per-row error flag, metadata
    update — is real and tested."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload, w, h in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"],
                    pdf["width"], pdf["height"]):
                try:
                    px = _decode_stub(bytes(payload), kind)
                    img = np.resize(px, int(w) * int(h)) \
                        .reshape(int(h), int(w))
                    # exact area pooling on integer factors; fall back
                    # to nearest sampling otherwise
                    if h % out_h == 0 and w % out_w == 0:
                        small = img.reshape(out_h, h // out_h,
                                            out_w, w // out_w) \
                            .mean(axis=(1, 3))
                    else:
                        yi = (np.arange(out_h) * h // out_h)
                        xi = (np.arange(out_w) * w // out_w)
                        small = img[np.ix_(yi, xi)]
                    enc = np.clip(small * 255.0, 0, 255) \
                        .astype(np.uint8).tobytes()
                    out.append((mid, kind, enc, out_w, out_h, True))
                except Exception:
                    out.append((mid, kind, b"", 0, 0, False))
            yield pd.DataFrame(out, columns=[
                "media_id", "kind", "payload", "width", "height",
                "decode_ok"])

    return media.mapInPandas(kernel, RESIZED_SCHEMA)
