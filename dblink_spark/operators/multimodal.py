"""Multimodal column plumbing: media as opaque ``binary`` + typed metadata.

Beyond-reference family (training-data pipeline at 100 TB): image/audio/video
payloads are carried as an opaque ``binary`` column next to a typed metadata
struct, and every per-item media kernel (decode, feature extraction, resize,
frame sampling) runs as an Arrow-batched pandas iterator over
``mapInPandas`` — one Python worker per input partition, zero driver
involvement, batch size governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The *codec* step is deliberately stubbed: PIL / librosa / av are not
available in this container. ``decode_media`` therefore dispatches to

- a real decoder if one is importable (gated behind an import-try), else
- a **deterministic fake** that derives a stable "decoded signal" from the
  raw bytes (numpy ``frombuffer``), so the Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — is real and testable.

At scale this design holds: the binary column stays columnar in parquet
(no exploding into rows), kernels are narrow (no shuffle), and metadata
predicates (``media_meta.num_bytes < x``, ``media_meta.media_type = 'image'``)
are plain struct-field filters Catalyst pushes into the scan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore
except ImportError:  # pragma: no cover
    Image = None

MEDIA_TYPES = ("image", "audio", "video")

#: metadata carried beside every media payload
MEDIA_META_FIELDS = (
    "media_type string, num_bytes bigint, width int, height int, sample_rate int"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary media column from the ``documents``
    fixture (the container ships no true image/audio files).

    The payload is the UTF-8 encoding of ``text`` — opaque bytes as far as
    every downstream kernel is concerned — and ``media_type`` cycles
    deterministically by ``doc_id``. Metadata mirrors what a real ingest
    would record (dimensions for images, sample rate for audio).
    """
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )
    nb = F.octet_length("text").cast("bigint")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            mt.alias("media_type"),
            nb.alias("num_bytes"),
            F.when(mt == "image", (nb % 64 + 1).cast("int")).alias("width"),
            F.when(mt == "image", (nb % 48 + 1).cast("int")).alias("height"),
            F.when(mt == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        ).alias("media_meta"),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: raw bytes as a uint8 signal.

    NOTE: kernels must not capture this module-level function — closures
    that reference module attributes are cloudpickled *by reference* and
    the executor Python workers may not have this package on sys.path
    (the driver imports ``__spark_entry__`` by file path). Kernel defaults
    are therefore defined as nested functions, pickled by value."""
    return np.frombuffer(buf, dtype=np.uint8)


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    stats: bool = True,
) -> DataFrame:
    """Decode each payload and emit per-item signal statistics.

    ``decoder: bytes -> np.ndarray``; defaults to a real image decoder when
    PIL is importable, else the deterministic fake. Output schema:
    ``doc_id, media_type, n_samples bigint, byte_sum bigint, mean_level double``.

    Runs as ``mapInPandas`` so each Arrow batch is decoded in one Python
    call; the binary column never round-trips through the driver.
    """
    if decoder is None:
        if Image is not None:  # pragma: no cover - PIL absent here

            def decoder(buf: bytes) -> np.ndarray:
                import io

                return np.asarray(Image.open(io.BytesIO(buf)))

        else:
            # nested duplicate of _fake_decode: pickled by value (see note)
            def decoder(buf: bytes) -> np.ndarray:
                return np.frombuffer(buf, dtype=np.uint8)

    out_schema = (
        "doc_id bigint, media_type string, n_samples bigint, "
        "byte_sum bigint, mean_level double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                sig = decoder(bytes(buf)).astype(np.int64, copy=False).ravel()
                n = int(sig.size)
                s = int(sig.sum()) if n else 0
                rows.append(
                    (
                        int(doc_id),
                        meta["media_type"],
                        n,
                        s,
                        (s / n) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_samples",
                    "byte_sum",
                    "mean_level",
                ],
            )

    return df.mapInPandas(kernel, schema=out_schema)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Byte-histogram feature vector (``array<float>``, length ``dim``):
    bucket = byte value mod ``dim``, L1-normalized. A deterministic
    placeholder with the exact shape of a real embedding kernel
    (model inference would slot into the same ``mapInPandas`` body).

    Output: ``doc_id bigint, media_type string, features array<float>``.
    """
    out_schema = "doc_id bigint, media_type string, features array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mts, feats = [], [], []
            for doc_id, buf, meta in zip(
                pdf["doc_id"], pdf["media"], pdf["media_meta"]
            ):
                sig = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(sig % dim, minlength=dim).astype(np.float64)
                total = hist.sum()
                if total > 0:
                    hist /= total
                ids.append(int(doc_id))
                mts.append(meta["media_type"])
                feats.append(hist.astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": mts, "features": feats}
            )

    return df.mapInPandas(kernel, schema=out_schema)


def frame_sample(df: DataFrame, frame_size: int = 256, stride: int = 256) -> DataFrame:
    """Sample fixed-size frames from each payload (the video-keyframe /
    audio-window primitive): frames start at offsets ``0, stride, 2*stride…``
    and carry ``min(frame_size, remaining)`` bytes.

    Output: ``doc_id bigint, frames array<binary>, n_frames int``.
    Frames stay nested (no explode) so one item remains one row — at 100 TB
    exploding frames would multiply the shuffle width by frames-per-item.
    """
    if stride <= 0:
        raise ValueError("stride must be positive")
    out_schema = "doc_id bigint, frames array<binary>, n_frames int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames_col, counts = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(buf)
                frames = [
                    raw[off : off + frame_size]
                    for off in range(0, max(len(raw), 1), stride)
                    if off < len(raw)
                ] or [b""]
                ids.append(int(doc_id))
                frames_col.append(frames)
                counts.append(len(frames))
            yield pd.DataFrame(
                {"doc_id": ids, "frames": frames_col, "n_frames": counts}
            )

    return df.mapInPandas(kernel, schema=out_schema)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize each image payload to ``width × height``.

    With PIL present this decodes and resamples; in this container it uses
    the deterministic fake: the byte signal is index-resampled onto a
    ``height × width`` grid (nearest-neighbor on the flat byte array), which
    preserves the real kernel's contract — fixed-size output per row.

    Output: ``doc_id bigint, pixels binary, width int, height int``.
    """
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    n_out = width * height
    out_schema = "doc_id bigint, pixels binary, width int, height int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pix = [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if Image is not None:  # pragma: no cover - PIL absent here
                    raise NotImplementedError(
                        "real image resize requires wiring a codec; "
                        "this container has no imaging libraries"
                    )
                sig = np.frombuffer(bytes(buf), dtype=np.uint8)
                if sig.size == 0:
                    out = np.zeros(n_out, dtype=np.uint8)
                else:
                    idx = (np.arange(n_out) * sig.size) // n_out
                    out = sig[idx]
                ids.append(int(doc_id))
                pix.append(out.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "pixels": pix,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                }
            )

    return df.mapInPandas(kernel, schema=out_schema)
