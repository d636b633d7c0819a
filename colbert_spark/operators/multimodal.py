"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct. The
Spark-side contract (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested; the actual media DECODE is stubbed — the
sandbox ships no image/audio libraries (see decode_image). A production
deployment swaps `_decode_stub` for a Pillow/ffmpeg call without touching
any plan shape.

Batch-size note for 100 TB: binary payloads make Arrow batches heavy —
`spark.sql.execution.arrow.maxRecordsPerBatch` and
`spark.sql.files.maxPartitionBytes` must be sized for payload bytes, not
row counts (a 10 MB image at the default 10k rows/batch = 100 GB batches).
mapInPandas streams batch-by-batch, so per-task memory stays bounded by
one batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_checksum long, width int, height int, "
    "decoded boolean"
)


def attach_blob(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake payload: the utf-8 bytes of text stand in for an
    encoded image. Keeps every downstream op runnable and oracle-checkable."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )


def decode_image(blob: bytes) -> "np.ndarray":
    """REAL decode is out of sandbox scope (no Pillow/libjpeg here).

    Raises NotImplementedError by design; extract_features uses the
    deterministic stub instead so plumbing stays testable.
    """
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "environment; wire Pillow/torchvision here in production"
    )


def _decode_stub(blob: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derive a (width, height) from the bytes."""
    n = len(blob)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(blobs: DataFrame, id_col: str = "doc_id",
                     blob_col: str = "blob") -> DataFrame:
    """binary column → typed feature rows via Arrow-batched mapInPandas.

    Features are cheap deterministic stand-ins (length, checksum, stub
    dims); the signature/batching is exactly what a real decoder needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            blobs_np = pdf[blob_col]
            n_bytes = np.fromiter((len(b) for b in blobs_np), dtype=np.int64,
                                  count=len(blobs_np))
            checksum = np.fromiter(
                (int(np.frombuffer(bytes(b), dtype=np.uint8).sum()) for b in blobs_np),
                dtype=np.int64, count=len(blobs_np),
            )
            dims = [_decode_stub(bytes(b)) for b in blobs_np]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": n_bytes,
                    "byte_checksum": checksum,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "decoded": False,  # stub decode — flips true in production
                }
            )

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, blob binary, width int, height int"

FRAME_SCHEMA = "doc_id long, frame_idx long, ts_ms long, frame binary"


def resize_images(blobs: DataFrame, width: int, height: int,
                  id_col: str = "doc_id", blob_col: str = "blob"
                  ) -> DataFrame:
    """Image resize plumbing: one mapInPandas pass, binary in → binary out
    at the requested dimensions. The RESIZE ITSELF is a deterministic stub
    (payload truncated/right-padded to width·height bytes — a 1-byte-per-
    pixel stand-in); production swaps the inner loop for Pillow's
    `Image.resize` without touching schema, batching, or the plan."""

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                raw = bytes(b)
                out.append(raw[:target].ljust(target, b"\0"))
            yield pd.DataFrame({
                "doc_id": pdf[id_col].to_numpy(),
                "blob": out,
                "width": width,
                "height": height,
            })

    return blobs.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(videos: DataFrame, every_nth: int = 10,
                  frame_bytes: int = 256, fps: int = 30,
                  id_col: str = "doc_id", blob_col: str = "blob"
                  ) -> DataFrame:
    """Video frame-sampling plumbing: one input row explodes into many
    (doc_id, frame_idx, ts_ms, frame) rows inside mapInPandas — the real
    contract a decoder needs (row explosion, bounded batches, typed
    output). The CONTAINER PARSE is a deterministic stub (payload chopped
    into fixed-size pseudo-frames, every_nth kept, timestamps from a
    nominal fps); production swaps the chopper for ffmpeg/pyav keyframe
    extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(b)
                n_frames = max(len(raw) // frame_bytes, 1)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 1000 // fps)
                    frames.append(raw[i * frame_bytes:(i + 1) * frame_bytes])
            if ids:
                yield pd.DataFrame({
                    "doc_id": ids, "frame_idx": idxs,
                    "ts_ms": tss, "frame": frames,
                })

    return videos.mapInPandas(run, schema=FRAME_SCHEMA)
