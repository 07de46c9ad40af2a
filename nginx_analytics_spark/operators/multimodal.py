"""Multimodal column plumbing (SURVEY.md §7 M6).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; compute-heavy decode/featurize steps run as Arrow-batched
``mapInPandas`` (one Python worker per partition, vectorized over batches —
the only sanctioned Python path in this engine).

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (:func:`decode_image_stub` raises NotImplementedError;
:func:`byte_features` computes deterministic byte-level features instead).
The Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested, and the byte featurizer is deterministic enough
to be DuckDB-oracle-checked.

Scale: payload bytes never shuffle — featurization is a narrow
``mapInPandas`` over the scan, and downstream analytics carry only the
small feature columns. For real corpora, keep payloads in their own
parquet column chunk (they are here) so feature-only queries never read
them (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHECKSUM_MOD = 2**31

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def media_metadata(id_col: Column | str = "doc_id") -> Column:
    """Deterministic typed metadata for a payload (fixture stand-in for
    real width/height/duration extracted at ingest)."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.struct(
        F.lit("application/octet-stream").alias("mime"),
        (16 + i % 64).cast("int").alias("width"),
        (16 + (i * 7) % 64).cast("int").alias("height"),
        (i % 4 == 0).alias("keyframe"),
    )


def attach_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """documents -> multimodal shape: (id, payload binary, media struct).

    The fixture 'payload' is the UTF-8 text bytes — an opaque blob as far
    as every downstream operator is concerned.
    """
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        media_metadata(id_col).alias("media"),
    )


def byte_features(payloads: DataFrame) -> DataFrame:
    """Deterministic byte-level features via Arrow-batched ``mapInPandas``.

    The stand-in for decode+featurize: n_bytes, additive checksum
    (mod 2^31), mean byte value (6 dp). Vectorized numpy per batch — the
    real image/audio featurizer drops into this exact slot with the same
    batch shape.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            sums = pdf["payload"].map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
            )
            n = pdf["payload"].map(len)
            # floor(x*1e6+0.5)/1e6, not .round(6): pandas rounds half-even,
            # the engine convention (registry_dataops.r6) is portable half-up.
            mean_byte = np.floor(sums / n * 1_000_000 + 0.5) / 1_000_000
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "checksum": sums % CHECKSUM_MOD,
                    "mean_byte": mean_byte,
                }
            )

    return payloads.mapInPandas(featurize, FEATURE_SCHEMA)


def decode_image_stub(payloads: DataFrame) -> DataFrame:
    """Real image decode — STUB: the container ships no imaging library.

    On a real deployment, replace the body with (e.g.) PIL decode +
    resize/frame-sample inside the same ``mapInPandas`` slot as
    :func:`byte_features`. Kept as an explicit NotImplementedError so the
    capability gap is loud, not silent.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an imaging library (PIL/opencv); "
            "this environment ships none — use byte_features() for the "
            "deterministic fake-featurizer path"
        ) from exc
    raise NotImplementedError("wire the PIL decode kernel here")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
    ]
)

FRAME_LEN = 32
FRAME_STRIDE = 16
MAX_FRAMES = 8


def frame_samples(
    payloads: DataFrame,
    frame_len: int = FRAME_LEN,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Frame sampling over an opaque payload — the video-pipeline shape:
    one input row fans out to ≤ ``max_frames`` frame rows, each a
    fixed-length window at ``stride`` spacing (overlapping when
    stride < frame_len, exactly how video samplers overlap decode
    windows). A real decoder (pyav/opencv frame grab + CNN featurizer)
    drops into this same mapInPandas slot with the same fan-out schema;
    here the 'frame feature' is the deterministic byte checksum/mean so
    the whole fan-out is DuckDB-oracle-checked (`frame_features`).

    Only COMPLETE frames are emitted — a payload shorter than
    ``frame_len`` yields zero rows (the contract a fixed-shape feature
    extractor needs). Scale: narrow map, payload bytes never shuffle;
    the fan-out multiplies rows ≤ max_frames but each carries only the
    small feature columns."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, offs, sums, means = [], [], [], [], []
            for did, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(buf, dtype=np.uint8)
                for k in range(max_frames):
                    off = k * stride
                    if off + frame_len > len(arr):
                        break
                    w = arr[off : off + frame_len]
                    s = int(w.sum())
                    ids.append(did)
                    idxs.append(k)
                    offs.append(off)
                    sums.append(s % CHECKSUM_MOD)
                    means.append(
                        float(np.floor(s / frame_len * 1_000_000 + 0.5))
                        / 1_000_000
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return payloads.mapInPandas(sample, FRAME_SCHEMA)
