"""Multimodal column handling (driver brief: image/audio/video as opaque
binary columns with typed metadata).

The Spark-side contract is real and tested: binary payload column + typed
metadata struct, Arrow-batched ``mapInPandas`` feature extraction with an
explicit output schema, and partition-preserving plumbing. The actual
codec step is STUBBED — image/audio libraries are not in this container —
behind ``decoder=`` hooks: the default ``header_features`` decoder is a
deterministic byte-level feature (so the pipeline is testable end-to-end
and oracle-checkable), and ``strict_decoder`` raises NotImplementedError
with a clear marker for the real PIL/torchaudio integration point.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamic_etl_spark.session import ensure_fanout_parallelism
from pyspark.sql import types as T

#: Feature vector length produced by the default header decoder.
HEADER_FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def header_features(payload: bytes) -> list[float]:
    """Deterministic stub 'decode': first HEADER_FEATURE_DIM bytes scaled
    to [0,1], zero-padded. Stands in for a real image/audio feature
    extractor while exercising the identical batch plumbing."""
    head = payload[:HEADER_FEATURE_DIM]
    feats = [b / 255.0 for b in head]
    feats += [0.0] * (HEADER_FEATURE_DIM - len(feats))
    return feats


def strict_decoder(payload: bytes) -> list[float]:
    """The real-codec integration point. STUB: media libraries are not
    available in this environment."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "container; plug a PIL/torchaudio-backed decoder in here"
    )


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = header_features,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over a media table with columns
    (doc_id long, media binary, media_type string).

    mapInPandas (not a scalar UDF) so the decoder sees whole Arrow record
    batches — the shape real codecs want — and can emit a different row
    count if a decode fails (rows are dropped, never nulled mid-schema).
    Partitioning of the input is preserved; no shuffle is introduced.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "media_type": [],
                "n_bytes": [],
                "features": [],
            }
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                if payload is None:
                    continue
                raw = bytes(payload)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(raw))
                out["features"].append(decoder(raw))
            yield pd.DataFrame(out)

    # decode work per row dwarfs a raw-byte shuffle; no-op when the
    # source is already well-split (session.ensure_fanout_parallelism)
    return ensure_fanout_parallelism(media).mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque media
    payload (the testdata ships no binary column; utf-8 bytes exercise the
    identical binary plumbing)."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
    )
