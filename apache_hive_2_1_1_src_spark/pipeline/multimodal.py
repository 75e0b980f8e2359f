"""Multimodal column plumbing: opaque binary blobs + typed metadata.

The container has no image/audio decode libraries, so the decode kernel is
STUBBED (deterministic fake features, clearly marked); everything
Spark-side — the binary column, the metadata struct schema, Arrow batch
shape through mapInPandas, partition-size control — is real and tested.

At 100 TB the pattern is: blobs live in parquet binary columns (or object
storage with a path column), metadata travels as a struct, and per-blob
compute runs in mapInPandas so Arrow moves whole batches; repartition by
size class first so a batch of 4K images and a batch of 4MB videos don't
share an executor memory budget.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Metadata struct carried alongside every blob (thrift FieldSchema-style
#: typed columns, not a stringly map).
BLOB_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("magic_hex", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("byte_checksum", LongType()),
    ]
)


def with_blob_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a binary column from text (the driver's tables carry no
    real media; encode(text) stands in for image bytes) plus a typed
    metadata struct — the schema a real ingest would produce."""
    blob = F.encode(F.col(text_col), "UTF-8").cast(BinaryType())
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(blob).cast("long").alias("n_bytes"),
            F.hex(F.substring(blob, 1, 4)).alias("magic_hex"),
        ).alias("meta"),
    )


def decode_blobs(blobs: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched decode over mapInPandas.

    The real decode (`PIL.Image.open`, `torchaudio.load`, ...) is gated
    behind an import-try; absent those libs this emits deterministic fake
    features so the distributed plumbing (schema, batching, partitioning)
    stays testable.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real decoder path — not available in this container
            import PIL.Image  # noqa: F401

            have_decoder = True
        except ImportError:
            have_decoder = False

        for pdf in batches:
            if have_decoder:
                # Real path would decode pdf["blob"] via PIL here.
                raise NotImplementedError(
                    "real image decode present but intentionally unused in tests"
                )
            blobs_col = pdf["blob"]
            n_bytes = blobs_col.map(len).astype("int64")
            checksum = blobs_col.map(lambda b: sum(b) % (1 << 31)).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    # fake geometry derived deterministically from content
                    "fake_width": (checksum % 640 + 1).astype("int32"),
                    "fake_height": (checksum % 480 + 1).astype("int32"),
                    "byte_checksum": checksum,
                }
            )

    return blobs.mapInPandas(decode_batches, schema=DECODED_SCHEMA)
