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
    ArrayType,
    BinaryType,
    DoubleType,
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
    metadata struct — the schema a real ingest would produce.

    ASCII assumption (load-bearing for p36's oracle): byte-arithmetic
    oracles equate character positions in ``text`` with byte offsets in
    the blob, which holds only while the synthetic corpus is pure ASCII
    (1 char == 1 byte).  tests/test_pipeline_invariants.py pins
    length(text) == octet_length(encode(text)) over every documents
    table so a multi-byte corpus change fails loudly instead of silently
    desynchronizing frame boundaries."""
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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("n_frame_bytes", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("n_bytes_out", IntegerType()),
        StructField("resized_md5", StringType()),
    ]
)


def sample_frames(
    blobs: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
    max_frames: int = 8,
    fps: int = 25,
) -> DataFrame:
    """Frame sampling over a binary "video" column via mapInPandas.

    A real deployment decodes containers (mp4 → keyframes) with PyAV; this
    container has no codec libs, so a frame is DEFINED as a fixed-size
    byte window (frame_bytes) and sampling takes every ``every_n``-th
    window up to ``max_frames`` — deterministic, so the whole Arrow/UDF
    path is verified against a byte-slicing SQL oracle.  The shape is the
    real thing: one input row fans out to N output rows inside the Pandas
    iterator, Arrow moves whole batches, and nothing touches the driver.
    """
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step_ms = 1000 * every_n // fps
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in FRAME_SCHEMA}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(blob)
                n_full = len(b) // frame_bytes
                for k, fi in enumerate(range(0, n_full, every_n)):
                    if k >= max_frames:
                        break
                    fr = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(fi)
                    out["ts_ms"].append(k * step_ms)
                    out["n_frame_bytes"].append(len(fr))
                    # md5 over the lowercase hex encoding (not raw bytes):
                    # keeps the fingerprint SQL-expressible cross-engine
                    out["frame_md5"].append(
                        hashlib.md5(fr.hex().encode()).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "int32",
                    "ts_ms": "int64",
                    "n_frame_bytes": "int32",
                    "frame_md5": "object",
                }
            )

    return blobs.mapInPandas(frames, schema=FRAME_SCHEMA)


def resize_images(
    blobs: DataFrame, out_w: int = 16, out_h: int = 8
) -> DataFrame:
    """Resize kernel over mapInPandas — the PIL path is gated behind an
    import-try (absent here); the stub "resize" tiles the source bytes to
    exactly out_w*out_h bytes (cycle-truncate), deterministic so the
    Arrow/UDF plumbing is oracle-checked end to end."""
    import hashlib

    target = out_w * out_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes, md5s = [], []
            for blob in pdf["blob"]:
                b = bytes(blob)
                if not b:
                    sizes.append(0)
                    md5s.append(hashlib.md5(b"").hexdigest())
                    continue
                reps = -(-target // len(b))  # ceil
                rb = (b * reps)[:target]
                sizes.append(len(rb))
                md5s.append(hashlib.md5(rb.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_out": pd.Series(sizes, dtype="int32"),
                    "resized_md5": md5s,
                }
            ).astype({"out_w": "int32", "out_h": "int32"})

    return blobs.mapInPandas(resize, schema=RESIZED_SCHEMA)


EMBED_DIM = 8

EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def extract_embeddings(blobs: DataFrame) -> DataFrame:
    """Feature-extraction kernel over mapInPandas: blob → fixed-dim
    embedding vector.  The real model (CLIP/wav2vec) is gated behind an
    import-try; the stub derives 8 doubles from the md5 of the payload
    (4 hex chars each, scaled to [0,1]) — deterministic, so the Python
    path is verified against a SQL oracle, and the output column is the
    same array<double> shape the ANN operators consume."""
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real extractor path — absent in this container
            import torch  # noqa: F401

            have_model = True
        except ImportError:
            have_model = False
        for pdf in batches:
            embs = []
            for blob in pdf["blob"]:
                if have_model:
                    raise NotImplementedError(
                        "model extractor present but intentionally unused in tests"
                    )
                h = hashlib.md5(bytes(blob)).hexdigest()
                embs.append(
                    [int(h[4 * i : 4 * i + 4], 16) / 65535.0 for i in range(EMBED_DIM)]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": embs}
            )

    return blobs.mapInPandas(extract, schema=EMBED_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
    ]
)


def audio_frame_energy(
    blobs: DataFrame, frame_samples: int = 64, max_frames: int = 6
) -> DataFrame:
    """Audio feature extraction over a binary "waveform" column via
    mapInPandas — completes the modality quartet (video=p28 frame
    sampling, image=p29 resize, embedding=p32 extract, audio=here).

    A real deployment decodes containers (wav/flac → PCM) with
    torchaudio/soundfile; this container has no audio libs, so the blob
    bytes ARE the 8-bit PCM samples (deterministic, so the whole
    Arrow/UDF path is verified against a byte-arithmetic SQL oracle).
    Per non-overlapping ``frame_samples``-sample frame: RMS energy and
    peak amplitude — the framing/windowed-aggregate shape every audio
    featurizer (VAD, loudness normalization, silence trim) runs.

    One input row fans out to ≤ ``max_frames`` rows inside the Pandas
    iterator; Arrow moves whole batches; nothing touches the driver.
    """
    import math

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # real decoder path — absent in this container
            import soundfile  # noqa: F401

            have_audio = True
        except ImportError:
            have_audio = False
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_FRAME_SCHEMA}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if have_audio:
                    raise NotImplementedError(
                        "real audio decode present but intentionally unused"
                    )
                b = bytes(blob)
                n_full = min(len(b) // frame_samples, max_frames)
                for j in range(n_full):
                    fr = b[j * frame_samples : (j + 1) * frame_samples]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(j)
                    out["n_samples"].append(len(fr))
                    # no rounding here: Python round() is banker's, SQL
                    # ROUND is half-up — callers round via F.round
                    out["rms"].append(math.sqrt(sum(v * v for v in fr) / len(fr)))
                    out["peak"].append(max(fr))
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "int32",
                    "n_samples": "int32",
                    "rms": "float64",
                    "peak": "int32",
                }
            )

    return blobs.mapInPandas(energy, schema=AUDIO_FRAME_SCHEMA)


def decode_blobs_arrow(blobs: DataFrame) -> DataFrame:
    """Zero-copy Arrow-native decode over ``mapInArrow`` — the
    lower-level sibling of :func:`decode_blobs` (mapInPandas): batches
    arrive as ``pyarrow.RecordBatch`` with the binary column as an
    Arrow buffer, skipping the pandas conversion entirely — the right
    shape when the decoder consumes raw buffers (image/audio codecs)
    and per-batch pandas materialization is pure overhead.

    Emits the same deterministic fake features as decode_blobs, so both
    decode paths share one oracle and must agree bit-for-bit
    (pytest-pinned): same schema, same values, different transport.
    """
    import pyarrow as pa

    def decode_batches(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id")
            blobs_col = batch.column("blob")
            n_bytes, checksum = [], []
            for buf in blobs_col:
                b = buf.as_py()
                n_bytes.append(len(b))
                checksum.append(sum(b) % (1 << 31))
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids.cast(pa.int64()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array([c % 640 + 1 for c in checksum], pa.int32()),
                    pa.array([c % 480 + 1 for c in checksum], pa.int32()),
                    pa.array(checksum, pa.int64()),
                ],
                names=[
                    "doc_id",
                    "n_bytes",
                    "fake_width",
                    "fake_height",
                    "byte_checksum",
                ],
            )

    return blobs.mapInArrow(decode_batches, schema=DECODED_SCHEMA)
