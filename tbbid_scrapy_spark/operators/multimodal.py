"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``
stages.

The decode kernels themselves are STUBBED (this container ships no
PIL/ffmpeg/torchaudio — see ``decode_media``'s ``backend`` switch): the
'fake' backend is a deterministic parser of our own synthetic byte
format so the Spark-side contract — schema, partitioning, UDF signature,
Arrow batch shape — is real and fully tested, and swapping in a real
decoder is a one-function change.

Synthetic byte format (fake backend): 16-byte header
  magic(4) | width(4, big-endian) | height(4) | duration_ms(4)
followed by arbitrary payload bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"TBSM"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload_bytes", T.IntegerType(), True),
    ]
)


def fake_media_bytes(media_id: int, kind: str) -> bytes:
    """Deterministic synthetic media blob (seeded by id)."""
    w = 64 + (media_id * 37) % 960
    h = 64 + (media_id * 53) % 540
    dur = 0 if kind == "image" else 1000 + (media_id * 97) % 60_000
    payload = bytes((media_id * (i + 7)) % 256 for i in range(32))
    return MAGIC + struct.pack(">III", w, h, dur) + payload


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """n fake media rows, generated distributedly (spark.range — no
    driver-side byte buffers) via a vectorized construction UDF."""
    kinds = ["image", "audio", "video"]

    @F.pandas_udf(T.BinaryType())
    def gen_bytes(ids: pd.Series, kind: pd.Series) -> pd.Series:
        return pd.Series(
            [fake_media_bytes(int(i), k) for i, k in zip(ids, kind)], dtype="object"
        )

    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.concat(F.lit("doc_"), (F.col("id") % 10).cast("string")).alias("doc_id"),
        F.format_string("https://static.example.org/m/%d", "id").alias("media_ref"),
        F.element_at(
            F.array(*[F.lit(k) for k in kinds]), (F.col("id") % 3 + 1).cast("int")
        ).alias("kind"),
    )
    return base.withColumn("content", gen_bytes(F.col("media_id"), F.col("kind"))).withColumn(
        "mime",
        F.when(F.col("kind") == "image", "image/x-tbsm")
        .when(F.col("kind") == "audio", "audio/x-tbsm")
        .otherwise("video/x-tbsm"),
    )


def decode_media(df: DataFrame, backend: str = "fake") -> DataFrame:
    """mapInPandas decode stage: binary content → typed metadata columns.

    backend='fake' parses the synthetic header (deterministic, tested);
    backend='pil'/'ffmpeg' raise NotImplementedError until the libs exist
    in the runtime — the call-site contract is identical.
    """
    if backend != "fake":
        raise NotImplementedError(
            f"decode backend '{backend}' needs real media libraries "
            "(PIL/ffmpeg) not present in this environment; use 'fake'"
        )

    # the batch kernel is numpy-vectorized end to end — the shape a real
    # decoder swap-in must follow: the whole binary column is rebuilt as
    # ONE contiguous Arrow buffer (pa.array — a single memcpy; in a real
    # Arrow-native flow the column already arrives contiguous and even
    # that copy disappears), headers are gathered by fancy-indexing the
    # byte buffer at the offsets, and ALL parsing/validation runs as
    # whole-batch numpy ops — zero per-row Python, not even a slice.
    # The 16-byte header is 4 big-endian u32s: magic | width | height |
    # duration_ms.
    import pyarrow as pa

    magic_u32 = int.from_bytes(MAGIC, "big")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            n = len(content)
            # large_binary: 64-bit offsets — a batch can't overflow the
            # offsets buffer no matter how big its payload total is
            arr = pa.array(content, type=pa.large_binary())
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)
            lens = offs[1:] - offs[:-1]
            if arr.null_count:
                nulls = arr.is_null().to_numpy(zero_copy_only=False)
                lens = np.where(nulls, -1, lens)
            has_hdr = lens >= 16
            widths = np.full(n, np.nan)
            heights = np.full(n, np.nan)
            durs = np.full(n, np.nan)
            payloads = np.full(n, np.nan)
            if has_hdr.any():
                data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                starts = offs[:-1][has_hdr]
                hdr = data[starts[:, None] + np.arange(16)]
                quads = np.ascontiguousarray(hdr).view(">u4").reshape(-1, 4)
                # validity = magic match AND every u32 field representable
                # in the Int32 output columns: one corrupt/adversarial
                # header with width/height/duration ≥ 2^31 must decode as
                # NULL metadata, not raise inside the pandas cast and
                # kill the whole Arrow batch (same one-bad-row-kills-the-
                # stage class _band_sigs_pd hardens against)
                good = (quads[:, 0] == magic_u32) & (
                    quads[:, 1:] <= np.iinfo(np.int32).max
                ).all(axis=1)
                ok = np.zeros(n, dtype=bool)
                ok[has_hdr] = good
                widths[ok] = quads[good, 1]
                heights[ok] = quads[good, 2]
                durs[ok] = quads[good, 3]
                payloads[ok] = lens[ok] - 16
            m = pd.DataFrame(
                {
                    "width": pd.Series(widths).astype("Int32"),
                    "height": pd.Series(heights).astype("Int32"),
                    "duration_ms": pd.Series(durs).astype("Int32"),
                    "payload_bytes": pd.Series(payloads).astype("Int32"),
                }
            )
            yield pd.concat([pdf.reset_index(drop=True), m], axis=1)

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side (pure expressions);
    the pixel transform itself is the stubbed decode's job. Output keeps
    the binary column untouched (fake backend has no pixels to resize)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return df.withColumns(
        {
            "target_width": F.ceil(F.col("width") * scale).cast("int"),
            "target_height": F.ceil(F.col("height") * scale).cast("int"),
        }
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (sequence+explode — the 1:N shape of real frame extraction;
    the frame decode itself is behind the stubbed backend)."""
    vids = df.filter(F.col("kind") == "video")
    return vids.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
    )


FEATURE_DIM = 8


def media_features(df: DataFrame) -> DataFrame:
    """Deterministic feature extraction (bytes folded mod FEATURE_DIM →
    unit vector): the embedding-shaped output real models would produce.
    The kernel is whole-batch numpy — all payloads of an Arrow batch are
    concatenated into ONE buffer (per-row Python is only the O(1)
    ``bytes()`` view), and every row's feature vector is computed by a
    single ``np.bincount`` over ``row_id·DIM + (pos-within-row mod
    DIM)``, followed by one vectorized row normalization. Feature j of a
    row = sum of its payload bytes at positions ≡ j (mod FEATURE_DIM) —
    identical to reshaping the zero-padded payload to (-1, DIM) and
    summing axis 0, with zero per-row loops."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def feats(content: pd.Series) -> pd.Series:
        n = len(content)
        if n == 0:
            return pd.Series([], dtype=object)
        vals = content.to_numpy()
        lens = np.fromiter(
            (len(b) if b is not None else -1 for b in vals),
            dtype=np.int64, count=n,
        )
        valid = lens >= 0
        if not valid.any():
            return pd.Series([None] * n, dtype=object)
        vlens = lens[valid]
        allb = np.frombuffer(
            b"".join(bytes(b) for b in vals[valid]), dtype=np.uint8
        )
        row_id = np.repeat(np.arange(len(vlens)), vlens)
        starts = np.concatenate(([0], np.cumsum(vlens)[:-1]))
        pos = np.arange(len(allb)) - np.repeat(starts, vlens)
        flat = row_id * FEATURE_DIM + pos % FEATURE_DIM
        sums = np.bincount(
            flat, weights=allb, minlength=len(vlens) * FEATURE_DIM
        ).reshape(len(vlens), FEATURE_DIM)
        norms = np.linalg.norm(sums, axis=1)
        unit = (sums / np.where(norms == 0, 1.0, norms)[:, None]).astype(
            np.float32
        )
        # one list object per row is the Arrow list-column output
        # contract; everything above is whole-batch numpy
        vec_iter = iter(unit.tolist())
        return pd.Series(
            [next(vec_iter) if v else None for v in valid], dtype=object
        )

    return df.withColumn("features", feats(F.col("content")))
