"""Multimodal (image/audio/video) column plumbing.

North-star operators (SURVEY §2.3): media payloads ride through the
engine as opaque ``binary`` columns with typed metadata — the pattern a
100 TB training-data pipeline needs: parquet stores the bytes, Spark
moves them, and decode/feature-extraction runs as Arrow-batched
``mapInPandas`` stages so the payload never round-trips through
driver-side Python.

The decode itself is STUBBED: image/audio libraries are not available
in this environment, so :func:`decode_metadata` computes a
*deterministic fake* decode (dimensions derived from a content hash)
and the real-library path raises ``NotImplementedError`` until PIL /
soundfile are installed. Everything around the stub — schema contract,
binary column handling, batch iteration shape, partition sizing — is
real and tested, and the fake is hash-deterministic so the whole
pipeline is still oracle-checkable end-to-end.

Scale notes: media rows are fat (MBs); the mapInPandas stages set no
per-group boundary (pure per-row map → no shuffle at all), and callers
should keep ``spark.sql.files.maxPartitionBytes`` at its default so a
task holds O(100) media rows, not O(100k). Feature outputs are narrow
(metadata + small vectors), so everything downstream of decode shuffles
cheap columns only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic-fake dimension ranges (documented contract of the stub)
_DIM_MOD = 577
_FRAME_MOD = 24

METADATA_SCHEMA = (
    "media_id long, media_type string, n_bytes long, content_md5 string, "
    "width int, height int, n_frames int"
)


def media_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fixture builder: wrap a text corpus as a media table
    ``(media_id, media_type, content: binary)``.

    In production the binary column comes straight from
    ``spark.read.format("binaryFile")`` or parquet with BYTE_ARRAY —
    this builder exists so the multimodal plumbing has a deterministic
    testdata-derived input.
    """
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def _fake_decode(media_type: str, content: bytes) -> tuple[str, int, int, int]:
    """Deterministic fake decode: (md5_hex, width, height, n_frames).

    Dimensions are pseudo-random functions of the content hash — stable
    across engines and runs, so tests and oracles can pin exact values.
    """
    md5_hex = hashlib.md5(content).hexdigest()
    h = int(md5_hex[:15], 16)
    width = 64 + h % _DIM_MOD
    height = 64 + (h // _DIM_MOD) % _DIM_MOD
    n_frames = 1 + h % _FRAME_MOD if media_type == "video" else 1
    return md5_hex, width, height, n_frames


def _real_decode(media_type: str, content: bytes):  # pragma: no cover
    """The production decode path. Requires PIL / soundfile / av —
    not installed in this environment."""
    raise NotImplementedError(
        "Real media decoding requires PIL/soundfile/av; this environment "
        "ships none of them. The deterministic fake decode exercises the "
        "full Spark plumbing instead."
    )


def decode_metadata(media: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode each payload's metadata: one Arrow-batched map stage.

    Output: ``(media_id, media_type, n_bytes, content_md5, width,
    height, n_frames)``. No shuffle — runs inside the scan stage.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _real_decode if use_real_codecs else _fake_decode
        for pdf in batches:
            metas = [decode(t, bytes(c)) for t, c in zip(pdf["media_type"], pdf["content"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "content_md5": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "n_frames": [m[3] for m in metas],
                }
            )

    return media.mapInPandas(decode_batches, schema=METADATA_SCHEMA)


def decode_metadata_sql(table: str = "documents") -> str:
    """DuckDB oracle for media_table → decode_metadata over documents:
    the fake decode is pure hash arithmetic, so the whole multimodal
    pipeline (binary encode → batch decode → metadata) is checkable."""
    h = "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)"
    return f"""
SELECT doc_id AS media_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS content_md5,
       (64 + {h} % {_DIM_MOD})::INT AS width,
       (64 + ({h} // {_DIM_MOD}) % {_DIM_MOD})::INT AS height,
       CASE WHEN doc_id % 3 = 2 THEN (1 + {h} % {_FRAME_MOD})::INT ELSE 1 END AS n_frames
FROM {table}
"""


def sample_frames_sql(table: str = "documents", every_k: int = 8) -> str:
    """DuckDB oracle for media_table → sample_frames over documents:
    the fake frame count is hash arithmetic, so the frame fan-out is
    exactly checkable."""
    h = "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT)"
    return f"""
WITH v AS (
  SELECT doc_id AS media_id, (1 + {h} % {_FRAME_MOD})::INT AS n_frames
  FROM {table} WHERE doc_id % 3 = 2
)
SELECT media_id, unnest(range(0, n_frames, {every_k}))::INT AS frame_idx
FROM v
"""


def resize_images(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stage: same mapInPandas shape as a real resampler.

    The stub passes bytes through and records the requested target —
    swapping in PIL's resize changes only the inner function, never the
    plan. Output keeps the binary payload column (fat rows stay
    scan-side; still no shuffle).
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "media_type"]].copy()
            out["content"] = pdf["content"]  # stub: passthrough bytes
            out["target_w"] = target_w
            out["target_h"] = target_h
            yield out

    return media.mapInPandas(
        resize_batches,
        schema="media_id long, media_type string, content binary, target_w int, target_h int",
    )


def sample_frames(media: DataFrame, every_k: int = 8) -> DataFrame:
    """Frame-sampling stage for video payloads: one output row per
    sampled frame index (the fan-out a real frame extractor produces).

    Frame count comes from the deterministic fake decode; the payload
    is NOT duplicated per frame — only (media_id, frame_idx) fan out,
    which is the memory-correct shape at scale.
    """

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs = [], []
            for mid, t, c in zip(pdf["media_id"], pdf["media_type"], pdf["content"]):
                n_frames = _fake_decode(t, bytes(c))[3]
                for k in range(0, n_frames, every_k):
                    ids.append(mid)
                    idxs.append(k)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs})

    return media.filter(F.col("media_type") == "video").mapInPandas(
        sample_batches, schema="media_id long, frame_idx int"
    )
