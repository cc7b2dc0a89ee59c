"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct
(fixtures.py stores them as ``payload``/``payload_meta``; the reference
analogue is ``getImageBytes``/``ComputeImageSize``, ArcRecord.scala:24-31,
ComputeImageSize.scala:10-24). Decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas`` —
the Spark-side contract (schema, batch iteration, partitioning) is real.
``mode='real'`` decodes via Pillow when importable (decode failure → (0,0),
matching ComputeImageSize.scala:10-24) and raises NotImplementedError when
it is not; ``mode='fake'`` applies a deterministic byte-arithmetic decode
that tests and DuckDB oracles can mirror exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id string, n_bytes int, width int, height int, head_sum int"
)

RESIZED_SCHEMA = "doc_id string, width int, height int, scale_milli int"


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived from
    the first payload bytes, plus a checksum-ish feature. Mirrors the SQL
    oracle (ascii arithmetic) byte for byte on ASCII payloads."""
    b = buf[:8].ljust(8, b"\x00")
    width = (b[0] * 7 + b[1]) % 640 + 1
    height = (b[2] * 13 + b[3]) % 480 + 1
    head_sum = sum(b)
    return width, height, head_sum


def _require_pil():
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        raise NotImplementedError(
            "real image decode requires Pillow, which this environment does "
            "not ship; run with mode='fake' or install PIL"
        )


def _real_decode(buf: bytes) -> tuple[int | None, int | None, int | None]:
    """PIL decode: (width, height, head_sum). Reference semantics: decode
    failure → (0, 0) rather than an error (ComputeImageSize.scala:10-24
    returns (0, 0) on any exception)."""
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(buf)) as im:
            w, h = im.size
    except Exception:
        w, h = 0, 0
    return w, h, sum(buf[:8].ljust(8, b"\x00"))


def decode_media(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id", mode: str = "fake") -> DataFrame:
    """binary payload → (doc_id, n_bytes, width, height, head_sum) via
    mapInPandas (Arrow batches; one Python stage).

    mode='fake': deterministic byte-arithmetic decode (DuckDB-mirrorable —
    the oracle mode). mode='real': PIL decode per payload, (0,0) on decode
    failure per the reference's ComputeImageSize.scala:10-24; raises
    NotImplementedError at plan time when Pillow is absent."""
    if mode == "real":
        _require_pil()
    elif mode != "fake":
        raise ValueError(f"decode_media mode must be 'fake' or 'real', got {mode!r}")
    decode = _real_decode if mode == "real" else _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            dims = [(decode(p) if p is not None else (None, None, None)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "n_bytes": [len(p) if p is not None else None for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "head_sum": [d[2] for d in dims],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, DECODED_SCHEMA)


def resize_media(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize plan (pure Column math over decoded dims — the byte-level
    resample itself is part of the stubbed codec): scale to fit max_side,
    never upscale."""
    scale = F.least(
        F.lit(1000),
        F.floor(F.lit(1000 * max_side) / F.greatest("width", "height")).cast("int"),
    )
    return decoded.select(
        "doc_id",
        F.greatest(F.floor(F.col("width") * scale / 1000), F.lit(1)).cast("int").alias("width"),
        F.greatest(F.floor(F.col("height") * scale / 1000), F.lit(1)).cast("int").alias("height"),
        scale.alias("scale_milli"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      duration_col: str = "duration_ms") -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp (explode of
    a sequence — the decode of each frame is the stubbed codec)."""
    return df.withColumn(
        "frame_ms",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))),
    )
