"""Multimodal column operators: image decode/resize/feature-extract and
video frame sampling over opaque ``binary`` columns.

Training-data-pipeline tier (BASELINE.json ``input_hint``: image+caption
records with ``bytes:binary`` + typed metadata).  Every operator is an
Arrow-batched ``mapInPandas`` kernel — bytes never touch the JVM row format,
batches stream through Python once, no shuffle.  Codecs come from
``functions/imaging.py``: real PNG/BMP, an honestly-labelled deterministic
fake JPEG, and a fake video container (real demuxers raise
``NotImplementedError`` — the plumbing (schema, batch shape, explode) is the
deliverable; a codec library slots into the same kernel signature).

Reference analog for the per-payload analysis shape:
``warc-indexer/.../analyser/payload/ImageAnalyser.java:92-143``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.colours import (
    detect_faces,
    dominant_colour,
    face_fragments,
    match_colour_name,
)
from ..functions.imaging import (
    average_hash,
    decode_image,
    encode_image,
    image_dims,
    resize_nearest,
    sample_video_frames,
)

__all__ = [
    "decode_resize_images",
    "sample_frames",
    "analyse_images",
    "RESIZED_SCHEMA",
    "FRAMES_SCHEMA",
    "IMAGE_ANALYSIS_SCHEMA",
    "image_analysis_struct_udf",
]


def _schema_plus(df: DataFrame, fields: list[StructField], keep: list[str]) -> StructType:
    return StructType([df.schema[c] for c in keep] + fields)


RESIZED_SCHEMA = [
    StructField("orig_w", IntegerType()),
    StructField("orig_h", IntegerType()),
    StructField("resized", BinaryType()),
    StructField("phash", LongType()),
    StructField("decode_error", StringType()),
]


def decode_resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_cols: tuple[str, ...] = ("image_id",),
    out_fmt: str = "png",
) -> DataFrame:
    """Decode → nearest-neighbor resize to (out_w, out_h) → re-encode +
    perceptual hash.  Per-record failures land in ``decode_error`` (the
    task never dies on one bad payload — per-record recovery like the
    archive source)."""
    keep = list(id_cols)
    schema = _schema_plus(df, RESIZED_SCHEMA, keep)

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {c: getattr(r, c) for c in keep}
                rec.update(orig_w=None, orig_h=None, resized=None,
                           phash=None, decode_error=None)
                try:
                    rgb = decode_image(bytes(getattr(r, bytes_col)), getattr(r, fmt_col))
                    rec["orig_h"], rec["orig_w"] = int(rgb.shape[0]), int(rgb.shape[1])
                    small = resize_nearest(rgb, out_w, out_h)
                    rec["resized"] = encode_image(small, out_fmt)
                    rec["phash"] = average_hash(small)
                except Exception as exc:
                    rec["decode_error"] = str(exc)[:200]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(*keep, bytes_col, fmt_col).mapInPandas(run, schema)


IMAGE_ANALYSIS_SCHEMA = [
    StructField("image_width", LongType()),
    StructField("image_height", LongType()),
    StructField("image_size", LongType()),
    StructField("image_dominant_colour", StringType()),
    StructField("image_faces", ArrayType(StringType())),
    StructField("image_faces_count", IntegerType()),
    StructField("decode_error", StringType()),
]


def analyse_images(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    id_cols: tuple[str, ...] = ("image_id",),
    extract_dominant: bool = True,
    extract_faces: bool = True,
    detector=None,
    max_size_bytes: int = 10 * 1024 * 1024,
    sample_rate: float = 1.0,
) -> DataFrame:
    """Per-image analysis matching the reference's ``FaceDetectionAnalyser``
    field fan-out (``warc-openimaj/.../FaceDetectionAnalyser.java:145-168``):
    ``image_width``/``image_height``/``image_size`` (= w·h), dominant colour
    as its nearest SVG keyword name (64³-bin histogram max →
    ``ColourMatcher`` L1 match, ``FaceDetectionParser.java:148,205-223``),
    and faces as W3C media-fragment ``kind@xywh=…`` strings + count.

    ``detector(rgb) -> [(kind, x, y, w, h), ...]`` is pluggable — the default
    is the skin-blob stand-in in :mod:`..functions.colours` (the reference
    uses OpenCV Haar cascades, whose model files don't ship here).  Payloads
    over ``max_size_bytes`` are skipped like the reference's size gate
    (``FaceDetectionAnalyser.java:119-121``); per-record failures land in
    ``decode_error``, never kill the task.

    ``sample_rate`` < 1 analyses only that fraction of records — the
    reference's ``analysisSamplingRate`` (``ImageAnalyser.java:105-110``,
    ``reference.conf:54``) but DETERMINISTIC: selection is
    ``xxhash64(id) mod 10⁶ < rate·10⁶`` (a filter pushed to the scan), not
    ``Math.random()``, so reruns analyse the identical subset."""
    keep = list(id_cols)
    if not 0.0 < sample_rate <= 1.0:
        raise ValueError("sample_rate must be in (0, 1]")
    if sample_rate < 1.0:
        df = df.filter(
            F.pmod(F.xxhash64(*[F.col(c) for c in keep]), F.lit(1_000_000))
            < int(sample_rate * 1_000_000)
        )
    schema = _schema_plus(df, IMAGE_ANALYSIS_SCHEMA, keep)
    det = detector or detect_faces

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = dict.fromkeys(
                    ("image_width", "image_height", "image_size",
                     "image_dominant_colour", "image_faces",
                     "image_faces_count", "decode_error")
                )
                for c in keep:
                    rec[c] = getattr(r, c)
                raw = getattr(r, bytes_col)
                if raw is None:
                    rec["decode_error"] = "null payload"
                    rows.append(rec)
                    continue
                data = bytes(raw)
                if len(data) > max_size_bytes:
                    rec["decode_error"] = "skipped: payload over size gate"
                    rows.append(rec)
                    continue
                try:
                    rgb = decode_image(data, getattr(r, fmt_col))
                    h, w = rgb.shape[:2]
                    rec["image_width"], rec["image_height"] = w, h
                    rec["image_size"] = w * h
                    if extract_dominant:
                        rec["image_dominant_colour"] = match_colour_name(
                            *dominant_colour(rgb)
                        )
                    if extract_faces:
                        faces = det(rgb)
                        rec["image_faces"] = face_fragments(faces)
                        rec["image_faces_count"] = len(faces)
                except Exception as exc:
                    rec["decode_error"] = str(exc)[:200]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(*keep, bytes_col, fmt_col).mapInPandas(run, schema)


FRAMES_SCHEMA = [
    StructField("frame_index", IntegerType()),
    StructField("frame_w", IntegerType()),
    StructField("frame_h", IntegerType()),
    StructField("frame_phash", LongType()),
    StructField("decode_error", StringType()),
]


def sample_frames(
    df: DataFrame,
    every_n: int = 1,
    bytes_col: str = "bytes",
    id_cols: tuple[str, ...] = ("video_id",),
) -> DataFrame:
    """Explode a video binary column into every ``every_n``-th frame's
    dims + perceptual hash (one output row per sampled frame).  Unsupported
    containers surface one row with ``decode_error`` set."""
    keep = list(id_cols)
    schema = _schema_plus(df, FRAMES_SCHEMA, keep)

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                base = {c: getattr(r, c) for c in keep}
                try:
                    frames = sample_video_frames(bytes(getattr(r, bytes_col)), every_n)
                except Exception as exc:
                    rows.append({**base, "frame_index": None, "frame_w": None,
                                 "frame_h": None, "frame_phash": None,
                                 "decode_error": str(exc)[:200]})
                    continue
                for idx, rgb in frames:
                    rows.append({**base, "frame_index": idx,
                                 "frame_w": int(rgb.shape[1]),
                                 "frame_h": int(rgb.shape[0]),
                                 "frame_phash": average_hash(rgb),
                                 "decode_error": None})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(*keep, bytes_col).mapInPandas(run, schema)


# the struct variant is the analysis schema minus the per-row decode_error
# (derived, not duplicated — the two paths must never desynchronize)
_IMAGE_STRUCT = StructType(IMAGE_ANALYSIS_SCHEMA[:-1])

_MIME_FMT = {
    "image/png": "png",
    "image/bmp": "bmp",
    "image/x-ms-bmp": "bmp",
    "image/jpeg": "jpeg",
    "image/jpg": "jpeg",
}


def image_analysis_struct_udf():
    """Scalar Arrow UDF (bytes, mime) → image-analysis struct, for composing
    the image analyser into a wide projection (``extract_capture``'s
    ``with_images`` path — the ``FaceDetectionAnalyser`` slot of the
    reference's MIME-dispatched analyser chain,
    ``WARCPayloadAnalysers.java:82-123``).  Null/undecodable/unknown-MIME
    payloads yield an all-null struct; the task never dies."""
    import pyspark.sql.functions as _F

    @_F.pandas_udf(_IMAGE_STRUCT)
    def analyse(data: pd.Series, mime: pd.Series) -> pd.DataFrame:
        rows = []
        for b, m in zip(data, mime):
            rec = dict.fromkeys([f.name for f in _IMAGE_STRUCT.fields])
            fmt = _MIME_FMT.get((m or "").split(";")[0].strip().lower())
            if b is not None and fmt is not None:
                try:
                    rgb = decode_image(bytes(b), fmt)
                    h, w = rgb.shape[:2]
                    faces = detect_faces(rgb)
                    rec.update(image_width=w, image_height=h, image_size=w * h,
                               image_dominant_colour=match_colour_name(
                                   *dominant_colour(rgb)),
                               image_faces=face_fragments(faces),
                               image_faces_count=len(faces))
                except Exception:
                    pass
            rows.append(rec)
        return pd.DataFrame(rows, columns=[f.name for f in _IMAGE_STRUCT.fields])

    return analyse
