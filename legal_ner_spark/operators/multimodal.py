"""Multimodal span handling: media spans are opaque binary references with
typed metadata, processed by Arrow-batched decode/feature UDFs.

The corpus interleaves ``kind∈{image,scan,audio}`` spans with text spans
(BASELINE.json input_hint).  The engine never touches their bytes on the KG
path (span-sequence invariant); this module is the training-data path that
*does*: explode media spans, attach typed metadata, and run per-kind
feature extraction over ``mapInPandas``.

The actual codecs (image decode, audio resample, frame sampling) are not
installable in this sandbox, so the decode step is a clearly-marked
deterministic stub behind the same batch signature — the Spark-side
plumbing (schema, partitioning, Arrow batch shape) is real and tested, and
swapping the stub for PIL/librosa/ffmpeg changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T

MEDIA_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("position", T.IntegerType()),
    T.StructField("feature_dim", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
    T.StructField("decode_ok", T.BooleanType()),
])


def media_spans(corpus: DataFrame) -> DataFrame:
    """Explode the media spans of the corpus — narrow, column-pruned (the
    scan reads only doc_id + spans; Catalyst prunes the rest)."""
    # position = the span's own offset field (its ordinal in the FULL
    # interleaved sequence) — a posexplode index over the media-only
    # filtered array would renumber spans and lose where each media item
    # sits relative to the surrounding text
    return (corpus.select(
        "doc_id",
        F.explode(F.filter("spans", lambda s: s["kind"] != "text"))
        .alias("span"))
        .select("doc_id", F.col("span.kind").alias("kind"),
                F.col("span.media_ref").alias("media_ref"),
                F.col("span.offset").alias("position")))


def _decode_stub(kind: str, media_ref: str, dim: int = 8) -> list[float]:
    """Deterministic fake decoder.

    Production replaces this with the real codec (PIL image decode /
    torchaudio load / ffmpeg frame sample) — not installable in this
    sandbox, hence a content-addressed deterministic vector so tests can
    assert exact values.
    """
    h = hashlib.sha256(f"{kind}|{media_ref}".encode()).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_media_features(corpus: DataFrame, dim: int = 8) -> DataFrame:
    """Per-media feature extraction via Arrow batches (UDTF shape: one media
    span in → one feature row out).  At scale this is the GPU/codec stage:
    batch size bounded by arrow.maxRecordsPerBatch, no shuffle."""
    spans = media_spans(corpus)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(k, r, dim)
                     for k, r in zip(pdf["kind"], pdf["media_ref"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "position": pdf["position"].astype("int32"),
                "feature_dim": dim,
                "features": feats,
                "decode_ok": True,
            })

    return spans.mapInPandas(fn, MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
    T.StructField("resize_ok", T.BooleanType()),
])


def resize_images(corpus: DataFrame, width: int = 224,
                  height: int = 224) -> DataFrame:
    """Image-resize stage (one image span in → one resized blob out).
    The resize itself is a deterministic stub (PIL not installable here:
    production swaps ``_resize_stub`` for ``Image.open(...).resize``);
    the Spark plumbing — image-kind filter, Arrow batching, binary output
    column — is real."""
    spans = media_spans(corpus).filter(F.col("kind").isin("image", "scan"))

    def _resize_stub(media_ref: str) -> bytes:
        # content-addressed fake pixels, length prop. to target size
        h = hashlib.sha256(f"resize|{media_ref}|{width}x{height}".encode())
        return (h.digest() * (width * height // 32 + 1))[: width * height // 64]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "width": width, "height": height,
                "resized": [_resize_stub(r) for r in pdf["media_ref"]],
                "resize_ok": True,
            })

    return spans.mapInPandas(fn, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_sec", T.FloatType()),
    T.StructField("frame_fingerprint", T.StringType()),
])


def sample_frames(corpus: DataFrame, n_frames: int = 4,
                  spacing_sec: float = 1.0) -> DataFrame:
    """Frame-sampling stage for audio/video spans — the one-to-many UDTF
    shape (one media span in → ``n_frames`` rows out) that a real
    ffmpeg/torchaudio sampler would have.  Stubbed fingerprints are
    content-addressed so tests can assert exact values."""
    spans = media_spans(corpus).filter(~F.col("kind").isin("image", "scan"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "frame_idx": [],
                   "ts_sec": [], "frame_fingerprint": []}
            for d, r in zip(pdf["doc_id"], pdf["media_ref"]):
                for i in range(n_frames):
                    out["doc_id"].append(d)
                    out["media_ref"].append(r)
                    out["frame_idx"].append(i)
                    out["ts_sec"].append(i * spacing_sec)
                    out["frame_fingerprint"].append(
                        hashlib.sha256(f"frame|{r}|{i}".encode())
                        .hexdigest()[:16])
            yield pd.DataFrame(out)

    return spans.mapInPandas(fn, FRAMES_SCHEMA)


def media_stats(corpus: DataFrame) -> DataFrame:
    """Per-kind media inventory — monitoring aggregate."""
    return (media_spans(corpus).groupBy("kind")
            .agg(F.count("*").cast("bigint").alias("n_spans"),
                 F.countDistinct("doc_id").cast("bigint").alias("n_docs")))


def nearest_mention_align(records: DataFrame) -> DataFrame:
    """Align every media span to its NEAREST entity mention by char
    offset — figure/scan-to-entity linking, the multimodal edge a KG
    over interleaved documents wants next to (statute ↔ provision)
    sentence-window linking.  Semantics: per media span, the mention
    minimizing |start_char − offset|; ties prefer the preceding
    mention, then the smallest ent_id — fully deterministic, which is
    what lets the quadratic NOT-a-join oracle pin it.

    Plan: the sort-merge as-of shape, NOT a per-doc cross join —
    mentions and media spans union into one per-doc offset-ordered
    stream, a forward window (`last` ignorenulls over mentions only)
    carries the latest mention at-or-before each media span, a
    backward window carries the earliest at-or-after, and one
    projection picks the closer side.  Work: two per-doc windows over
    (mentions + media) rows — linear in spans, hub-bounded by the
    document (the same per-doc contract as the extraction stage);
    media-only docs drop out (no mention to align to)."""
    media = (records.filter("rec_type = 'doc'")
             .select("doc_id", F.explode("spans").alias("s"))
             .filter("s.kind <> 'text'")
             .select("doc_id", F.col("s.kind").alias("kind"),
                     F.col("s.media_ref").alias("media_ref"),
                     F.col("s.offset").cast("bigint").alias("pos"))
             .withColumn("_t", F.lit(1)))
    men = (records.filter("rec_type = 'mention'")
           .select("doc_id", F.lit(None).cast("string").alias("kind"),
                   F.lit(None).cast("string").alias("media_ref"),
                   F.col("start_char").cast("bigint").alias("pos"),
                   F.lit(0).alias("_t"),
                   F.struct(
                       F.col("start_char").cast("bigint").alias("sc"),
                       F.col("ent_id").cast("bigint").alias("ent_id"),
                       F.col("label").alias("label")).alias("_ent")))
    stream = media.withColumn(
        "_ent", F.lit(None).cast(men.schema["_ent"].dataType)) \
        .unionByName(men)
    from pyspark.sql import Window
    wprev = (Window.partitionBy("doc_id")
             .orderBy("pos", "_t", F.desc(F.col("_ent.ent_id")))
             .rowsBetween(Window.unboundedPreceding, 0))
    wnext = (Window.partitionBy("doc_id")
             .orderBy(F.desc("pos"), F.asc("_t"),
                      F.desc(F.col("_ent.ent_id")))
             .rowsBetween(Window.unboundedPreceding, 0))
    aligned = (stream
               .withColumn("_prev", F.last("_ent", ignorenulls=True)
                           .over(wprev))
               .withColumn("_next", F.last("_ent", ignorenulls=True)
                           .over(wnext))
               .filter(F.col("_t") == 1))
    dp = F.col("pos") - F.col("_prev.sc")
    dn = F.col("_next.sc") - F.col("pos")
    use_prev = F.col("_prev").isNotNull() & (
        F.col("_next").isNull() | (dp <= dn))
    pick = F.when(use_prev, F.col("_prev")).otherwise(F.col("_next"))
    return (aligned.filter(F.col("_prev").isNotNull()
                           | F.col("_next").isNotNull())
            .select("doc_id", "media_ref", "kind",
                    F.col("pos").alias("offset"),
                    pick["ent_id"].alias("ent_id"),
                    pick["label"].alias("label"),
                    pick["sc"].alias("start_char"),
                    F.abs(pick["sc"] - F.col("pos")).cast("bigint")
                    .alias("dist")))
