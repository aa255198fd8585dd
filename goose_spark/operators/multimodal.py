"""Multimodal column plumbing (north-star extension).

Images/audio/video travel as opaque ``binary`` columns with typed
metadata; decode / feature-extraction runs as Arrow-batched Pandas UDFs
over ``mapInPandas``. The container has no image/audio libraries, so the
real decoders are STUBBED behind ``NotImplementedError`` — but the
Spark-side plumbing (schema, batch shape, partitioning, UDF signature)
is real and oracle-checked via a deterministic fake extractor.

At 100 TB: binary payloads dominate IO — keep them in their own parquet
column (never in a struct with hot metadata), size
``maxPartitionBytes`` to a few batches, and let the metadata columns
drive partition pruning before any payload is read.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t


def imaging_available() -> bool:
    """True when a real imaging library is importable. The gate is
    probed at TEST time (``tests/test_multimodal_real.py`` importorskip)
    — the protobuf/transformWithState pattern: a future container with
    Pillow installed automatically runs the real-decoder oracle rows,
    zero change where the lib is absent."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def decode_image(payload: bytes) -> "object":
    """Real image decode via Pillow when available; honest
    ``NotImplementedError`` otherwise. The registry queries (mm1-mm3)
    keep the deterministic fake so the driver's oracle never depends on
    the container's libraries — the real path is exercised by the
    env-gated test through the SAME ``extract_features`` kernel."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires an imaging library (pip install pillow)"
        ) from exc
    import io

    return Image.open(io.BytesIO(payload))


def fake_features(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic stand-in for decode+measure: derive (width, height,
    frames) from payload length. Arithmetic is mirrored in the oracle."""
    return n_bytes % 640, (7 * n_bytes) % 480, n_bytes % 16 + 1


def real_features(payload: bytes | None) -> tuple[int, int, int]:
    """decode+measure with the real decoder: (width, height, frames).
    Null/undecodable payloads yield (0, 0, 0) — a poisoned row must
    never kill the task (same policy as the fake path's null → 0)."""
    if payload is None:
        return 0, 0, 0
    try:
        img = decode_image(bytes(payload))
        return int(img.width), int(img.height), int(getattr(img, "n_frames", 1))
    except NotImplementedError:
        raise
    except Exception:
        return 0, 0, 0


def extract_features(d: DataFrame, features=None) -> DataFrame:
    """The ONE feature-extraction kernel (payload → doc_id, n_bytes,
    width, height, frames) behind mm1 and the real-decoder test:
    ``features`` maps payload bytes → (width, height, frames); default
    is the deterministic fake over byte length. Swapping the callable is
    the entire difference between the oracle-checked plumbing run and a
    Pillow run — schema, Arrow batch shape, and null policy are shared."""
    feats_fn = features or (lambda b: fake_features(0 if b is None else len(b)))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payload (failed fetch/decode upstream) = 0 bytes, not
            # a task kill
            n = pdf["payload"].map(lambda b: 0 if b is None else len(b))
            feats = pdf["payload"].map(feats_fn)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "width": feats.map(lambda f: f[0]).astype("int64"),
                    "height": feats.map(lambda f: f[1]).astype("int64"),
                    "frames": feats.map(lambda f: f[2]).astype("int64"),
                }
            )

    return d.mapInPandas(
        extract,
        schema="doc_id long, n_bytes long, width long, height long, frames long",
    )


_MM1_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
       CAST((7 * octet_length(encode(text))) % 480 AS BIGINT) AS height,
       CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS frames
FROM documents ORDER BY doc_id LIMIT 200"""


@register(
    "mm1_multimodal_features",
    _MM1_ORACLE,
    doc="Multimodal plumbing: binary payload column (UTF-8 bytes of text "
        "stand in for image bytes) → mapInPandas feature extraction with "
        "a deterministic fake decoder. Exercises the exact schema / Arrow "
        "batch path a real decoder would use.",
    tags=("llm", "multimodal"),
)
def mm1(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return extract_features(d).orderBy("doc_id").limit(200)


_THUMB_BYTES = 4096  # resize target: byte budget of the "thumbnail"


_MM2_ORACLE = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
       CAST(LEAST(octet_length(encode(text)), {_THUMB_BYTES}) AS BIGINT) AS thumb_bytes,
       ROUND(CAST(LEAST(octet_length(encode(text)), {_THUMB_BYTES}) AS DOUBLE)
             / octet_length(encode(text)), 4) AS scale
FROM documents ORDER BY doc_id LIMIT 200"""


@register(
    "mm2_resize_plumbing",
    _MM2_ORACLE,
    doc="Resize plumbing: payload → transformed payload (here a "
        "deterministic byte-truncation 'thumbnail'; a real resampler "
        "slots into the same kernel). The output column is REAL binary "
        "data — the oracle checks the measured sizes, exercising the "
        "binary-in/binary-out Arrow round-trip a decoder pipeline needs.",
    tags=("llm", "multimodal"),
)
def mm2(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["payload"].map(
                lambda b: None if b is None else bytes(b)[:_THUMB_BYTES]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "thumb": thumbs,
                }
            )

    out = d.mapInPandas(resize, schema="doc_id long, payload binary, thumb binary")
    ob = F.length("payload").cast("long")
    tb = F.length("thumb").cast("long")
    return (
        out.select(
            "doc_id",
            ob.alias("orig_bytes"),
            tb.alias("thumb_bytes"),
            F.round(tb.cast("double") / ob, 4).alias("scale"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


_FRAME_STEP = 4  # sample every 4th frame


_MM3_ORACLE = f"""
WITH v AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         octet_length(encode(text)) % 16 + 1 AS frames
  FROM documents),
s AS (
  SELECT doc_id, n_bytes, frames,
         unnest(generate_series(0, frames - 1, {_FRAME_STEP})) AS frame_idx
  FROM v)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * (n_bytes // frames) AS BIGINT) AS byte_offset
FROM s ORDER BY doc_id, frame_idx LIMIT 300"""


@register(
    "mm3_frame_sample",
    _MM3_ORACLE,
    doc="Frame sampling plumbing: each payload ('video' of n_bytes%16+1 "
        "frames) fans out to one row per every-4th frame with its byte "
        "offset — the 1→N mapInPandas shape a video pipeline uses to "
        "emit per-frame rows for downstream feature extraction.",
    tags=("llm", "multimodal"),
)
def mm3(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:  # no payload → no frames emitted
                    continue
                n = len(b)
                frames = n % 16 + 1
                fsize = n // frames
                for i in range(0, frames, _FRAME_STEP):
                    ids.append(did)
                    idxs.append(i)
                    offs.append(i * fsize)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "byte_offset": offs},
                dtype="int64",
            )

    out = d.mapInPandas(sample, schema="doc_id long, frame_idx long, byte_offset long")
    return out.orderBy("doc_id", "frame_idx").limit(300)


# ---------------------------------------------------------------------------
# mm4 — perceptual-hash duplicate grouping over binary payloads
# ---------------------------------------------------------------------------

#: aHash window: the hash reads this many leading payload bytes (every
#: corpus doc clears it — generator min length is 48 chars)
_AHASH_BYTES = 32

_MM4_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         (SELECT SUM(CASE WHEN ascii(substr(text, CAST(i AS INT), 1))
                               * {_AHASH_BYTES} > s.tot
                          THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
                          ELSE 0 END)
          FROM range(1, {_AHASH_BYTES} + 1) r(i),
               (SELECT SUM(ascii(substr(text, CAST(j AS INT), 1))) AS tot
                FROM range(1, {_AHASH_BYTES} + 1) rr(j)) s
         ) AS ahash
  FROM documents)
SELECT CAST(ahash AS BIGINT) AS ahash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS keeper
FROM h GROUP BY ahash HAVING COUNT(*) > 1
ORDER BY ahash"""


@register(
    "mm4_phash_dedup",
    _MM4_ORACLE,
    doc=f"Perceptual-hash duplicate grouping — the image-dedup op a "
        f"100 TB multimodal pipeline runs before training: decode each "
        f"binary payload, reduce it to a compact perceptual signature "
        f"(here average-hash: bit i set iff byte i of the first "
        f"{_AHASH_BYTES} exceeds their mean — integer-exact as "
        f"byte*{_AHASH_BYTES} > sum, no float threshold; a real "
        f"pipeline swaps in DCT-pHash over decoded pixels through the "
        f"SAME kernel signature), then group by signature and keep "
        f"min doc_id. The payload is real binary (UTF-8 bytes standing "
        f"in for image bytes, as mm1-mm3); the hash is computed in an "
        f"Arrow mapInPandas kernel over a numpy byte matrix — "
        f"map-only, no Python per-row. Scale shape: signatures are 8 "
        f"bytes/doc, so the dedup shuffle moves O(docs) tiny rows on "
        f"the hash key — the whole corpus never moves, exactly how "
        f"image dedup stays tractable at billions of images. "
        f"Near-dup (hamming<=t) banding over these signatures is dd8's "
        f"band trick on 4-bit nibbles; exact-equality grouping here "
        f"keeps the oracle exact.",
    tags=("llm", "multimodal", "dedup"),
)
def mm4(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.frombuffer(
                b"".join(bytes(b)[:_AHASH_BYTES] for b in pdf["payload"]),
                dtype=np.uint8,
            ).reshape(len(pdf), _AHASH_BYTES).astype(np.int64)
            tot = mat.sum(axis=1, keepdims=True)
            bits = (mat * _AHASH_BYTES > tot).astype(np.int64)
            weights = (1 << np.arange(_AHASH_BYTES, dtype=np.int64))[None, :]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ahash": (bits * weights).sum(axis=1)}
            )

    out = d.mapInPandas(ahash, schema="doc_id long, ahash long")
    return (
        out.groupBy("ahash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("ahash")
    )
