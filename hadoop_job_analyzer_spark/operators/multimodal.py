"""Category K2 — multimodal binary-column plumbing (SURVEY.md §2.K2).

Treats media as opaque ``binary`` columns with typed metadata, the way
a 100 TB multimodal training pipeline stores image/audio/video next to
text: the Spark-side plumbing (binary payloads through Arrow, Pandas
UDF batch shapes, typed output schemas, partition-friendly plans) is
real and tested; the codec step is a clearly-marked STUB (no
image/audio libraries in this container — see _decode_real).

The payload is synthesized deterministically from each document
(64 bytes = unhex of 4 chained md5s), which makes every derived
metadata value cross-engine checkable: byte i of the payload is hex
chars 2i+1..2i+2 of the md5 chain, so the DuckDB oracle derives the
SAME values with pure string/int functions while the Spark side parses
REAL bytes in Python — if the binary plumbing mangled a single byte,
the hash-match would fail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

_N_FRAMES = 4
_FRAME_BYTES = 16

# 128 hex chars -> 64 payload bytes, derived only from text.
_HEX_SQL = "md5(text) || md5(text || '#1') || md5(text || '#2') || md5(text || '#3')"


def _payload(d: DataFrame) -> DataFrame:
    """documents + synthetic 64-byte binary payload column."""
    hx = F.concat(
        F.md5("text"),
        F.md5(F.concat(F.col("text"), F.lit("#1"))),
        F.md5(F.concat(F.col("text"), F.lit("#2"))),
        F.md5(F.concat(F.col("text"), F.lit("#3"))),
    )
    return d.select("doc_id", F.unhex(hx).alias("payload"))


def _decode_real(payload: bytes) -> dict:
    """The real codec step — image decode / audio resample / etc.

    STUB: pillow/torchaudio/ffmpeg are not in this container. The
    deterministic header-parse below (_decode_stub) stands in so the
    distributed plumbing stays fully testable; swap this in when the
    codec libraries exist.
    """
    raise NotImplementedError("media codecs unavailable in this environment")


@query(
    "mm_decode_meta",
    oracle=f"""
SELECT doc_id,
       octet_length(from_hex({_HEX_SQL})) AS n_bytes,
       substring({_HEX_SQL}, 1, 4) AS magic,
       ('0x' || substring({_HEX_SQL}, 5, 4))::INT % 1920 + 1 AS width,
       ('0x' || substring({_HEX_SQL}, 9, 4))::INT % 1080 + 1 AS height,
       ('0x' || substring({_HEX_SQL}, 13, 2))::INT % 4 + 1 AS channels,
       CASE ('0x' || substring({_HEX_SQL}, 15, 2))::INT % 4
         WHEN 0 THEN 'raw' WHEN 1 THEN 'rgb' WHEN 2 THEN 'yuv' ELSE 'gray'
       END AS fmt
FROM documents
""",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stub over a binary media column.

    mapInPandas receives Arrow batches of (doc_id, payload:binary),
    parses the header fields from the RAW BYTES in Python (the exact
    shape a real decoder has: bytes in, typed struct out), and returns
    a typed metadata frame. The oracle re-derives every field from the
    hex source — a byte mangled anywhere in the Arrow path breaks the
    match. One map stage, no shuffle, embarrassingly parallel at 100 TB.
    """
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    meta = _decode_real(b)
                except NotImplementedError:
                    meta = {  # deterministic header parse (STUB decode)
                        "n_bytes": len(b),
                        "magic": b[0:2].hex(),
                        "width": int.from_bytes(b[2:4], "big") % 1920 + 1,
                        "height": int.from_bytes(b[4:6], "big") % 1080 + 1,
                        "channels": b[6] % 4 + 1,
                        "fmt": ["raw", "rgb", "yuv", "gray"][b[7] % 4],
                    }
                rows.append({"doc_id": doc_id, **meta})
            yield pd.DataFrame(rows)

    return _payload(load_table(spark, sf_dir, "documents")).mapInPandas(
        decode,
        schema=(
            "doc_id bigint, n_bytes int, magic string, width int, height int,"
            " channels int, fmt string"
        ),
    )


def _frame_oracle() -> str:
    luma = " + ".join(
        f"('0x' || substring(frame_hex, {2 * j + 1}, 2))::INT" for j in range(_FRAME_BYTES)
    )
    return f"""
SELECT doc_id, frame_idx, frame_hex, ({luma}) % 256 AS luma
FROM (
  SELECT doc_id, f.frame_idx,
         substring({_HEX_SQL}, f.frame_idx * {2 * _FRAME_BYTES} + 1, {2 * _FRAME_BYTES}) AS frame_hex
  FROM documents,
       (SELECT UNNEST(generate_series(0, {_N_FRAMES - 1})) AS frame_idx) f
)
"""


@query("mm_frame_sample", oracle=_frame_oracle())
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary video column (stub codec).

    Row-expanding media op: each 64-byte payload yields 4 fixed-stride
    16-byte "frames" (the deterministic stand-in for ffmpeg keyframe
    extraction), each fingerprinted (hex) and feature-extracted (luma =
    byte sum — the stub for a real per-frame embedding). Python slices
    the real bytes; the oracle re-derives both fields from hex. The
    1→N row expansion inside mapInPandas is the exact batch shape a
    real frame sampler has.
    """
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_hex": [], "luma": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(_N_FRAMES):
                    frame = b[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_hex"].append(frame.hex())
                    out["luma"].append(sum(frame) % 256)
            yield pd.DataFrame(out)

    return _payload(load_table(spark, sf_dir, "documents")).mapInPandas(
        sample, schema="doc_id bigint, frame_idx int, frame_hex string, luma int"
    )


_N_SAMPLES = 32  # 64-byte payload = 32 x 16-bit big-endian PCM samples


def _audio_oracle() -> str:
    # 16-bit unsigned from hex, then two's-complement to signed.
    return f"""
WITH samples AS (
  SELECT doc_id, i,
         (('0x' || substring({_HEX_SQL}, 4 * i + 1, 4))::INT + 32768) % 65536 - 32768 AS s
  FROM documents, (SELECT UNNEST(generate_series(0, {_N_SAMPLES - 1})) AS i) t
), lagged AS (
  SELECT doc_id, s, LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM samples
)
SELECT doc_id,
       COUNT(*)::INT AS n_samples,
       SUM(ABS(s))::BIGINT AS sum_abs,
       MAX(ABS(s))::INT AS peak,
       SUM(CASE WHEN prev IS NOT NULL AND ((s >= 0) <> (prev >= 0))
                THEN 1 ELSE 0 END)::INT AS zero_crossings
FROM lagged
GROUP BY doc_id
"""


@query("mm_audio_features", oracle=_audio_oracle())
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over a binary audio column (stub codec).

    The payload is interpreted as 32 signed 16-bit big-endian PCM
    samples (struct.unpack in Python — real byte parsing, the exact
    shape a torchaudio/librosa front-end has after resampling); the
    features are the classic integer-exact VAD trio: total absolute
    energy, peak amplitude, zero-crossing count. All-integer math so
    the DuckDB oracle (hex pairs → two's-complement → window lag for
    crossings) hash-matches exactly. One map stage, one row per doc,
    no shuffle — embarrassingly parallel at 100 TB; a real pipeline
    swaps _decode_real in and emits float MFCCs instead.
    """
    import struct

    import pandas as pd

    def features(batches):
        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "sum_abs": [], "peak": [], "zero_crossings": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = struct.unpack(f">{_N_SAMPLES}h", bytes(payload))
                zc = sum(1 for i in range(1, _N_SAMPLES) if (s[i] >= 0) != (s[i - 1] >= 0))
                out["doc_id"].append(doc_id)
                out["n_samples"].append(_N_SAMPLES)
                out["sum_abs"].append(sum(abs(x) for x in s))
                out["peak"].append(max(abs(x) for x in s))
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    return _payload(load_table(spark, sf_dir, "documents")).mapInPandas(
        features,
        schema="doc_id bigint, n_samples int, sum_abs bigint, peak int, zero_crossings int",
    )


_IMG_W = 8  # payload = 8x8 single-channel 8-bit "image"


def _resize_oracle() -> str:
    # output pixel p (0..15): r=p//4, c=p%4; avg-pool the 2x2 input
    # block at (2r, 2c). byte k of the payload = hex chars 2k+1..2k+2.
    def px(k: str) -> str:
        return f"('0x' || substring({_HEX_SQL}, 2 * ({k}) + 1, 2))::INT"

    tl = px("(p // 4) * 16 + (p % 4) * 2")
    tr = px("(p // 4) * 16 + (p % 4) * 2 + 1")
    bl = px("(p // 4) * 16 + (p % 4) * 2 + 8")
    br = px("(p // 4) * 16 + (p % 4) * 2 + 9")
    return f"""
SELECT doc_id, p AS pixel_idx,
       ({tl} + {tr} + {bl} + {br}) // 4 AS px
FROM documents, (SELECT UNNEST(generate_series(0, 15)) AS p) t
"""


@query("mm_image_resize", oracle=_resize_oracle())
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over a binary image column (stub codec): the 64-byte
    payload as an 8×8 single-channel 8-bit image, 2×2 average-pooled to
    4×4 — floor division keeps every output pixel integer-exact, so the
    oracle (hex-extracted bytes, same index arithmetic) hash-matches.

    The Python side is the real thing a thumbnailer does: numpy
    reshape(8,8) → blockwise mean — swap _decode_real in and this
    becomes PIL.resize. Emitted per-pixel (doc_id, pixel_idx, px) so a
    mangled byte anywhere in the Arrow path is localized by the oracle
    diff. Pure map stage, no shuffle.
    """
    import numpy as np
    import pandas as pd

    def resize(batches):
        for pdf in batches:
            out = {"doc_id": [], "pixel_idx": [], "px": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(_IMG_W, _IMG_W)
                pooled = (
                    img.reshape(_IMG_W // 2, 2, _IMG_W // 2, 2)
                    .astype(np.int32)
                    .transpose(0, 2, 1, 3)
                    .reshape(_IMG_W // 2, _IMG_W // 2, 4)
                    .sum(axis=2)
                    // 4
                )
                for p in range(16):
                    out["doc_id"].append(doc_id)
                    out["pixel_idx"].append(p)
                    out["px"].append(int(pooled[p // 4, p % 4]))
            yield pd.DataFrame(out)

    return _payload(load_table(spark, sf_dir, "documents")).mapInPandas(
        resize, schema="doc_id bigint, pixel_idx int, px int"
    )


@query(
    "mm_modality_mix_report",
    oracle=f"""
WITH meta AS (
  SELECT doc_id,
         CASE ('0x' || substring({_HEX_SQL}, 17, 2))::INT % 3
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
         END AS modality,
         octet_length(from_hex({_HEX_SQL})) AS n_bytes,
         md5({_HEX_SQL}) AS payload_hash
  FROM documents
)
SELECT modality,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(COUNT(DISTINCT payload_hash) AS BIGINT) AS n_distinct_payloads,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM meta GROUP BY modality
""",
)
def mm_modality_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-mix report over a mixed media corpus: each binary payload
    is typed (image/audio/video — here parsed from payload byte 8, the
    stub stand-in for real container sniffing) and the per-modality item
    count, byte mass, and distinct-payload count roll up — the first
    report a multimodal training-data pipeline prints, sizing each
    modality's share before budgeting decode compute.

    Plumbing is the real shape: bytes → typed metadata in an Arrow
    mapInPandas stage (modality + size + content hash extracted
    per-item in Python, exactly where a real sniffer runs), then a
    partial-agg'd modality rollup — 3 groups, shuffle carries
    per-partition partials only. The oracle re-derives every field from
    the hex source, so a byte mangled anywhere in the Arrow path breaks
    the match.
    """
    import hashlib

    import pandas as pd

    def sniff(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "modality": ["image", "audio", "video"][b[8] % 3],
                        "n_bytes": len(b),
                        "payload_hash": hashlib.md5(b.hex().encode()).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    meta = _payload(load_table(spark, sf_dir, "documents")).mapInPandas(
        sniff, schema="doc_id bigint, modality string, n_bytes int, payload_hash string"
    )
    return meta.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("payload_hash").alias("n_distinct_payloads"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
