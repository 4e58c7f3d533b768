"""Image payload verification — Arrow-batched, never per-row Python UDFs.

Two kernels (north_rule / input_hint: "decoded-pixel allclose
(PSNR>=40dB for lossy) + caption equality ... inside Arrow-batched
decode UDFs"):

- ``validate_payloads``: standalone structural validation — payload
  decodes, decoded dims match declared (w, h), fmt is known. Runs as
  ``mapInPandas`` so each Arrow batch of binary payloads is decoded in
  one Python call; batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py)
  because rows are payload-wide.

- ``verify_against_reference``: per-row invariant vs a reference table —
  decoded-pixel PSNR (>= min_psnr passes; lossless identical ⇒ capped
  99 dB) and caption byte-equality. The candidate/reference join is an
  equi-join on image_id: both sides are repartitioned by the join key so
  at cluster scale it is a co-partitioned sort-merge join; the heavy
  decode happens AFTER the join so only matched pairs are decoded.

Only the needed columns are selected before the UDF — Catalyst prunes
everything else out of the parquet scan (rule: never drag ``bytes``
through stages that don't decode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions.imagecodec import decode, psnr

VALIDATION_SCHEMA = (
    "image_id string, part_id int, decode_ok boolean, dims_match boolean, "
    "fmt_known boolean, error string"
)

VERIFY_SCHEMA = (
    "image_id string, part_id int, psnr double, pixels_ok boolean, "
    "caption_ok boolean, error string"
)


def _validate_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = {
            "image_id": pdf["image_id"],
            "part_id": pdf["part_id"],
            "decode_ok": [], "dims_match": [], "fmt_known": [], "error": [],
        }
        for payload, w, h, fmt in zip(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]):
            fmt_known = fmt in ("raw", "bmp")
            try:
                px = decode(payload, int(w), int(h), fmt)
                out["decode_ok"].append(True)
                out["dims_match"].append(px.shape[0] == h and px.shape[1] == w)
                out["error"].append(None)
            except (ValueError, TypeError) as e:
                out["decode_ok"].append(False)
                out["dims_match"].append(False)
                out["error"].append(str(e)[:200])
            out["fmt_known"].append(fmt_known)
        yield pd.DataFrame(out)


def validate_payloads(images: DataFrame) -> DataFrame:
    """Structural per-image validation; returns one row per image."""
    src = images.select("image_id", "part_id", "bytes", "w", "h", "fmt")
    return src.mapInPandas(_validate_batch, schema=VALIDATION_SCHEMA)


def validation_verdicts(validated: DataFrame) -> DataFrame:
    """Roll per-image validation up to per-partition constraint rows in
    the constraint_results shape."""
    agg = validated.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~F.col("decode_ok")).cast("long")).alias("v_decode"),
        F.sum((F.col("decode_ok") & ~F.col("dims_match")).cast("long")).alias("v_dims"),
        F.sum((~F.col("fmt_known")).cast("long")).alias("v_fmt"),
    )
    melted = agg.select(
        F.col("part_id").cast("string"),
        F.col("n_rows"),
        F.explode(
            F.array(
                F.struct(F.lit("payload_decodes").alias("constraint"),
                         F.col("v_decode").alias("n_violations")),
                F.struct(F.lit("dims_match_payload").alias("constraint"),
                         F.col("v_dims").alias("n_violations")),
                F.struct(F.lit("fmt_known").alias("constraint"),
                         F.col("v_fmt").alias("n_violations")),
            )
        ).alias("s"),
    )
    return melted.select(
        "part_id", "s.constraint", F.lit("image").alias("kind"),
        "n_rows", "s.n_violations", (F.col("s.n_violations") == 0).alias("passed"),
    )


def _verify_batch(min_psnr: float):
    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            res = {
                "image_id": pdf["image_id"], "part_id": pdf["part_id"],
                "psnr": [0.0] * n, "pixels_ok": [False] * n,
                "caption_ok": list(
                    (pdf["caption"].fillna("\x00") == pdf["ref_caption"].fillna("\x00"))
                ),
                "error": [None] * n,
            }
            for i in range(n):
                try:
                    a = decode(pdf["bytes"].iat[i], int(pdf["w"].iat[i]),
                               int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                    b = decode(pdf["ref_bytes"].iat[i], int(pdf["ref_w"].iat[i]),
                               int(pdf["ref_h"].iat[i]), pdf["ref_fmt"].iat[i])
                    p = psnr(a, b)
                    res["psnr"][i] = p
                    res["pixels_ok"][i] = p >= min_psnr
                except (ValueError, TypeError) as e:
                    res["error"][i] = str(e)[:200]
            yield pd.DataFrame(res)
    return fn


def verify_against_reference(
    candidate: DataFrame,
    reference: DataFrame,
    min_psnr: float = 40.0,
) -> DataFrame:
    """Per-row invariant vs reference: decoded-pixel PSNR + caption
    equality, joined on image_id. Lossless formats must be identical
    (PSNR capped at 99); lossy formats pass at >= min_psnr dB."""
    cand = candidate.select("image_id", "part_id", "bytes", "w", "h", "fmt", "caption")
    ref = reference.select(
        F.col("image_id"),
        F.col("bytes").alias("ref_bytes"),
        F.col("w").alias("ref_w"),
        F.col("h").alias("ref_h"),
        F.col("fmt").alias("ref_fmt"),
        F.col("caption").alias("ref_caption"),
    )
    joined = cand.join(ref, "image_id", "inner")
    return joined.mapInPandas(_verify_batch(min_psnr), schema=VERIFY_SCHEMA)
