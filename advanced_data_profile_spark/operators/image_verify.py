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

import numpy as np
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


def _validate_arrow(it):
    """Arrow-native validation kernel: payloads are read as ZERO-COPY
    memoryview slices of the Arrow data buffer — no per-row Python
    bytes objects, no pandas conversion. The decode path is
    memory-bandwidth-bound at high core counts, so eliminating the
    bytes-object copy is the difference between scaling and not."""
    import pyarrow as pa

    for batch in it:
        n = batch.num_rows
        cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        ws = cols["w"].to_numpy(zero_copy_only=False)
        hs = cols["h"].to_numpy(zero_copy_only=False)
        fmts = cols["fmt"].to_pylist()
        barr = cols["bytes"]
        if isinstance(barr, pa.ChunkedArray):  # defensive; batches are flat
            barr = barr.combine_chunks()
        bufs = barr.buffers()
        # [validity, offsets, data]; honor the array's logical offset
        off_dtype = np.int64 if pa.types.is_large_binary(barr.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
            barr.offset: barr.offset + n + 1
        ]
        data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")

        decode_ok = np.zeros(n, dtype=bool)
        dims_match = np.zeros(n, dtype=bool)
        fmt_known = np.zeros(n, dtype=bool)
        errors: list[str | None] = [None] * n
        for i in range(n):
            fmt = fmts[i]
            fmt_known[i] = fmt in ("raw", "bmp")
            try:
                if not barr[i].is_valid:
                    raise ValueError("null payload")
                payload = data[offsets[i]: offsets[i + 1]]
                px = decode(payload, int(ws[i]), int(hs[i]), fmt)
                decode_ok[i] = True
                dims_match[i] = px.shape[0] == hs[i] and px.shape[1] == ws[i]
            except (ValueError, TypeError) as e:
                errors[i] = str(e)[:200]
        yield pa.RecordBatch.from_arrays(
            [
                cols["image_id"], cols["part_id"],
                pa.array(decode_ok), pa.array(dims_match),
                pa.array(fmt_known), pa.array(errors, type=pa.string()),
            ],
            names=["image_id", "part_id", "decode_ok", "dims_match",
                   "fmt_known", "error"],
        )


def validate_payloads(images: DataFrame) -> DataFrame:
    """Structural per-image validation; returns one row per image."""
    src = images.select("image_id", "part_id", "bytes", "w", "h", "fmt")
    return src.mapInArrow(_validate_arrow, schema=VALIDATION_SCHEMA)


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
