"""End-to-end corpus curation CLI — the training-data funnel as a
spark-submit job (one-shot or incremental):

    python scripts/curate_corpus.py --docs corpus.parquet --output /tmp/cur
    spark-submit --py-files dist/adp_spark.zip scripts/curate_corpus.py \\
        --docs s3://.../corpus/ --output /curated \\
        [--benchmark evalset.parquet] [--ppl-model lm_counts.parquet \\
         --max-ppl 30] [--incremental --index /curated/lsh_index \\
         --batch-id batch-2024-07-01] [--kept-out /curated/kept]

Writes {output}/verdicts (one row per doc: per-stage keeps + keep_final),
prints the attrition funnel as JSON, and optionally writes the surviving
documents. --incremental routes through curate_corpus_incremental: the
batch is near-dup-checked against the persisted LSH index at --index
(prior corpus never rescanned) and its survivors are appended, so
repeated invocations curate an arriving corpus batch-at-a-time.
A --ppl-model relation carrying a `lang` column switches the perplexity
stage to per-language scoring (train_char_lm_by_lang state).

Replay safety: every run carries a batch tag (--batch-id, defaulting to
a tag derived from the --docs path PLUS its data files' name/size
fingerprint), and all incremental state — verdicts, kept docs, and the
LSH index partitions — is PARTITIONED BY that tag with dynamic
partition overwrite, while the cross-batch near-dup check excludes the
tag's own partitions. Re-running a batch (orchestrator retry after
partial failure, accidental re-invocation) therefore overwrites exactly
its own state and reproduces its original verdicts instead of
self-matching against its first attempt's appended survivors. Distinct
batches get distinct default tags even under a REUSED ingest path
(.../incoming/): different files fingerprint differently, so the second
batch can no longer silently overwrite the first's state; one-shot
(non-incremental) runs OVERWRITE {output}/verdicts and --kept-out
outright.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def default_batch_tag(docs_path: str, spark=None) -> str:
    """Stable tag for a batch: sanitized basename + short hash of the
    normalized path PLUS the data files' (name, size) fingerprint.

    The file fingerprint makes the DEFAULT replay-safe in the common
    fixed-ingest-path pattern (e.g. .../incoming/ reused for every
    batch): two DIFFERENT batches landing at the same path get
    different tags (different file names/sizes), so the second run
    lands under its own tag instead of silently dynamic-overwriting
    the first batch's verdicts, kept docs, and index partitions —
    while an exact replay of the same files reproduces the same tag
    and stays idempotent. mtime is deliberately excluded so a
    re-upload of identical bytes still counts as a replay. Listing is
    RECURSIVE (Hadoop listFiles), so partitioned layouts under the
    ingest path (lang=en/part-*.parquet) fingerprint their data
    files, not just unchanged subdir names. Failure policy: with no
    Spark session the tag falls back to the path-only hash
    (programmatic callers without FS access); with a session, a
    listing error RAISES instead of silently degrading — a
    transiently different default tag would make an orchestrator
    retry land under a NEW tag, self-match against its first
    attempt's appended survivors, and leave the original partitions
    as duplicates. Pass --batch-id for hard guarantees either way."""
    norm = docs_path.rstrip("/")
    base = re.sub(r"[^A-Za-z0-9_.-]", "_", os.path.basename(norm)) or "batch"
    h = hashlib.md5(norm.encode())
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is not None:
        try:
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(norm)
            fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
            prefix = len(fs.makeQualified(jpath).toString())
            entries = []
            it = fs.listFiles(jpath, True)
            while it.hasNext():
                st = it.next()
                p = st.getPath().toString()
                name = p[prefix:]
                if any(
                    seg.startswith(("_", "."))
                    for seg in name.strip("/").split("/")
                ):
                    continue  # hidden/_SUCCESS-style entries
                entries.append((name, st.getLen()))
            for name, ln in sorted(entries):
                h.update(f"|{name}:{ln}".encode())
        except Exception as e:
            raise RuntimeError(
                f"default batch tag: cannot fingerprint the data files "
                f"under {norm!r} ({e}); pass an explicit --batch-id — "
                "falling back to a path-only tag here could make a "
                "retry land under a different tag than its first "
                "attempt and corrupt replay safety"
            ) from e
    return f"{base}-{h.hexdigest()[:10]}"


def main() -> None:
    ap = argparse.ArgumentParser(description="corpus curation funnel")
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="results directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet for decontamination")
    ap.add_argument("--ppl-model", default=None,
                    help="stored char-LM count relation (train_char_lm[_by_lang])")
    ap.add_argument("--max-ppl", type=float, default=30.0)
    ap.add_argument("--decon-n", type=int, default=13)
    ap.add_argument("--minhash-threshold", type=float, default=0.8)
    ap.add_argument("--incremental", action="store_true",
                    help="check/append against the persisted LSH index")
    ap.add_argument("--index", default=None,
                    help="LSH index path (required with --incremental)")
    ap.add_argument("--batch-id", default=None,
                    help="stable batch tag for replay-safe state "
                         "partitioning (default: derived from --docs "
                         "path + its data files' name/size "
                         "fingerprint, so distinct batches at the "
                         "same path get distinct tags and exact "
                         "replays reuse theirs)")
    ap.add_argument("--kept-out", default=None,
                    help="also write surviving documents here")
    ap.add_argument("--dedup-spans", default=None, metavar="DELIM",
                    help="pre-pass: remove corpus-repeated spans (C4) "
                         "split on this literal delimiter")
    ap.add_argument("--span-min-chars", type=int, default=15)
    args = ap.parse_args()
    if args.incremental and not args.index:
        ap.error("--incremental requires --index")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from advanced_data_profile_spark.session import get_spark

        spark = get_spark(app_name="adp-curate")

    # after session init: the default tag fingerprints the batch's
    # data files through the Hadoop FS (see default_batch_tag)
    batch_tag = args.batch_id or default_batch_tag(args.docs, spark)

    from advanced_data_profile_spark.operators.curation import (
        curate_corpus,
        curate_corpus_incremental,
        curation_funnel,
    )

    docs = spark.read.parquet(args.docs)
    if args.dedup_spans is not None:
        # C4 boilerplate pre-pass: the funnel (and any --kept-out
        # write) then sees the span-deduplicated text
        from advanced_data_profile_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        docs = remove_duplicate_spans(
            docs, args.id_col, args.text_col,
            delimiter=args.dedup_spans, min_chars=args.span_min_chars,
        ).select(
            F.col("id").alias(args.id_col), args.text_col
        )
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    model = spark.read.parquet(args.ppl_model) if args.ppl_model else None
    common = dict(
        benchmark=bench, decon_n=args.decon_n,
        minhash_threshold=args.minhash_threshold,
        ppl_model=model, max_ppl=args.max_ppl,
    )
    vpath = f"{args.output}/verdicts"
    if args.incremental:
        # batch_tag flows into the index state too: the check excludes
        # this tag's partitions and the survivor append overwrites
        # them, so a replay reproduces its first attempt (see
        # curate_corpus_incremental)
        verdicts = curate_corpus_incremental(
            docs, args.id_col, args.text_col, args.index,
            batch_tag=batch_tag, **common
        )
        # already localCheckpointed by curate_corpus_incremental
        (
            verdicts.withColumn("batch_tag", F.lit(batch_tag))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_tag")
            .parquet(vpath)
        )
        # cumulative funnel over ALL batches' verdicts (a replay sees
        # its own overwritten partition, not a duplicate)
        funnel_src = spark.read.parquet(vpath).drop("batch_tag")
    else:
        verdicts = curate_corpus(
            docs, args.id_col, args.text_col, **common
        ).localCheckpoint(eager=True)  # compute the funnel once; the
        # verdict write and the kept-doc join both read the checkpoint
        verdicts.write.mode("overwrite").parquet(vpath)
        funnel_src = verdicts
    out = {
        "verdicts": vpath,
        "batch_tag": batch_tag,
        **{k: v for k, v in curation_funnel(funnel_src).first().asDict().items()},
    }
    if args.kept_out:
        kept = docs.join(
            verdicts.where(F.col("keep_final")).select(
                F.col("id").alias(args.id_col)
            ),
            args.id_col,
        )
        if args.incremental:
            (
                kept.withColumn("batch_tag", F.lit(batch_tag))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_tag")
                .parquet(args.kept_out)
            )
        else:
            kept.write.mode("overwrite").parquet(args.kept_out)
        out["kept_out"] = args.kept_out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
