"""End-to-end corpus curation CLI — the training-data funnel as a
spark-submit job (one-shot or incremental):

    python scripts/curate_corpus.py --docs corpus.parquet --output /tmp/cur
    spark-submit --py-files dist/adp_spark.zip scripts/curate_corpus.py \\
        --docs s3://.../corpus/ --output /curated \\
        [--benchmark evalset.parquet] [--ppl-model lm_counts.parquet \\
         --max-ppl 30] [--incremental --index /curated/lsh_index] \\
        [--kept-out /curated/kept]

Writes {output}/verdicts (one row per doc: per-stage keeps + keep_final),
prints the attrition funnel as JSON, and optionally writes the surviving
documents. --incremental routes through curate_corpus_incremental: the
batch is near-dup-checked against the persisted LSH index at --index
(prior corpus never rescanned) and its survivors are appended, so
repeated invocations curate an arriving corpus batch-at-a-time.
A --ppl-model relation carrying a `lang` column switches the perplexity
stage to per-language scoring (train_char_lm_by_lang state).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    if args.incremental:
        verdicts = curate_corpus_incremental(
            docs, args.id_col, args.text_col, args.index, **common
        )
    else:
        verdicts = curate_corpus(
            docs, args.id_col, args.text_col, **common
        ).localCheckpoint(eager=True)  # compute the funnel once; the
        # verdict write and the kept-doc join both read the checkpoint
    vpath = f"{args.output}/verdicts"
    verdicts.write.mode("append").parquet(vpath)
    stored = spark.read.parquet(vpath)
    out = {
        "verdicts": vpath,
        **{k: v for k, v in curation_funnel(stored).first().asDict().items()},
    }
    if args.kept_out:
        kept = docs.join(
            verdicts.where(F.col("keep_final")).select(
                F.col("id").alias(args.id_col)
            ),
            args.id_col,
        )
        kept.write.mode("append").parquet(args.kept_out)
        out["kept_out"] = args.kept_out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
