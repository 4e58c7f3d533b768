"""The composed corpus-curation pass: quality rules + repetition
signals + benchmark decontamination + near-dup removal as ONE per-doc
verdict relation — the end-to-end funnel a training-data pipeline runs
over a raw corpus before packing/sampling, assembled from the
already-oracled stages (quality.quality_filter, quality.repetition_
filter, dedup.decontaminate, dedup.minhash_dedup + keep-cluster-min,
and optionally quality.char_lm_perplexity under a reference-trained
model — the CCNet cut).

Scale shape: each stage is its own scan/shuffle pattern (documented in
its module); the composition joins up to five per-doc boolean
relations on the id. At 10^12 docs those joins are id-keyed shuffles of NARROW
relations (id + a few booleans — orders of magnitude smaller than the
corpus payloads); co-partitioning/bucketing by id makes them
exchange-free, same as every other id-keyed artifact here. The corpus
text is scanned once per stage, never joined by payload.

No reference counterpart; task-brief training-data op (the round-4
dedup_corpus_keep composition, widened to the full funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators.dedup import (
    decontaminate,
    dedup_keep_cluster_min,
    minhash_dedup,
)
from advanced_data_profile_spark.operators.quality import (
    QualityParams,
    quality_filter,
    repetition_filter,
)


def curate_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame | None = None,
    quality_params: QualityParams | None = None,
    decon_n: int = 13,
    minhash_k: int = 16,
    minhash_bands: int = 4,
    minhash_threshold: float = 0.8,
    ppl_model: DataFrame | None = None,
    max_ppl: float = 30.0,
    ppl_alpha: float = 0.1,
    ppl_lang_col: str | None = None,
) -> DataFrame:
    """One row per document with each stage's keep verdict and the
    final AND:

      (id, keep_quality, keep_repetition, keep_decontamination,
       keep_dedup, keep_perplexity, keep_final)

    - keep_quality: every Gopher/C4 rule in quality_filter passes;
    - keep_repetition: every n-gram repetition signal within the
      Gopher thresholds (repetition_filter);
    - keep_decontamination: shares no word decon_n-gram with
      `benchmark` (True everywhere when benchmark is None);
    - keep_dedup: the document is its near-dup cluster's canonical
      (min-id) member — or unclustered (minhash_dedup -> connected
      components -> keep-cluster-min);
    - keep_perplexity: char-LM perplexity under `ppl_model` (a
      train_char_lm relation, e.g. trained on a trusted reference
      corpus; the n-gram order is derived from the model's ctx width,
      smoothing set by `ppl_alpha`) is <= max_ppl — the CCNet cut;
      True everywhere when no model is passed. A model carrying a
      `lang` column (train_char_lm_by_lang) switches the stage to
      per-language scoring — each doc under its own language's model,
      labels from `ppl_lang_col` or derived via lang_predict, and
      unmodeled-language docs fail the stage explicitly. Empty-normalized docs have no perplexity and
      fail the stage (they fail quality's word floor anyway);
    - keep_final: all of the above. Filter the corpus with
      `docs.join(curated.where("keep_final"), id)` or inspect the
      funnel with `curation_funnel`.
    """
    q = quality_filter(docs, text_col, id_col=id_col).select(
        "id", F.col("keep").alias("keep_quality")
    )
    rep = repetition_filter(docs, id_col, text_col).select(
        "id", F.col("repetition_keep").alias("keep_repetition")
    )
    pairs = minhash_dedup(
        docs, id_col, text_col,
        k=minhash_k, bands=minhash_bands, threshold=minhash_threshold,
    )
    kept = dedup_keep_cluster_min(docs, id_col, pairs).select(
        F.col(id_col).alias("id"), F.lit(True).alias("keep_dedup")
    )
    out = (
        docs.select(F.col(id_col).alias("id"))
        .join(q, "id", "left")
        .join(rep, "id", "left")
        .join(kept, "id", "left")
    )
    if benchmark is not None:
        dec = decontaminate(
            docs, benchmark, id_col, text_col, n=decon_n
        ).select("id", (~F.col("contaminated")).alias("keep_decontamination"))
        out = out.join(dec, "id", "left")
    else:
        out = out.withColumn("keep_decontamination", F.lit(True))
    if ppl_model is not None:
        from advanced_data_profile_spark.operators.quality import (
            char_lm_model_n,
            char_lm_perplexity,
            char_lm_perplexity_by_lang,
        )

        # threshold on the 4-decimal-rounded ppl: the cross-engine
        # contract then compares IDENTICAL quantities (the DuckDB
        # replay rounds to 4), closing the sub-1e-4 window where an
        # unrounded comparison could disagree at the boundary
        if "lang" in ppl_model.columns:
            # per-language mode (the full CCNet discipline): a
            # train_char_lm_by_lang model scores each doc under its
            # OWN language's model; ppl_lang_col=None derives labels
            # via lang_predict. A doc whose language has no model rows
            # scores the smoothed floor (modeled=False) and fails the
            # cut — route such languages explicitly rather than
            # training on floor-scored text
            ppl = char_lm_perplexity_by_lang(
                docs, id_col, text_col, ppl_model,
                lang_col=ppl_lang_col, alpha=ppl_alpha,
            ).select(
                "id",
                (
                    F.col("modeled")
                    & (F.round(F.col("ppl"), 4) <= F.lit(max_ppl))
                ).alias("keep_perplexity"),
            )
        else:
            # the n-gram order is DERIVED from the model's ctx width
            # (and the relation validated), so a model trained at any
            # n scores with matching contexts — a hardcoded n would
            # make every (ctx, ch) lookup miss for n != 3 and silently
            # fail the whole corpus at the threshold
            ppl_n = char_lm_model_n(ppl_model)
            ppl = char_lm_perplexity(
                docs, id_col, text_col, ppl_model, n=ppl_n, alpha=ppl_alpha
            ).select(
                "id",
                (F.round(F.col("ppl"), 4) <= F.lit(max_ppl)).alias(
                    "keep_perplexity"
                ),
            )
        out = out.join(ppl, "id", "left")
    else:
        out = out.withColumn("keep_perplexity", F.lit(True))
    cols = [
        "keep_quality", "keep_repetition", "keep_decontamination",
        "keep_dedup", "keep_perplexity",
    ]
    out = out.select(
        "id", *[F.coalesce(F.col(c), F.lit(False)).alias(c) for c in cols]
    )
    keep_final = None
    for c in cols:
        keep_final = F.col(c) if keep_final is None else (keep_final & F.col(c))
    return out.withColumn("keep_final", keep_final)


def curate_corpus_incremental(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    benchmark: DataFrame | None = None,
    quality_params: QualityParams | None = None,
    decon_n: int = 13,
    minhash_k: int = 16,
    minhash_bands: int = 4,
    minhash_threshold: float = 0.8,
    ppl_model: DataFrame | None = None,
    max_ppl: float = 30.0,
    ppl_alpha: float = 0.1,
    ppl_lang_col: str | None = None,
    append_survivors: bool = True,
    batch_tag: str | None = None,
) -> DataFrame:
    """The INCREMENTAL curation funnel — curate_corpus's semantics for
    a corpus that arrives in batches, composed entirely from stored
    state so no prior batch is ever rescanned (the 100 TB ingestion
    shape):

    - keep_quality / keep_repetition / keep_decontamination /
      keep_perplexity: batch-local scans (quality rules, repetition
      signals, broadcast benchmark n-grams, perplexity under the
      caller-supplied STORED model relation — train once / merge
      incrementally via merge_char_lm_models, per-language when the
      model carries a lang column);
    - keep_dedup: first-seen-wins across batches — the doc must have
      no near-dup in the persisted LSH index at `index_path`
      (neardup_index_check: batch keys broadcast against stored
      buckets, prior corpus text never rescanned) AND be its IN-batch
      near-dup cluster's min-id canonical (minhash_dedup within the
      batch only).

    Only keep_final SURVIVORS join the index (append_survivors=True):
    the index is the retained corpus, so a document dropped for
    quality never suppresses a later clean near-copy — unlike
    appending raw batches, where a rejected first-seen would shadow
    every subsequent duplicate. The first batch (no index yet) skips
    the cross-batch check and seeds the index from its survivors.

    Batch-at-a-time semantics deliberately differ from the one-shot
    curate_corpus in ONE way: cluster canonicality is first-seen-wins
    (arrival order) rather than global min-id — the only consistent
    choice when later batches cannot reorder history. Returns one row
    per batch document: (id, keep_quality, keep_repetition,
    keep_decontamination, keep_dedup, keep_perplexity, keep_final).

    Replay safety: pass `batch_tag` (a stable per-batch identifier)
    and the index uses the batch-tagged partitioned layout — the
    cross-batch check excludes this batch's own partitions (a retry
    that already appended its survivors never matches its first
    attempt's rows) and the survivor append dynamically overwrites
    exactly its own partitions (no double-append). Without a
    batch_tag the flat layout applies and callers — e.g. foreachBatch
    drivers — must guard replays on the batch id themselves, the same
    idempotency contract as streaming.neardup_batch_writer. The two
    layouts must not be mixed within one index."""
    from advanced_data_profile_spark.operators.dedup import (
        neardup_index_build,
        neardup_index_check,
    )
    from advanced_data_profile_spark.session import hadoop_path_exists

    spark = batch.sparkSession
    verdicts = curate_corpus(
        batch, id_col, text_col,
        benchmark=benchmark, quality_params=quality_params,
        decon_n=decon_n, minhash_k=minhash_k, minhash_bands=minhash_bands,
        minhash_threshold=minhash_threshold, ppl_model=ppl_model,
        max_ppl=max_ppl, ppl_alpha=ppl_alpha, ppl_lang_col=ppl_lang_col,
    )
    have_index = hadoop_path_exists(spark, f"{index_path}/signatures")
    if have_index:
        hits = (
            neardup_index_check(
                batch, id_col, text_col, index_path,
                k=minhash_k, bands=minhash_bands,
                threshold=minhash_threshold,
                exclude_batch_tag=batch_tag,
            )
            .select(F.col("id_new").alias("id"))
            .distinct()
            .withColumn("__indexed_dup", F.lit(True))
        )
        verdicts = verdicts.join(hits, "id", "left").withColumn(
            "keep_dedup",
            F.col("keep_dedup") & F.col("__indexed_dup").isNull(),
        ).drop("__indexed_dup")
        # keep_final re-derives so the cross-batch verdict participates
        keep = None
        for c in (
            "keep_quality", "keep_repetition", "keep_decontamination",
            "keep_dedup", "keep_perplexity",
        ):
            keep = F.col(c) if keep is None else (keep & F.col(c))
        verdicts = verdicts.withColumn("keep_final", keep)
    if append_survivors:
        # materialize verdicts BEFORE the index append: the returned
        # relation (and the survivors feeding the append) must never
        # recompute against post-append index state — the write-path
        # cache-invalidation trap, same discipline as
        # neardup_index_check's file-list snapshot. localCheckpoint
        # stores the computed partitions; nothing downstream re-reads
        # the index.
        verdicts = verdicts.localCheckpoint(eager=True)
        survivors = batch.join(
            verdicts.where(F.col("keep_final")).select(
                F.col("id").alias(id_col)
            ),
            id_col,
        )
        neardup_index_build(
            survivors, id_col, text_col, index_path,
            k=minhash_k, bands=minhash_bands,
            mode="append" if have_index else "overwrite",
            batch_tag=batch_tag,
        )
    return verdicts


def curation_funnel(curated: DataFrame) -> DataFrame:
    """The attrition view: one row — total docs, per-stage keep counts,
    final survivors. A monitoring aggregate over the verdict relation
    (no corpus scan)."""
    return curated.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.col(c).cast("long")).alias(f"n_{c}")
            for c in (
                "keep_quality", "keep_repetition", "keep_decontamination",
                "keep_dedup", "keep_perplexity", "keep_final",
            )
        ],
    )
