"""Composed corpus-curation funnel (operators/curation.py): stage
verdicts compose the already-tested stages; the funnel view counts
attrition; final keep is the AND."""

from __future__ import annotations

import pandas as pd

from advanced_data_profile_spark.operators.curation import (
    curate_corpus,
    curation_funnel,
)


def _corpus(spark):
    varied = " ".join(
        f"the word{i} and item{i * 7 % 97} of part{i % 13}" for i in range(40)
    )
    rows = [
        (1, varied),                                  # clean -> kept
        (2, varied + " trailing"),                    # near-dup of 1 -> dropped
        (3, "the same phrase " * 60),                 # repetition fail
        (4, "x y"),                                   # quality fail (too short)
        (5, varied.replace("word", "term")),          # clean, distinct
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_curation_stage_verdicts_and_final(spark):
    docs = _corpus(spark)
    bench = spark.createDataFrame(
        pd.DataFrame([(100, "the term0 and item0 of part0 the term1 and "
                            "item7 of part1")], columns=["doc_id", "text"])
    )
    out = {r.id: r for r in curate_corpus(
        docs, "doc_id", "text", benchmark=bench, decon_n=8
    ).collect()}
    assert len(out) == 5
    assert out[1].keep_final is True
    # 2 is a near-dup cluster member with the larger id -> dedup drops it
    assert out[2].keep_dedup is False and out[2].keep_final is False
    assert out[3].keep_repetition is False
    assert out[4].keep_quality is False
    # 5 contains the benchmark 8-gram run -> decontamination drops it
    assert out[5].keep_decontamination is False
    assert out[5].keep_quality is True  # other stages unaffected

    funnel = curation_funnel(
        curate_corpus(docs, "doc_id", "text", benchmark=bench, decon_n=8)
    ).collect()[0]
    assert funnel.n_docs == 5
    assert funnel.n_keep_final == 1
    assert funnel.n_keep_dedup == 4


def test_curation_without_benchmark(spark):
    docs = _corpus(spark)
    out = {r.id: r for r in curate_corpus(docs, "doc_id", "text").collect()}
    assert all(r.keep_decontamination for r in out.values())
    assert out[5].keep_final is True  # nothing to decontaminate against


def test_curation_perplexity_stage(spark):
    """With a reference-trained char-LM model, gibberish fails the
    perplexity stage (and thus keep_final) while other stages stay
    unaffected; without a model the column is uniformly True."""
    from advanced_data_profile_spark.operators.curation import curate_corpus
    from advanced_data_profile_spark.operators.quality import train_char_lm

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs "
              "through the green fields today with many friends here")
         for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the brown dog runs through the green fields today with "
                "the fox and many other friends over there"),
            (2, "zxqj vwkp qqzx jjvv wxyz kqpz xxjq zzvk pqwz jxqv "
                "qzpw xkjv zzqx wpkv jqxz"),
        ],
        "doc_id long, text string",
    )
    model = train_char_lm(ref, "text")
    out = {r.id: r for r in curate_corpus(
        docs, "doc_id", "text", ppl_model=model, max_ppl=15.0
    ).collect()}
    assert out[1].keep_perplexity is True
    assert out[2].keep_perplexity is False and out[2].keep_final is False
    # stage independence: the gibberish doc's OTHER verdicts are not
    # forced False by the perplexity stage
    assert out[2].keep_decontamination is True


def test_curation_perplexity_n_derived_from_model(spark):
    """The n-gram order is derived from the model's ctx width: a model
    trained at n=2 scores with matching 1-char contexts instead of
    missing every lookup and silently failing the whole corpus at the
    threshold (the hardcoded-n bug put every doc at ppl == 37)."""
    from advanced_data_profile_spark.operators.quality import train_char_lm

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog and runs "
              "through the green fields today with many friends here")
         for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the brown dog runs through the green fields today with "
             "the fox and many other friends over there")],
        "doc_id long, text string",
    )
    model2 = train_char_lm(ref, "text", n=2)
    out = {r.id: r for r in curate_corpus(
        docs, "doc_id", "text", ppl_model=model2, max_ppl=15.0
    ).collect()}
    assert out[1].keep_perplexity is True  # not the smoothed-floor 37


def test_char_lm_model_n_validates(spark):
    """char_lm_model_n derives n and rejects empty / mixed-width model
    relations with clear errors."""
    import pytest

    from advanced_data_profile_spark.operators.quality import (
        char_lm_model_n,
        train_char_lm,
    )

    ref = spark.createDataFrame(
        [(1, "some reference text for the tiny model")],
        "doc_id long, text string",
    )
    assert char_lm_model_n(train_char_lm(ref, "text", n=2)) == 2
    assert char_lm_model_n(train_char_lm(ref, "text", n=4)) == 4
    with pytest.raises(ValueError, match="empty"):
        char_lm_model_n(train_char_lm(ref.limit(0), "text"))
    mixed = train_char_lm(ref, "text", n=2).unionByName(
        train_char_lm(ref, "text", n=3)
    )
    with pytest.raises(ValueError, match="mixed ctx widths"):
        char_lm_model_n(mixed)


def test_curate_corpus_incremental_batches(spark, tmp_path):
    """Batch-at-a-time curation over stored state: batch 2's near-dup
    of a batch-1 SURVIVOR is dropped by the stored-index check (no
    rescan of batch 1), a near-copy of a batch-1 QUALITY-REJECT is
    kept (only survivors join the index, so rejected docs never shadow
    later clean copies), and fresh documents pass."""
    from advanced_data_profile_spark.operators.curation import (
        curate_corpus_incremental,
    )

    varied = " ".join(
        f"the word{i} and item{i * 7 % 97} of part{i % 13}" for i in range(40)
    )
    other = " ".join(
        f"an entry{i} plus thing{i * 5 % 89} in group{i % 11}"
        for i in range(40)
    )
    idx = str(tmp_path / "cur_idx")
    b1 = spark.createDataFrame(
        pd.DataFrame(
            [(1, varied), (2, varied + " trailing"), (3, "x y")],
            columns=["doc_id", "text"],
        )
    )
    out1 = {r.id: r for r in curate_corpus_incremental(
        b1, "doc_id", "text", idx
    ).collect()}
    assert out1[1].keep_final is True          # first seen, clean
    assert out1[2].keep_dedup is False         # in-batch near-dup of 1
    assert out1[3].keep_quality is False       # too short -> not indexed
    b2 = spark.createDataFrame(
        pd.DataFrame(
            [
                (10, varied + " extra"),       # near-dup of SURVIVOR 1
                (11, "x y"),                   # same text as reject 3
                (12, other),                   # fresh
            ],
            columns=["doc_id", "text"],
        )
    )
    out2 = {r.id: r for r in curate_corpus_incremental(
        b2, "doc_id", "text", idx
    ).collect()}
    assert out2[10].keep_dedup is False        # stored-index hit, batch 1
    assert out2[10].keep_final is False
    assert out2[11].keep_quality is False      # fails quality again, but
    assert out2[11].keep_dedup is True         # reject 3 never shadowed it
    assert out2[12].keep_final is True         # fresh doc survives
    # the index grew by batch 2's survivor only: first-seen-wins means a
    # third batch near-copy of `other` is now dropped too
    b3 = spark.createDataFrame(
        pd.DataFrame([(20, other + " tail")], columns=["doc_id", "text"])
    )
    out3 = curate_corpus_incremental(b3, "doc_id", "text", idx).collect()
    assert out3[0].keep_dedup is False


def test_curate_corpus_cli(spark, tmp_path, monkeypatch):
    """scripts/curate_corpus.py end-to-end: verdicts + funnel JSON +
    kept docs, then a second --incremental invocation whose near-dup
    of a first-run survivor is dropped via the persisted index."""
    import importlib
    import json
    import sys as _sys

    varied = " ".join(
        f"the word{i} and item{i * 7 % 97} of part{i % 13}" for i in range(40)
    )
    docs1 = str(tmp_path / "docs1")
    spark.createDataFrame(
        pd.DataFrame([(1, varied), (2, "x y")], columns=["doc_id", "text"])
    ).write.parquet(docs1)
    out = str(tmp_path / "cur_out")
    idx = str(tmp_path / "cur_cli_idx")
    kept = str(tmp_path / "kept")
    mod = importlib.import_module("scripts.curate_corpus")

    def run(docs_path):
        monkeypatch.setattr(_sys, "argv", [
            "curate_corpus.py", "--docs", docs_path, "--output", out,
            "--incremental", "--index", idx, "--kept-out", kept,
        ])
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            mod.main()
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    r1 = run(docs1)
    assert r1["n_docs"] == 2 and r1["n_keep_final"] == 1
    assert spark.read.parquet(kept).count() == 1
    docs2 = str(tmp_path / "docs2")
    spark.createDataFrame(
        pd.DataFrame(
            [(10, varied + " extra")], columns=["doc_id", "text"]
        )
    ).write.parquet(docs2)
    r2 = run(docs2)
    # cumulative funnel over the appended verdicts: 3 docs, still 1 kept
    # (the near-dup of run 1's survivor was dropped by the stored index)
    assert r2["n_docs"] == 3 and r2["n_keep_final"] == 1
    assert spark.read.parquet(kept).count() == 1


def test_curate_corpus_incremental_replay_idempotent(spark, tmp_path):
    """Batch-tagged layout: replaying a batch with the SAME tag (an
    orchestrator retry, an accidental re-invocation) reproduces its
    first attempt's verdicts — the cross-batch check excludes the
    tag's own partitions, so survivors already appended by the first
    attempt never self-match — and the survivor append overwrites its
    own partitions instead of double-appending."""
    from advanced_data_profile_spark.operators.curation import (
        curate_corpus_incremental,
    )

    varied = " ".join(
        f"the word{i} and item{i * 7 % 97} of part{i % 13}" for i in range(40)
    )
    other = " ".join(
        f"an entry{i} plus thing{i * 5 % 89} in group{i % 11}"
        for i in range(40)
    )
    idx = str(tmp_path / "replay_idx")
    b1 = spark.createDataFrame(
        pd.DataFrame(
            [(1, varied), (2, "x y")], columns=["doc_id", "text"]
        )
    )

    def verdicts(batch, tag):
        return {
            r.id: (r.keep_dedup, r.keep_final)
            for r in curate_corpus_incremental(
                batch, "doc_id", "text", idx, batch_tag=tag
            ).collect()
        }

    first = verdicts(b1, "b1")
    assert first[1] == (True, True)
    sig_rows = spark.read.parquet(f"{idx}/signatures").count()
    # replay of the very first batch: identical verdicts (the flipped-
    # keep_dedup failure mode ADVICE flagged), no state growth
    assert verdicts(b1, "b1") == first
    assert spark.read.parquet(f"{idx}/signatures").count() == sig_rows
    # a genuinely new batch under a new tag still sees b1's survivors
    b2 = spark.createDataFrame(
        pd.DataFrame(
            [(10, varied + " extra"), (11, other)],
            columns=["doc_id", "text"],
        )
    )
    second = verdicts(b2, "b2")
    assert second[10] == (False, False)  # near-dup of b1's survivor
    assert second[11] == (True, True)    # fresh
    sig_rows2 = spark.read.parquet(f"{idx}/signatures").count()
    # and b2's replay is idempotent too
    assert verdicts(b2, "b2") == second
    assert spark.read.parquet(f"{idx}/signatures").count() == sig_rows2
    # state is tag-partitioned: each batch owns exactly its partition
    tags = {
        r.batch_tag
        for r in spark.read.parquet(f"{idx}/signatures")
        .select("batch_tag").distinct().collect()
    }
    assert tags == {"b1", "b2"}


def test_curate_corpus_cli_replay_and_one_shot_overwrite(
    spark, tmp_path, monkeypatch
):
    """CLI replay guards: re-running an --incremental batch leaves the
    cumulative funnel, verdicts, and kept output unchanged; re-running
    a one-shot curation overwrites rather than double-counting."""
    import importlib
    import json
    import sys as _sys

    varied = " ".join(
        f"the word{i} and item{i * 7 % 97} of part{i % 13}" for i in range(40)
    )
    docs1 = str(tmp_path / "docs1")
    spark.createDataFrame(
        pd.DataFrame([(1, varied), (2, "x y")], columns=["doc_id", "text"])
    ).write.parquet(docs1)
    mod = importlib.import_module("scripts.curate_corpus")

    def run(extra):
        monkeypatch.setattr(_sys, "argv", ["curate_corpus.py"] + extra)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            mod.main()
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    # --- one-shot: second run overwrites, funnel does not double ---
    out1 = str(tmp_path / "oneshot")
    kept1 = str(tmp_path / "oneshot_kept")
    a = run(["--docs", docs1, "--output", out1, "--kept-out", kept1])
    b = run(["--docs", docs1, "--output", out1, "--kept-out", kept1])
    assert a["n_docs"] == b["n_docs"] == 2
    assert spark.read.parquet(f"{out1}/verdicts").count() == 2
    assert spark.read.parquet(kept1).count() == 1

    # --- incremental: replay of the same batch is a no-op ---
    out2 = str(tmp_path / "inc")
    idx = str(tmp_path / "inc_idx")
    kept2 = str(tmp_path / "inc_kept")
    inc = ["--output", out2, "--incremental", "--index", idx,
           "--kept-out", kept2]
    r1 = run(["--docs", docs1] + inc)
    r2 = run(["--docs", docs1] + inc)  # replay: same default batch tag
    assert r1["batch_tag"] == r2["batch_tag"]
    assert r1["n_docs"] == r2["n_docs"] == 2
    assert r1["n_keep_final"] == r2["n_keep_final"] == 1
    assert spark.read.parquet(f"{out2}/verdicts").count() == 2
    assert spark.read.parquet(kept2).count() == 1
    # a second batch under its own path/tag still accumulates
    docs2 = str(tmp_path / "docs2")
    spark.createDataFrame(
        pd.DataFrame([(10, varied + " extra")], columns=["doc_id", "text"])
    ).write.parquet(docs2)
    r3 = run(["--docs", docs2] + inc)
    assert r3["batch_tag"] != r1["batch_tag"]
    assert r3["n_docs"] == 3 and r3["n_keep_final"] == 1


def test_default_batch_tag_fingerprints_data_files(spark, tmp_path):
    """Two DIFFERENT batches landing at the SAME ingest path must get
    different default tags (the fixed-ingest-path pattern: a silent
    same-tag overwrite would destroy the first batch's state), while
    an exact replay of the same files reproduces the tag."""
    import importlib

    mod = importlib.import_module("scripts.curate_corpus")
    path = str(tmp_path / "incoming")
    spark.createDataFrame(
        pd.DataFrame([(1, "a b c")], columns=["doc_id", "text"])
    ).write.parquet(path)
    t1 = mod.default_batch_tag(path, spark)
    t1_replay = mod.default_batch_tag(path, spark)
    assert t1 == t1_replay
    # a DIFFERENT batch replaces the files at the same path
    spark.createDataFrame(
        pd.DataFrame(
            [(2, "d e f g h i j k l m"), (3, "n o p")],
            columns=["doc_id", "text"],
        )
    ).write.mode("overwrite").parquet(path)
    t2 = mod.default_batch_tag(path, spark)
    assert t2 != t1
