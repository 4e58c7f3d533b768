"""WAV audio featurize (real codec), CSV source parity, HTML report."""

from __future__ import annotations

import gzip

import numpy as np
import pandas as pd
import pytest

from advanced_data_profile_spark.functions.audiocodec import decode_wav, encode_wav


def test_wav_roundtrip_exact():
    rate = 16000
    t = np.arange(rate // 2) / rate          # 0.5 s
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)  # 440 Hz sine
    payload = encode_wav(x, rate)
    got_rate, got = decode_wav(payload)
    assert got_rate == rate
    assert len(got) == len(x)
    # int16 quantization error only
    assert float(np.abs(got - x).max()) < 1.0 / 32000


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError):
        decode_wav(b"definitely not audio")
    with pytest.raises(ValueError):
        decode_wav(None)


def test_audio_features_sine(spark):
    from advanced_data_profile_spark.operators.multimodal import audio_features

    rate, dur, freq, amp = 16000, 0.5, 440.0, 0.5
    t = np.arange(int(rate * dur)) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    clips = spark.createDataFrame(
        pd.DataFrame({
            "clip_id": ["sine", "junk"],
            "bytes": [encode_wav(x, rate), b"not-audio"],
        })
    )
    rows = {r.clip_id: r for r in audio_features(clips).collect()}
    s = rows["sine"]
    assert s.ok
    assert s.duration_sec == pytest.approx(dur, abs=1e-9)
    assert s.rms == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    # a sine at f Hz crosses zero ~2*f*dur times
    assert abs(s.zero_crossings - 2 * freq * dur) <= 2
    assert rows["junk"].ok is False
    assert rows["junk"].duration_sec is None


def test_lang_id_distinct_matches_expr(spark):
    """The distinct->mapInPandas path must agree with the JVM-side
    lang_predict expression on every fixture row (single-source
    constants)."""
    from pyspark.sql import functions as F

    from advanced_data_profile_spark.functions.text import lang_predict
    from advanced_data_profile_spark.operators.text_ml import lang_id_distinct

    texts = [
        "the quick brown fox and the lazy dog are on this hill",
        "der hund und die katze sind nicht mit dem vogel zu sehen",
        "le chat et le chien sont dans la maison avec les enfants",
        "el perro y el gato que viven en la casa son grandes",
        "il gatto e il cane che sono della casa non vanno per strada",
        "o gato e o cachorro da casa para um passeio com mais amigos",
        "de hond en de kat zijn niet in het huis maar ze zijn er wel",
        "och jag vet inte om det som du har sagt till oss",
        "nie wiem czy to jest tak jak on bardzo chce przez caly dzien",
        "yang ini dan itu tidak akan pergi dari sini dengan cepat",
        "这是一个中文句子",
        "これはひらがなのテキストです",
        "한국어 문장입니다",
        "Это русское предложение",
        "هذه جملة عربية",
        "",
        "zzz qqq xxx",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    via_udf = {
        r.text: r.lang_pred
        for r in lang_id_distinct(df, "text").collect()
    }
    via_expr = {
        r.text: r.p
        for r in df.select("text", lang_predict(F.col("text")).alias("p")).collect()
    }
    assert via_udf == via_expr
    # spot-check scripts + a few markers
    assert via_expr["这是一个中文句子"] == "zh"
    assert via_expr["これはひらがなのテキストです"] == "ja"
    assert via_expr["한국어 문장입니다"] == "ko"
    assert via_expr["Это русское предложение"] == "ru"
    assert via_expr["هذه جملة عربية"] == "ar"
    assert via_expr["zzz qqq xxx"] == "und"
    assert via_expr[texts[0]] == "en"
    assert via_expr[texts[1]] == "de"


def test_csv_parity_end_to_end(spark, tmp_path):
    """CSV -> infer_types -> apply_types -> profile, the reference's
    load path (Profiler.py:525-537) on a pinned small CSV."""
    from advanced_data_profile_spark.operators.stats import profile
    from advanced_data_profile_spark.sources.csvfile import read_csv, read_csv_typed

    pdf = pd.DataFrame({
        "id": range(1, 509),
        "price": [round(1.5 + i * 0.25, 2) for i in range(508)],
        "day": pd.date_range("2023-01-01", periods=508).strftime("%Y-%m-%d"),
        "name": [f"row {i}" for i in range(508)],
    })
    path = str(tmp_path / "in.csv")
    pdf.to_csv(path, index=False)

    raw = read_csv(spark, path)
    assert dict(raw.dtypes) == {c: "string" for c in pdf.columns}

    typed, decisions = read_csv_typed(spark, path, sample_rows=100)
    assert decisions["id"].logical == "integer"
    assert decisions["price"].logical == "float"
    assert decisions["day"].logical == "date"
    assert decisions["name"].logical == "string"
    d = dict(typed.dtypes)
    assert d["id"] == "bigint" and d["day"] == "date"

    prof = {r.column: r for r in profile(typed).collect()}
    assert prof["id"].n_rows == 508
    assert prof["id"].min_num == 1.0 and prof["id"].max_num == 508.0
    assert prof["price"].n_distinct == 508


def test_profile_table_report_end_to_end(spark, tmp_path):
    """The reference's main flow (main.py:14-43): CSV -> inference ->
    profile/top-k/histograms/correlation -> renderable report dict."""
    from advanced_data_profile_spark.plans.html_report import render_html
    from advanced_data_profile_spark.plans.profile_report import profile_table_report
    from advanced_data_profile_spark.sources.csvfile import read_csv_typed

    pdf = pd.DataFrame({
        "id": range(1, 301),
        "price": [round(1.5 + i * 0.25, 2) for i in range(300)],
        "qty": [i % 7 + 1 for i in range(300)],
        "day": pd.date_range("2023-01-01", periods=300).strftime("%d.%m.%Y"),
        "segment": ["a", "b", "c"] * 100,
        "note": [
            f"the quick delivery note number {i} mentions a shipment" for i in range(300)
        ],
    })
    path = str(tmp_path / "in.csv")
    pdf.to_csv(path, index=False)
    typed, decisions = read_csv_typed(spark, path, sample_rows=100)
    rep = profile_table_report(typed, "t", decisions=decisions)

    cols = rep["partitions"]["__all__"]["columns"]
    assert cols["day"]["logical_type"] == "date"        # dd.MM.yyyy via generator
    assert cols["id"]["logical_type"] == "integer"
    assert cols["id"]["n_rows"] == 300 and cols["id"]["n_distinct"] == 300
    assert {v["value"] for v in rep["top_values"]["segment"]} == {"a", "b", "c"}
    assert any(r["column"] == "price" for r in rep["histograms"])
    assert any({r["col_a"], r["col_b"]} == {"id", "price"} for r in rep["correlation"])
    assert rep["total_rows"] == 300 and rep["row_sample"]
    # 3 numeric cols -> PCA section; free-text col -> word freq + Flesch
    assert {r["feature"] for r in rep["pca_importance"]} == {"id", "price", "qty"}
    note = rep["text_analysis"]["note"]
    assert any(w["word"] == "shipment" for w in note["word_frequencies"])
    assert note["mean_flesch"] is not None
    # reference "Languages Detected with Confidence" (Profiler.py:
    # 663-673): top-5 (lang, conf%) pairs, best-confidence-per-language
    langs = note["languages_detected"]
    assert langs and langs[0]["lang"] == "en"
    assert all(0.0 < r["conf"] <= 100.0 for r in langs)
    confs = [r["conf"] for r in langs]
    assert confs == sorted(confs, reverse=True) and len(langs) <= 5

    doc = render_html(rep)
    for sec in ("Top values", "Correlation", "PCA feature importance",
                "Text analysis", "Histograms", "Random row sample",
                ">date<", ">integer<", "shipment", "languages detected"):
        assert sec in doc, sec


def test_html_report_structure(spark, images_path, tmp_path):
    """Golden-structure test for the rendered HTML artifact over the
    canonical 4x250 fixture (reference Profiler.py:1080-1112)."""
    from advanced_data_profile_spark.plans.html_report import (
        render_html,
        write_html_report,
    )
    from advanced_data_profile_spark.plans.pipeline import run_pipeline
    from advanced_data_profile_spark.plans.report import assemble_report

    out = str(tmp_path / "out")
    run_pipeline(spark, images_path, out)
    report = assemble_report(spark, out)
    html_doc = render_html(report)

    for section in (
        "<h1>Data profile &amp; validation",
        "<h2>Partition 0",
        "<h2>Partition 3",
        "<h3>Column profile</h3>",
        "<h3>Constraints</h3>",
        "<h3>Drift vs baseline</h3>",
        "<h2>Histograms</h2>",
        "<h2>Random row sample</h2>",
        "<h2>Violation samples</h2>",
        "<h2>Lineage (manifest)</h2>",
        "<svg",
    ):
        assert section in html_doc, f"missing section {section}"
    # planted violations must render FAIL verdicts
    assert '<span class="fail">FAIL</span>' in html_doc
    # no raw payloads in the artifact
    assert "bytes" not in report.get("row_sample", [{}])[0]

    path = write_html_report(report, str(tmp_path / "report.html"))
    assert path.endswith(".gz")
    with gzip.open(path, "rb") as f:
        assert f.read().startswith(b"<!DOCTYPE html>")


def test_wav_odd_payload_riff_padding():
    """RIFF 2-byte alignment: 8-bit PCM with an odd sample count gets a
    pad byte after the data chunk; the chunk size field stays unpadded,
    the RIFF size covers the pad, and decode round-trips."""
    rate = 8000
    x = np.linspace(-0.9, 0.9, 501)  # odd count -> odd 8-bit payload
    payload = encode_wav(x, rate, bits=8)
    # data chunk says 501 bytes but the file carries the pad byte
    assert len(payload) % 2 == 0
    riff_size = int.from_bytes(payload[4:8], "little")
    assert riff_size == len(payload) - 8  # pad included in RIFF size
    i = payload.index(b"data")
    assert int.from_bytes(payload[i + 4: i + 8], "little") == 501
    got_rate, got = decode_wav(payload)
    assert got_rate == rate and len(got) == 501
    assert float(np.abs(got - x).max()) < 1.0 / 120  # 8-bit quantization


def test_lang_id_model_plug_swap_in(spark):
    """The prod fasttext swap-in path, exercised with a fake
    fasttext-shaped model: (a) _fasttext_predict parses __label__ output
    and caches the loaded model per worker process (loaded ONCE across
    batches — the SparkFiles/--files pattern), (b) lang_id_distinct
    accepts any batch predictor and joins its labels back to rows."""
    import sys
    import types

    from advanced_data_profile_spark.operators import text_ml

    loads = []

    class _FakeModel:
        def predict(self, t):
            return ((f"__label__xx_{t.split()[0]}",), (0.99,))

    fake = types.ModuleType("fasttext")
    fake.load_model = lambda path: (loads.append(path), _FakeModel())[1]
    old_mod = sys.modules.get("fasttext")
    old_model = text_ml._FASTTEXT_MODEL
    sys.modules["fasttext"] = fake
    text_ml._FASTTEXT_MODEL = None
    try:
        out1 = list(text_ml._fasttext_predict(["hola mundo", "bonjour", None]))
        out2 = list(text_ml._fasttext_predict(["ciao"]))
        assert out1 == ["xx_hola", "xx_bonjour", "und"]
        assert out2 == ["xx_ciao"]
        assert len(loads) == 1  # model loaded once, reused across batches
    finally:
        text_ml._FASTTEXT_MODEL = old_model
        if old_mod is None:
            del sys.modules["fasttext"]
        else:
            sys.modules["fasttext"] = old_mod

    # the distributed swap-in: any fasttext-shaped batch predictor rides
    # the same distinct→mapInPandas→join-back path (runs on executors —
    # the closure ships via cloudpickle exactly like a model wrapper)
    def fake_predict(texts):
        return pd.Series(
            ["zz" if t else "und" for t in texts], dtype="object"
        )

    df = spark.createDataFrame(
        pd.DataFrame({"text": ["hello world", "hello world", None, "abc"]})
    )
    from advanced_data_profile_spark.operators.text_ml import lang_id_distinct

    rows = lang_id_distinct(df, "text", predict_fn=fake_predict).collect()
    got = {(r.text, r.lang_pred) for r in rows}
    assert got == {("hello world", "zz"), (None, "und"), ("abc", "zz")}
    assert len(rows) == 4  # duplicate rows preserved by the join-back
