"""Text-analysis kernels: tokenization, quality, lang-ID, fingerprints."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.functions import text as X


@pytest.fixture(scope="module")
def sample(spark):
    pdf = pd.DataFrame({
        "t": [
            "The quick brown fox jumps over the lazy dog and runs away fast",
            "der hund ist nicht mit der katze und dem vogel zu sehen",
            "le chat est dans la maison avec les enfants et le chien",
            "el perro es un animal que vive en la casa con las personas",
            "这是一个中文句子用来测试语言识别",
            "",
            "!!! ??? ###",
            "xyzzy plugh qwerty",
        ]
    })
    return spark.createDataFrame(pdf)


def test_token_count(spark, sample):
    rows = sample.select(X.token_count(F.col("t")).alias("tc")).collect()
    assert rows[0].tc == 13
    assert rows[5].tc == 0        # empty
    assert rows[6].tc == 0        # punctuation only -> normalized empty


def test_norm_text(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["  Hello,   WORLD!! 42 "]}))
    assert df.select(X.norm_text(F.col("t")).alias("n")).first().n == "hello world 42"


def test_stopword_punct_ratio(spark, sample):
    r = sample.select(
        F.round(X.stopword_ratio(F.col("t")), 4).alias("sw"),
        F.round(X.punct_ratio(F.col("t")), 4).alias("pr"),
    ).collect()
    assert r[0].sw == pytest.approx(3 / 13, abs=1e-4)  # the, the, and
    assert r[5].sw == 0.0 and r[5].pr == 0.0
    assert r[6].pr == pytest.approx(9 / 11, abs=1e-4)


def test_lang_predict(spark, sample):
    preds = [r.p for r in sample.select(X.lang_predict(F.col("t")).alias("p")).collect()]
    assert preds[0] == "en"
    assert preds[1] == "de"
    assert preds[2] == "fr"
    assert preds[3] == "es"
    assert preds[4] == "zh"
    assert preds[5] == "und"
    assert preds[7] == "und"


def test_langid_on_documents(spark):
    # the synthetic corpus text is English-ish SQL vocabulary for every
    # lang label (labels are random metadata), so the detector must call
    # it en/und regardless of label — and be deterministic across runs.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = {
        r.p: r.c
        for r in docs.select(X.lang_predict(F.col("text")).alias("p"))
        .groupBy("p").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    en_like = counts.get("en", 0) + counts.get("und", 0)
    assert en_like / sum(counts.values()) > 0.95


def test_winnowing_guarantee(spark):
    """Winnowing's correctness property (Schleimer et al. 2003): two
    docs sharing a substring of length >= k + w - 1 share at least one
    fingerprint; disjoint docs share none."""
    shared = "the common stretch of text that both documents contain"
    pdf = pd.DataFrame({"t": [
        "prefix one " + shared + " suffix alpha",
        "totally different opening " + shared + " and another ending",
        "zzzzz qqqqq xxxxx jjjjj kkkkk wwwww vvvvv bbbbb nnnnn mmmmm",
    ]})
    df = spark.createDataFrame(pdf)
    fps = [set(r.fp) for r in
           df.select(X.winnow_fingerprints(F.col("t"), k=5, w=4).alias("fp")).collect()]
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    # documents shorter than k+w-1 normalized chars (and empty/null
    # text) have NO windows: empty set, not a crash
    short = spark.createDataFrame(
        pd.DataFrame({"t": ["", "hi", "1234567", None]})
    ).select(X.winnow_fingerprints(F.col("t"), k=5, w=4).alias("fp")).collect()
    assert all(r.fp == [] for r in short)
    # disjoint text: no shared k-grams -> no shared 60-bit fingerprints
    assert not fps[0] & fps[2]
    # fingerprints are sorted + deduped
    out = df.select(X.winnow_fingerprints(F.col("t")).alias("fp")).first().fp
    assert out == sorted(set(out))


def test_fingerprint_normalization_invariance(spark):
    pdf = pd.DataFrame({"t": ["Hello   World", "hello world", "HELLO, WORLD!", "other"]})
    fps = [
        r.fp for r in spark.createDataFrame(pdf)
        .select(X.fingerprint(F.col("t")).alias("fp")).collect()
    ]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]
    assert all(fp >= 0 for fp in fps)


def test_quality_score_bounds(spark, sample):
    rows = sample.select(X.quality_score(F.col("t")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    assert rows[0].q > rows[6].q  # real sentence beats punctuation soup


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["short words here", "a extraordinarily incomprehensible word"]}))
    r = [x.b for x in df.select(X.bpe_ish_token_count(F.col("t")).alias("b")).collect()]
    assert r[0] == 3
    assert r[1] > 4  # long words split into multiple pieces


def test_char_ngrams(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["abcd"]}))
    grams = df.select(X.char_ngrams(F.col("t"), 3).alias("g")).first().g
    assert grams == ["abc", "bcd"]


def test_lang_predict_round3_breadth(spark):
    """Round-3 languages: marker languages (unaccented function words
    only) + new script rules, incl. the uk-before-ru ordering."""
    pdf = pd.DataFrame({"t": [
        "og det er jeg ikke sikker der til af hvad hun den siger",   # da
        "og det er jeg ikke en til av de han meg noe mer",           # no ("av/meg/noe")
        "ja on ei se oli mutta kun niin kuin hyvin jos tulee",       # fi
        "az nem hogy van egy ha mint csak volt lesz ki mondja",      # hu
        "je se na ale jako pro od ani nebo kdy tak dobre",           # cs
        "na ya wa kwa ni za katika kama hii pia sana habari",        # sw
        "ang ng mga sa ay ito para hindi ako siya kanya",            # tl
        "це і є українська мова з літерами є ї і",                   # uk (і, є, ї)
        "это русский текст без украинских букв",                      # ru
        "এটি একটি বাংলা বাক্য",                                        # bn
        "இது ஒரு தமிழ் வாக்கியம்",                                      # ta
    ]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    assert preds == ["da", "no", "fi", "hu", "cs", "sw", "tl",
                     "uk", "ru", "bn", "ta"]


def test_lang_predict_round4_breadth(spark):
    """Round-4 languages: 11 new Latin-script marker languages and the
    new script rules, incl. the family orderings (ur before fa before
    ar; kk before uk before mn before ru) and sibling discrimination
    (sk-vs-cs, lv-vs-lt, af-vs-nl, hr-vs-sl)."""
    pdf = pd.DataFrame({"t": [
        "die mense wil nie vir hulle baie iets doen nie wees",       # af
        "els llibres amb aquest tema mes dels que la seva fins",     # ca
        "mae wedi bod yn gweithio gan fel ond hefyd yma",            # cy
        "see raamat kui mis oma siis veel veidi aega",               # et
        "eta hori da ez du bat hau dela baina izan zen",             # eu
        "agus bhi said ar go leor na le ach bhfuil nach",            # ga
        "su ali kao da nije ili sto ovo bio dobro",                  # hr
        "ir yra kad bet kaip jis buvo tik namas",                    # lt
        "un ir tas par vai no savu kas bija",                        # lv
        "som ako ale aj za bol tento clovek ktore",                  # sk
        "so pa tudi kot lahko bilo nekaj tega dne",                  # sl
        "یہ اردو زبان ہے",                                            # ur (heh goal + bari ye)
        "این متن فارسی است با گچپژ",                                  # fa (gaf/che/pe/zhe)
        "бұл қазақ тілі әрі ұлттық",                                  # kk (қ/ә/ұ before uk/ru)
        "энэ бол монгол хэл юм өө үү",                                # mn (ө/ү before ru)
        "ಇದು ಕನ್ನಡ ವಾಕ್ಯ",                                             # kn
        "ഇത് മലയാളം വാക്യം",                                           # ml
        "આ ગુજરાતી વાક્ય છે",                                          # gu
        "ਇਹ ਪੰਜਾਬੀ ਵਾਕ ਹੈ",                                            # pa
        "នេះជាភាសាខ្មែរ",                                              # km
        "ນີ້ແມ່ນພາສາລາວ",                                              # lo
        "ይህ አማርኛ ነው",                                                # am
        "བོད་སྐད་ཡིན།",                                                 # bo
    ]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    assert preds == ["af", "ca", "cy", "et", "eu", "ga", "hr", "lt",
                     "lv", "sk", "sl", "ur", "fa", "kk", "mn", "kn",
                     "ml", "gu", "pa", "km", "lo", "am", "bo"]


def test_redact_pii_planted(spark):
    """Redaction over planted PII: emails, URLs (with embedded email),
    IPv4s, long digit runs — and a DUAL-ENGINE parity check running the
    same single-source patterns through DuckDB on identical rows
    (the driver fixture contains no PII, so the cross-engine semantics
    are pinned here on adversarial inputs)."""
    import duckdb

    from advanced_data_profile_spark.functions.text import (
        PII_PATTERNS,
        pii_counts,
        redact_pii,
    )

    texts = [
        "contact me at jane.doe+spam@example.co.uk please",
        "see https://user@host.example.com/path?q=1#frag for details",
        "server at 192.168.0.1 and 10.0.0.255, card 4111111111111111",
        "no pii here at all",
        "mixed: http://a.b/c x@y.io 1.2.3.4 12345678901234567",
        "",
        None,
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "t": texts})
    df = spark.createDataFrame(pdf)
    counts = pii_counts(F.col("t"))
    out = df.select(
        "doc_id", redact_pii(F.col("t")).alias("red"),
        *[F.coalesce(c, F.lit(0)).alias(f"n_{k}") for k, c in counts.items()],
    ).collect()
    by = {r.doc_id: r for r in out}
    assert by[0].red == "contact me at <EMAIL> please"
    assert by[1].red == "see <URL> for details"     # email inside URL -> URL
    assert by[1].n_url == 1 and by[1].n_email == 1  # counts are per-class
    assert by[2].red == "server at <IP> and <IP>, card <NUM>"
    assert by[3].red == "no pii here at all"
    assert by[4].n_url == by[4].n_email == by[4].n_ip == by[4].n_longnum == 1
    assert by[6].red is None

    # dual-engine parity: DuckDB applies the SAME patterns
    red_sql = "t"
    for _, pattern, token in PII_PATTERNS:
        red_sql = f"regexp_replace({red_sql}, '{pattern}', '{token}', 'g')"
    con = duckdb.connect()
    con.register("docs", pdf)
    oracle = {
        r[0]: r[1]
        for r in con.execute(f"SELECT doc_id, {red_sql} FROM docs").fetchall()
    }
    for r in out:
        assert oracle[r.doc_id] == r.red, r.doc_id


def test_lang_predict_round5_breadth(spark):
    """Round-5 languages: 27 new Latin-script marker languages + 17 new
    script rules (total surface now >= 100), incl. the new family
    orderings (ps/sd/ug/ku before fa/ar; tg/tt/ba/cv/be/sr/mk before
    ru; as before bn) and sibling discrimination (ms-vs-id, ceb-vs-tl,
    gl-vs-pt, is-vs-no/da, fy-vs-nl, gd-vs-ga, uz-vs-tr)."""
    from advanced_data_profile_spark.functions.text import (
        LANG_MARKERS,
        SCRIPT_RULES,
    )

    assert len(LANG_MARKERS) + len(SCRIPT_RULES) >= 100
    # script rule languages and marker languages never overlap
    assert not set(LANG_MARKERS) & {lang for lang, _ in SCRIPT_RULES}

    cases = [
        ("anda boleh pergi kerana mereka telah ada dalam bilik itu ialah", "ms"),
        ("dhe kjo nje gjuhe eshte por nuk jane shume njerez", "sq"),
        ("unha lingua polo tanto coa xente nunha vila ata moi lonxe", "gl"),
        ("ech hunn dat mat fir ze maachen an ass och vun him", "lb"),
        ("din hija lingwa li kif ukoll jew dan ta maltin", "mt"),
        ("gallia est omnis divisa in partes tres quod cum sed non atque", "la"),
        ("tio estas lingvo kaj mi parolas kun vi tre ankau por ne", "eo"),
        ("waxaa jira dad badan oo iyo waa uu aan aad u mid ah", "so"),
        ("akwai mutane da yawa cikin wannan gari suka zo yake amma", "ha"),
        ("awon eniyan ati oro naa si fun won nigba ti o ni", "yo"),
        ("ndi otu ihe nke oma maka na ya bu ihe a", "ig"),
        ("ukuthi abantu futhi ngoba kodwa lokhu kanye nabo", "zu"),
        ("ukuba abantu kwaye oku ngoku kuba yaye bona", "xh"),
        ("abantu kandi ariko cyane ubwo uko ndetse bose", "rw"),
        ("ny olona sy ny fiteny dia amin izany tamin ho ary", "mg"),
        ("ang mga tawo og nga kini usa gyud ka dili kay adunay", "ceb"),
        ("wong akeh lan ing kang iku saka kanthi ora wis teka", "jv"),
        ("jalma rea jeung dina anu teu ieu tina henteu oge datang", "su"),
        ("odamlar kop va bu bilan uchun ham emas lekin edi davlat", "uz"),
        ("adamlar kop we bu bilen ucin hem dal bolan yaly diyip", "tk"),
        ("de minsken wolle it dat net mar ek foar wurde hawwe", "fy"),
        ("folk vilja og tala ekki sem hann hefur mjog var enn", "is"),
        ("moun yo nan peyi a ak pou li te sa ki yon nou", "ht"),
        ("tha daoine ann gun obair airson chan anns bha aig sin", "gd"),
        ("tud zo hag eo ar yezh en ur gant evit ket bet", "br"),
        ("vanhu vazhinji uye zvakare asi iyi kana uku vose", "sn"),
        ("anthu ambiri ndi komanso ngati chifukwa kwambiri zimene", "ny"),
        # script rules, incl. ordering within families
        ("دا پښتو ژبه ده ټول خلک ئې وايي ډېره ښه ده", "ps"),
        ("هيءَ سنڌي ٻولي آهي ڄاڻ ۽ ڳالهه ٻولهه جي ٻولي", "sd"),
        ("بۇ ئۇيغۇر تىلى بولۇپ ئۈچۈن ياخشى", "ug"),
        # round-7: the Sorani letter rule now labels ckb (fasttext
        # splits Sorani ckb from Latin-script Kurmanji ku)
        ("ئەمە زمانی کوردیيە ڕاست و دڵسۆز و جوانە بێگومان", "ckb"),
        ("ин забони тоҷикӣ аст ва хеле зебоӯст бе гумон", "tg"),
        ("бу татар теле һәм бик матур җыр яңгырый", "tt"),
        ("был башҡорт теле һәм бик матур ҙур ил", "ba"),
        ("ку чӑваш чӗлхи пулать питӗ илемлӗ ӳкерчӗк", "cv"),
        ("гэта беларуская мова і яна вельмі прыгожая ў свеце", "be"),
        ("ово је српски језик ћирилицом и веома је леп ђак", "sr"),
        ("ова е македонски јазик со ѕвезда и убава ќерка и ѓерѓеф", "mk"),
        ("tiếng việt là ngôn ngữ của người việt nam", "vi"),
        ("bu azərbaycan dilidir və çox gözəldir əlbəttə", "az"),
        ("ދިވެހިބަހަކީ ރާއްޖޭގެ ރަސްމީ ބަހެވެ", "dv"),
        ("ᏣᎳᎩ ᎦᏬᏂᎯᏍᏗ ᎤᏬᏂᎯᏍᏗ", "chr"),
        ("ᐃᓄᒃᑎᑐᑦ ᐅᖃᐅᓯᖅ ᐱᐅᔪᖅ", "iu"),
        ("এয়া অসমীয়া ভাষা ৰং আৰু ৱাণী", "as"),
    ]
    pdf = pd.DataFrame({"t": [t for t, _ in cases]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    expected = [lang for _, lang in cases]
    mism = [
        (t[:30], want, got)
        for (t, want), got in zip(cases, preds) if want != got
    ]
    assert not mism, mism


def test_lang_predict_round6_breadth(spark):
    """Round-6 languages (total surface now >= 150, toward lid.176):
    42 new Latin-script marker languages + 8 new script rules, incl.
    the RE2-safe anchored combo rules (ky needs both its letters with
    zero Kazakh-only ones; bg needs doubled vowel-jer with zero
    Russian-only letters) and the family orderings (yi before he;
    sah/mhr/ky before kk; ce/os/kv/bg before ru)."""
    from advanced_data_profile_spark.functions.text import (
        LANG_MARKERS,
        SCRIPT_RULES,
    )

    assert len(LANG_MARKERS) + len(SCRIPT_RULES) >= 150
    assert not set(LANG_MARKERS) & {lang for lang, _ in SCRIPT_RULES}

    cases = [
        ("dei ville ikkje ha eit anna ord for kva som er noko anna", "nn"),
        ("aquela lenga se parla dins lo pais tanben atal per lor", "oc"),
        ("esta ye una llingua que nun se fala tamien nesti llugar", "ast"),
        ("ista luenga se charra ta toz istos lugars con muitas chen bi", "an"),
        ("sta lingua si parla micca quessa ancu induve issu campa", "co"),
        ("custa limba si faeddat in sos logos e in sas biddas unu meda", "sc"),
        ("sta lingua nun si parra chiu comu idda nenti cca lu sapi", "scn"),
        ("chella lengua nuje aggio visto pecche cchiu cumme chillo parla", "nap"),
        ("sta lengua la xe anca parlada dela zente co schei cussi", "vec"),
        ("sta lenga as parla mach nen dco sossi chiel andoa", "pms"),
        ("questa lengua minga parlada insci de quel vun semper chi", "lmo"),
        ("quai lingua betg ina ins era tgi discurra uschia", "rm"),
        ("dji so ki walon avou nosse lingaedje todi foirt", "wa"),
        ("iste es un lingua que nos pote anque esser parlate de illo alicun", "ia"),
        ("ti lingue esset vell anc quel quo on parla", "ie"),
        ("ica linguo esas anke parlata quale kande irga ulu volas", "io"),
        ("atos binos das obs ko ed jival oba", "vo"),
        ("coi do tavla klama le zarci kei cusku", "jbo"),
        ("yma an yeth ow kewsel gans dhe ny yw hwi", "kw"),
        ("ta yn chengey ayns myr agh shoh va cha nee", "gv"),
        ("the fowk didna ken frae whit wis aboot tae gang gey", "sco"),
        ("dat is nich mol wat dor op sik hett seggt", "nds"),
        ("des is ned aa so vui wia hod wos gsagt obba", "bar"),
        ("des isch au nit eso dr fall scho gsi wia men seit", "als"),
        ("det jongen foon ham uk wat deet leet weesen", "frr"),
        ("da was nie ip oltied geweune ol die dingen", "vls"),
        ("det is neet ouch waat veur mich zoeget", "li"),
        ("to njeje potom hdy sym wot was zo prajil", "hsb"),
        ("to njejo ako togo ga won pon gronil", "dsb"),
        ("umi tapicha avei upe ndaje ko arape oiko", "gn"),
        ("chaymanta paykuna kunan manam kay runa simita rimanku", "qu"),
        ("huan tlen ipan amo inin nican altepetl itech", "nah"),
        ("dagiti tattao kadagiti ngem saan idiay kadagitoy a lugar", "ilo"),
        ("an waray ngan hin ini nga mga tawo han lugar", "war"),
        ("deng tao ning keng ati metung karing lugar", "pam"),
        ("urang indak dek iko bana sadonyo awak pai", "min"),
        ("maga gente ele kita ansina kame conversa el lengua", "cbk"),
        ("hamar logan rahaa uske karta bhi hai waha se aaya", "hif"),
        ("la lhengua cumo anton ye screbida nun dua forma", "mwl"),
        ("nece kirj om ka kut ani sines kirjutadud", "vep"),
        ("des is awwer unn aa ned gewwe halt devun", "pfl"),
        ("na ziwan de zaf esto yeno wina qande vano", "diq"),
        # script rules
        ("דאָס איז אַ שפּראַך װאָס מען רעדט דאָ צװישן אַלע", "yi"),
        ("саха тылынан кэпсэтэр дьон аҕыйах буолбатах", "sah"),
        ("чыла еҥ марий йылмым пагала тунемеш", "mhr"),
        ("бул кыргыз тили эң сонун көрүнөт бизге", "ky"),
        ("хара нохчийн мотт бу ӏаламат хаза Ӏалашо", "ce"),
        ("ацы ирон ӕвзаг у тынг рӕсугъд ӕмӕ аив", "os"),
        ("тайӧ коми кыв зэв мича сійӧ миян", "kv"),
        ("това е български език който е много хубав и първият въпрос е възможен", "bg"),
        ("佢哋喺度講嘅嘢我唔知咁多", "yue"),
    ]
    pdf = pd.DataFrame({"t": [t for t, _ in cases]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    mism = [
        (t[:30], want, got)
        for (t, want), got in zip(cases, preds) if want != got
    ]
    assert not mism, mism


def test_lang_predict_round6_sibling_discrimination(spark):
    """The new rules must not steal their siblings' text: kk/mn keep
    winning over the new ky combo rule, ru keeps winning over bg when
    Russian-only letters appear, he over yi without ligatures, and the
    crowded Germanic/Romance marker space still resolves de/nl/it/es
    correctly."""
    cases = [
        # Kazakh: has ң AND ө but also қ/ғ — must stay kk, not ky
        ("бұл қазақ тілі өте әдемі ғой дейміз ңыз", "kk"),
        # Mongolian: ө/ү but no ң — must stay mn
        ("энэ монгол хэл өөрийн үндэсний хэл юм", "mn"),
        # Russian with ъ twice BUT ы present — must stay ru, not bg
        ("объект и субъект были очень разными", "ru"),
        # Hebrew without Yiddish ligatures — must stay he
        ("זוהי שפה עברית יפה מאוד בעולם", "he"),
        # Mandarin without Cantonese particles — must stay zh
        ("这是一种很好的语言我们都喜欢说", "zh"),
        # Mandarin using 唔 as an interjection and 咁 in quoting — both
        # are excluded from the yue class exactly for this reason
        ("唔我知道了他咁说的这是普通话句子", "zh"),
        ("das ist nicht der fall und ich bin ein mensch mit den", "de"),
        ("de mensen hebben het niet gezien maar ze zijn er ook", "nl"),
        ("il ragazzo non sono della citta che per una nel alla", "it"),
        ("el hombre es que en un una por con para del los", "es"),
        # micro-language marker sets must not claim short texts of the
        # major languages through THEIR high-frequency words: 'ele'
        # (pt pronoun), 'nos' (pt/es), 'quale' (it), 'das' (de) are
        # excluded from cbk/ia/io/vo marker sets by design
        ("ele disse que ele viu o carro com mais pessoas", "pt"),
        ("nos vamos a la casa y el perro es de los dos", "es"),
        ("quale di questi libri non sono della scuola che", "it"),
        ("das haus und das auto sind nicht der grund", "de"),
    ]
    pdf = pd.DataFrame({"t": [t for t, _ in cases]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    mism = [
        (t[:30], want, got)
        for (t, want), got in zip(cases, preds) if want != got
    ]
    assert not mism, mism


def test_lang_predict_round6b_shared_block_splitting(spark):
    """Word-sequence script rules split languages sharing a block:
    Devanagari mr/ne/sa before the hi fallback, Egyptian Arabic before
    ar — with sibling cases pinning that plain Hindi / Modern Standard
    Arabic text is untouched. Total surface now >= 160."""
    from advanced_data_profile_spark.functions.text import (
        LANG_MARKERS,
        SCRIPT_RULES,
    )

    assert len(LANG_MARKERS) + len(SCRIPT_RULES) >= 160
    cases = [
        ("ही मराठी भाषा आहे आणि ती खूप सुंदर आहे", "mr"),
        ("यी नेपाली वाक्यहरू हुन् र राम्रा छन्", "ne"),
        ("संस्कृतम् उत्तमा भाषा अस्ति इति वदन्ति", "sa"),
        ("यह हिंदी भाषा है और बहुत सुंदर है", "hi"),
        ("انا مش عارف ازاي اروح هناك دلوقتي", "arz"),
        ("هذه اللغة العربية الفصحى جميلة جدا", "ar"),
        ("an mga tawo kan banwa nin kaya arog kaini dakul", "bcl"),
    ]
    pdf = pd.DataFrame({"t": [t for t, _ in cases]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    mism = [
        (t[:30], want, got)
        for (t, want), got in zip(cases, preds) if want != got
    ]
    assert not mism, mism


def test_lang_predict_round7_breadth(spark):
    """Round-7: the last lid.176 tail (total surface now >= 176).
    New splits of shared scripts: Sorani ckb keeps the Arabic-letter
    rule while Latin Kurmanji ku moves to markers; Shahmukhi pnb /
    azb / mzn / lrc before fa-ar; Caspian-Cyrillic xal / tyv / bxr /
    mrj / rue / av / lez / krc / myv before their block fallbacks;
    Devanagari dty / mai / bh / new / gom before hi; bpy before bn;
    xmf before ka; wuu before zh; bs / sh beside hr.  Every case also
    pins lang_top_k's top-1 to the lang_predict label (same decision
    order by construction)."""
    from advanced_data_profile_spark.functions.text import (
        LANG_MARKERS,
        SCRIPT_RULES,
        lang_top_k,
    )

    assert len(LANG_MARKERS) + len(SCRIPT_RULES) >= 176
    assert not set(LANG_MARKERS) & {lang for lang, _ in SCRIPT_RULES}

    cases = [
        # Latin-script markers
        ("ev ziman ku gelek kes ji wan dike u dibe heye bi li hem", "ku"),
        ("znam da je to bilo kako nakon rata bez svoje djece njih se", "bs"),
        ("oni ih vidjeli im uz kod posle rata", "sh"),
        # Arabic-script splits
        ("ایہ پنجابی بولی اے تے بہت سوہنی اے", "pnb"),
        ("هۉمە زوٙن لۊری", "lrc"),
        ("بو دیل تورکجه سی اولان دیلدیر", "azb"),
        ("اینتا زوون مازرونی نومش هسه", "mzn"),
        # Cyrillic splits
        ("эн хальмг келн болн сәәхн келн", "xal"),
        ("бо тыва дыл болгаш чүве бижиир", "tyv"),
        ("энэ буряад хэлэн һайн даа", "bxr"),
        ("тидӹ кырык мары йӹлмӹ ылеш", "mrj"),
        ("русиньскый язык має і свою бісіду", "rue"),
        ("гьаб авар мацӏ буго жакъа", "av"),
        ("лезги чӏал гзаф авай халкьдин", "lez"),
        ("бу къарачай тил болгъан эмда ариу", "krc"),
        ("те эрзянь кель улить валт", "myv"),
        # Devanagari / Bengali / Georgian / Han splits
        ("यो डोटेली भाषा हो हुन्या", "dty"),
        ("ई मैथिली भाषा अछि आ नीक अछि", "mai"),
        ("ई भोजपुरी भाषा बाटे हमनी के", "bh"),
        ("थ्व नेपालभाषा खः जुया", "new"),
        ("ही कोंकणी भास आसा आनी बरी", "gom"),
        ("এহান বিষ্ণুপ্রিয়া মণিপুরী ঠার হানর", "bpy"),
        ("თე მარგალური ნინა რე ჸოროფა", "xmf"),
        ("侬好伐阿拉去买小菜", "wuu"),
    ]
    pdf = pd.DataFrame({"t": [t for t, _ in cases]})
    rows = (
        spark.createDataFrame(pdf)
        .select(
            X.lang_predict(F.col("t")).alias("p"),
            lang_top_k(F.col("t")).alias("k"),
        )
        .collect()
    )
    mism = [
        (t[:30], want, r.p)
        for (t, want), r in zip(cases, rows)
        if want != r.p or r.k[0].lang != r.p
    ]
    assert not mism, mism


def test_lang_predict_round7_sibling_discrimination(spark):
    """The round-7 rules must not steal sibling text: Persian keeps
    هسته‌ای ("nuclear" — NOT a Mazanderani trigger), Urdu keeps سوچ
    (the bare pnb وچ is space-delimited on both sides), hr survives
    beside the new bs/sh marker sets, ru/uk are untouched by the rue
    co-occurrence rule (each has only one of ы/і), Mandarin without Wu
    pronouns stays zh, plain Bengali stays bn, plain Georgian ka."""
    cases = [
        ("انرژی هسته‌ای ژاپن مهم است", "fa"),
        ("یہ اردو زبان ہے اور میری سوچ ہے", "ur"),
        ("ovo su rijeci ali kao da nije bilo", "hr"),
        ("это русский язык и он был красив", "ru"),
        ("це українська мова і вона є гарна", "uk"),
        ("这是普通话的句子我们说", "zh"),
        ("এটা বাংলা ভাষা খুব সুন্দর", "bn"),
        ("ეს ქართული ენა ძალიან ლამაზი", "ka"),
        # Mongolian ө/ү with no һ must stay mn, not bxr
        ("энэ монгол хэл өөрийн үндэсний хэл юм", "mn"),
        # Chechen palochka without av/lez function words stays ce
        ("хара нохчийн мотт бу хаза Ӏалашо", "ce"),
    ]
    pdf = pd.DataFrame({"t": [t for t, _ in cases]})
    preds = [
        r.p for r in spark.createDataFrame(pdf)
        .select(X.lang_predict(F.col("t")).alias("p")).collect()
    ]
    mism = [
        (t[:30], want, got)
        for (t, want), got in zip(cases, preds) if want != got
    ]
    assert not mism, mism


def test_lang_top_k_confidence(spark):
    """lang_top_k mirrors the reference's detect_language_with_
    confidence shape (Profiler.py:232-259): array of (lang, conf%)
    structs. Script-rule hit short-circuits to [(lang, 100.0)];
    marker texts get normalized-share confidences sorted descending
    and summing to <= 100; signal-free text gets [('und', 0.0)]."""
    from advanced_data_profile_spark.functions.text import lang_top_k

    pdf = pd.DataFrame({"t": [
        "это русский язык и он был красив",
        "the of and to in is was it for on the and of",
        "12345 9876 ... !!!",
    ]})
    rows = (
        spark.createDataFrame(pdf)
        .select(
            lang_top_k(F.col("t")).alias("k"),
            X.lang_predict(F.col("t")).alias("p"),
        )
        .collect()
    )
    assert [(e.lang, e.conf) for e in rows[0].k] == [("ru", 100.0)]
    pairs = [(e.lang, e.conf) for e in rows[1].k]
    assert pairs[0][0] == rows[1].p == "en"
    confs = [c for _, c in pairs]
    assert all(0.0 < c <= 100.0 for c in confs)
    assert confs == sorted(confs, reverse=True)
    assert sum(confs) <= 100.0 + 1e-6
    assert 1 <= len(pairs) <= 5
    assert [(e.lang, e.conf) for e in rows[2].k] == [("und", 0.0)]


def test_language_profile_operator(spark):
    """Per-column top-k language mix (reference Profiler.py:663-673):
    distinct texts -> per-text top-k -> best confidence per language,
    ordered by confidence. Duplicate texts collapse before detection."""
    from advanced_data_profile_spark.operators.text_ml import language_profile

    texts = (
        ["the cat sat on the mat and it was of the good kind"] * 3
        + [
            "el hombre es que en un una por con para del los",
            "das ist nicht der fall und ich bin ein mensch mit den",
            None,
        ]
    )
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    rows = language_profile(df, "t", k=5).collect()
    by_lang = {r.lang: r.conf for r in rows}
    assert {"en", "es", "de"} <= set(by_lang)
    assert all(0.0 < c <= 100.0 for c in by_lang.values())
    assert len(rows) == len(by_lang) <= 5
    confs = [r.conf for r in rows]
    assert confs == sorted(confs, reverse=True)


def test_lang_top_k_consistency_on_random_text(spark):
    """Structural invariants of the confidence output over 300 seeded
    random strings spanning Latin, diacritics, Cyrillic, and Han
    characters: top-1 always equals lang_predict's label, confidences
    are descending, within (0, 100], and sum to <= 100 (exactly 100.0
    for a script-rule hit, [('und', 0.0)] when signal-free)."""
    import random

    from advanced_data_profile_spark.functions.text import lang_top_k

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz  àèéöüßи汉 "
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    rows = df.select(
        X.lang_predict(F.col("t")).alias("p"),
        lang_top_k(F.col("t")).alias("k"),
    ).collect()
    for r in rows:
        pairs = [(e.lang, e.conf) for e in r.k]
        assert pairs and pairs[0][0] == r.p
        confs = [c for _, c in pairs]
        assert confs == sorted(confs, reverse=True)
        assert sum(confs) <= 100.0 + 1e-6
        if r.p == "und":
            assert pairs == [("und", 0.0)]
        else:
            assert all(0.0 < c <= 100.0 for c in confs)


def test_language_profile_plan_no_payload_shuffle(spark):
    """Scale contract: the only Exchange is the narrow (lang, conf)
    aggregation — no distinct / payload shuffle of the text column
    (max(conf) per language is duplicate-insensitive, so deduping
    first would cost a full-text shuffle for an identical result)."""
    from advanced_data_profile_spark.operators.text_ml import (
        language_profile,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"t": ["the of and to in is was"] * 4})
    )
    out = language_profile(df, "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # one exchange pair for the partial/final agg, nothing keyed on text
    assert plan.count("Exchange") <= 2
    rows = out.collect()
    assert rows and rows[0].lang == "en"


def test_lang_surface_covers_lid176_label_set():
    """Label parity with the reference's fasttext lid.176 model
    (Profiler.py:226-259): every language code the public lid.176
    model can emit has a marker set or script/word-sequence rule here
    (the heuristic differs in accuracy, not in label coverage)."""
    from advanced_data_profile_spark.functions.text import (
        LANG_MARKERS,
        SCRIPT_RULES,
    )

    ours = set(LANG_MARKERS) | {lang for lang, _ in SCRIPT_RULES}
    lid176 = set(
        "af als am an ar arz as ast av az azb ba bar bcl be bg bh bn bo "
        "bpy br bs bxr ca cbk ce ceb ckb co cs cv cy da de diq dsb dty "
        "dv el en eo es et eu fa fi fr frr fy ga gd gl gn gom gu gv he "
        "hi hif hr hsb ht hu hy ia id ie ilo io is it ja jbo jv ka kk "
        "km kn ko krc ku kv kw ky la lb lez li lmo lo lrc lt lv mai mg "
        "mhr min mk ml mn mr mrj ms mt mwl my myv mzn nah nap nds ne "
        "new nl nn no oc or os pa pam pfl pl pms pnb ps pt qu rm ro ru "
        "rue sa sah sc scn sco sd sh si sk sl so sq sr su sv sw ta te "
        "tg th tk tl tr tt tyv ug uk ur uz vec vep vi vls vo wa war wuu "
        "xal xmf yi yo yue zh".split()
    )
    assert not lid176 - ours, sorted(lid176 - ours)


def test_lang_confidence_calibration_contract(spark):
    """Pins the four characterized divergences between the heuristic's
    normalized marker-hit-share confidence and fasttext-style
    calibrated probabilities (lang_top_k's documented calibration
    contract — report consumers read conf as 'share of language
    evidence', not P(lang | text))."""
    rows = [
        ("mix", "the cat is on the mat and it is warm "
                "le chat est sur le tapis et il est chaud"),
        ("ratio", "the and of to the and of to le et la dans"),
        ("short", "the"),
        ("cyr", "привет мир как дела"),
        ("content", "analysis report network computing throughput "
                    "le la les"),
    ]
    df = spark.createDataFrame(rows, "id string, t string")
    got = {
        r.id: [(e.lang, e.conf) for e in r.tk]
        for r in df.select(
            "id", X.lang_top_k(F.col("t")).alias("tk")
        ).collect()
    }
    # 1. mixed text splits conf as SHARES: both halves score high,
    #    neither reaches 100, and the top-k shares never exceed 100
    #    total (a calibrated classifier would concentrate mass on one)
    mix = dict(got["mix"])
    assert {"en", "fr"} <= set(mix)
    assert 20 < mix["en"] < 60 and 20 < mix["fr"] < 60
    assert sum(mix.values()) <= 100.01
    # ...and shares track marker-hit RATIOS: 8 en hits vs 4 fr hits
    ratio = dict(got["ratio"])
    assert abs(ratio["en"] / ratio["fr"] - 2.0) < 0.01
    # 2. no length calibration: a one-word text with one marker hit is
    #    just as "confident" as a monolingual document
    assert got["short"] == [("en", 100.0)]
    # 3. script rules short-circuit to a single (lang, 100.0) — never a
    #    distribution over related same-script languages
    assert got["cyr"] == [("ru", 100.0)]
    # 4. marker share, not content volume, decides rank: a
    #    majority-English text whose English words are all CONTENT
    #    words (no markers) ranks French first — exactly where a real
    #    model's ranking would diverge from the heuristic's
    assert got["content"][0][0] == "fr"
    assert all(lang != "en" for lang, _ in got["content"])


def test_clean_text_transform(spark):
    """clean_text contract on crafted inputs: NFC composition (e +
    combining acute -> é), NFKC compatibility folding (the ﬁ ligature
    — NFKC path is pytest-only, DuckDB has no nfkc), control-char
    strip keeping tab/newline, CRLF -> LF, horizontal-run collapse,
    newline-hugging spaces dropped, NULL passthrough."""
    rows = [
        (1, "café time"),                # combining acute
        (2, "a\x00b\x07c\x7fd"),               # C0 controls + DEL
        (3, "one  \t two\r\nthree  \n  four"),
        (4, None),
        (5, "  edge  "),
        (6, "ﬁne text"),             # ﬁ ligature + NBSP
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    got = {
        r.id: r.c
        for r in df.select("id", X.clean_text(F.col("t")).alias("c")).collect()
    }
    assert got[1] == "café time" and len(got[1]) == 9  # composed
    assert got[2] == "abcd"
    assert got[3] == "one two\nthree\nfour"
    assert got[4] is None
    assert got[5] == "edge"
    assert got[6] == "ﬁne text"  # NFC leaves compat chars alone
    nfkc = {
        r.id: r.c
        for r in df.select(
            "id", X.clean_text(F.col("t"), form="NFKC").alias("c")
        ).collect()
    }
    assert nfkc[6] == "fine text"  # ligature expanded
    # form=None keeps the whole transform JVM-side (no UDF in the plan)
    plan = (
        df.select(X.clean_text(F.col("t"), form=None).alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
