"""Text-analysis expressions for large-scale training-data pipelines:
tokenization, quality scoring, language-ID heuristics, fingerprints.

All built from JVM-side column expressions (regexp/split/higher-order
array functions) so they run inside whole-stage codegen — no Python in
the hot path. Every formula is mirrored 1:1 in the DuckDB oracles of
__spark_entry__.py, so parity pins the exact semantics.

The hash primitive is md5-based (first 15 hex chars → 60-bit int) —
chosen over xxhash64 because it is bit-identical across Spark, DuckDB
and Python, making every downstream fingerprint/minhash/simhash
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small cross-language stopword/marker sets (public common-word lists)
STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not have has had but they you we he she i"
).split()

LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is that it for with as was on are this".split(),
    "de": "der die das und ist nicht ich ein zu mit den von sich des".split(),
    "fr": "le la les et de des un une est dans que pour sur avec".split(),
    "es": "el la los las y de que en un una es por con para del".split(),
    # markers must survive norm_text (ASCII [a-z0-9] only): accented
    # function words (för, się, için, și...) are stripped by the
    # normalizer and can never match
    "it": "il lo gli di che non per una sono della nel alla".split(),
    "pt": "o os do da dos das um uma para com mais ser foi".split(),
    "nl": "de het een van ik niet dat zijn maar ze er ook".split(),
    "sv": "och att det som jag inte du av har till vi om".split(),
    "pl": "nie na jest to czy tak jak ale bardzo jego przez co".split(),
    "tr": "bir bu ve gibi daha ama ne kadar olarak sonra kendi".split(),
    "id": "yang dan di ini itu dengan untuk tidak dari akan".split(),
    "ro": "de la cu este un o care pentru mai din nu sa".split(),
    # round-3 breadth: only unaccented function words (accented forms
    # are stripped by norm_text) and nothing colliding with common
    # English tokens ('a', 'to', 'the', 'it' are never markers here)
    "da": "og det er jeg ikke at der til af hvad hun den".split(),
    "no": "og det er jeg ikke en til av de han meg noe".split(),
    "fi": "ja on ei se oli mutta kun niin kuin jos hyvin".split(),
    "hu": "az nem hogy van egy ha mint csak volt lesz ki".split(),
    "cs": "je se na ale jako pro od ani nebo kdy tak".split(),
    "sw": "na ya wa kwa ni za katika kama hii pia sana".split(),
    "tl": "ang ng mga sa ay ito para hindi ako siya".split(),
    # round-4 breadth (same rules: unaccented ASCII function words only;
    # shared tokens across related languages are fine — argmax decides,
    # and each set keeps enough distinctive members to win on its own
    # text: sk 'som/aj/bol' vs cs, lv 'vai/tas' vs lt 'yra/kad',
    # af 'nie/vir/hulle' vs nl/de)
    "af": "die nie vir hulle baie iets haar wees".split(),
    "ca": "els amb aquest aquesta mes dels seva fins".split(),
    "cy": "yn wedi bod gan fel ond hefyd mae".split(),
    "et": "see kui mis oma siis ka veel veidi".split(),
    "eu": "eta da ez du bat hau dela baina izan".split(),
    "ga": "agus ar go na le ach bhfuil nach".split(),
    "hr": "su ali kao nije ili sto ovo bio".split(),
    "lt": "ir yra kad bet kaip jis buvo tik".split(),
    "lv": "un ir tas par vai no savu kas".split(),
    "sk": "som ako ale aj za bol tento ktore".split(),
    "sl": "so pa tudi kot lahko bilo nekaj tega".split(),
    # round-5 breadth (same rules as above: unaccented ASCII function
    # words only; overlaps across related languages are fine — argmax
    # decides, each set keeps enough distinctive members to win on its
    # own text: ms 'boleh/kerana/ialah' vs id, ceb 'og/kini/gyud' vs
    # tl, gl 'unha/polo/coa' vs pt/es, is 'ekki/hefur/mjog' vs no/da,
    # fy 'foar/wurde/hawwe' vs nl, gd 'ann/gun/airson' vs ga,
    # uz 'bilan/uchun' vs tr 'ile/icin'-less set, tk 'bilen/ucin')
    "ms": "dalam boleh kerana ialah anda telah bagi mereka".split(),
    "sq": "dhe te nje eshte por nuk jane shume".split(),
    "gl": "unha polo coa nunha dunha ata moi ademais".split(),
    "lb": "an net mat fir dat ass och ze vun".split(),
    "mt": "li ta ma hija dan kif ukoll jew".split(),
    "la": "et in est non cum sed ad quod atque".split(),
    "eo": "estas kaj al ne por kun mi tre ankau".split(),
    "so": "iyo oo waxaa waa uu aan aad mid".split(),
    "ha": "da ya na ta cikin wannan suka yake amma".split(),
    "yo": "ati awon naa si fun won nigba ni".split(),
    "ig": "na nke ya bu ihe ndi maka otu".split(),
    "zu": "ukuthi futhi ngoba kodwa lokhu kanye".split(),
    "xh": "ukuba kwaye oku ngoku kuba yaye".split(),
    "rw": "kandi ariko cyane ubwo uko ndetse".split(),
    "mg": "ny sy dia amin izany tamin ho ary".split(),
    "ceb": "og nga kini usa gyud dili kay adunay".split(),
    "jv": "lan ing kang iku saka kanthi ora wis".split(),
    "su": "jeung dina anu teu ieu tina henteu oge".split(),
    "uz": "va bilan uchun ham emas lekin edi davlat".split(),
    "tk": "we bilen ucin hem dal bolan yaly diyip".split(),
    "fy": "it dat net mar ek foar wurde hawwe".split(),
    "is": "og ekki sem hann hefur mjog var enn".split(),
    "ht": "nan yo ak pou li te sa ki yon nou".split(),
    "gd": "ann gun airson chan anns bha aig tha".split(),
    "br": "hag eo ar en ur gant evit ket bet".split(),
    "sn": "uye zvakare asi iyi kana uku vanhu".split(),
    "ny": "ndi komanso ngati chifukwa kwambiri zimene".split(),
    # round-6 breadth toward lid.176 (same rules: unaccented ASCII
    # function words only — norm_text strips everything else; overlaps
    # across close relatives are fine, argmax decides, each set keeps
    # enough distinctive members to win on its own text: nn 'ikkje/
    # noko' vs no/da, sco 'didna/frae' vs en, nds/bar/als/pfl each by
    # their own particles vs de, the Romance micro-languages by their
    # negators/demonstratives — minga/micca/nun/betg/mach — vs it/es)
    "nn": "ikkje eit kva noko vere fleire mellom korleis".split(),
    "oc": "tanben aquela atal dins lor segon".split(),
    "ast": "ye nun tamien esti nesti yera cola".split(),
    "an": "ta istos muitas chen bi adintro".split(),
    "co": "micca ancu quessa induve issu stu".split(),
    "sc": "sos sas custu meda unu accanta".split(),
    "scn": "nun chiu comu idda nenti lu".split(),
    "nap": "pecche cchiu cumme chillo nuje aggio".split(),
    "vec": "xe anca dela schei cussi sta".split(),
    "pms": "mach nen dco sossi chiel andoa".split(),
    "lmo": "minga insci quel vun semper chi".split(),
    "rm": "quai betg ina ins era tgi".split(),
    "wa": "dji avou nosse foirt todi ki".split(),
    "ia": "iste anque esser illo alicun ipse".split(),
    "ie": "ti esset vell anc quel quo".split(),
    "io": "esas anke kande irga ulu omna".split(),
    "vo": "binos obs ko ed jival labob".split(),
    "jbo": "coi tavla klama zarci kei cusku".split(),
    "kw": "yma gans dhe ny yw hwi".split(),
    "gv": "ayns myr agh shoh va cha".split(),
    "sco": "didna frae wis aboot tae gey".split(),
    "nds": "nich mol wat dor sik hett".split(),
    "bar": "ned aa vui hod wos obba".split(),
    "als": "isch au nit dr scho wia".split(),
    "frr": "det foon ham uk deet leet".split(),
    "vls": "da nie ip oltied geweune ol".split(),
    "li": "neet ouch waat veur mich zoeget".split(),
    "hsb": "njeje potom hdy sym wot zo".split(),
    "dsb": "njejo ako togo ga won pon".split(),
    "gn": "umi avei upe ndaje ko ha".split(),
    "qu": "chaymanta paykuna kunan manam kay runa".split(),
    "nah": "huan tlen ipan amo inin nican".split(),
    "ilo": "dagiti kadagiti ngem saan idiay kadagitoy".split(),
    "war": "waray ngan hin ini han nga".split(),
    "pam": "deng ning keng ati metung karing".split(),
    "min": "indak dek iko bana sadonyo awak".split(),
    "cbk": "maga kita ansina kame endenantes".split(),
    "hif": "logan rahaa uske karta bhi".split(),
    "mwl": "cumo anton ye nun dua lhengua".split(),
    "vep": "nece om ka kut ani sines".split(),
    "pfl": "awwer unn gewwe halt devun".split(),
    "diq": "zaf esto yeno wina qande".split(),
    "bcl": "kan sinda nin kaya arog dakul".split(),
    # round-7: the last lid.176 Latin-script labels. Kurmanji (ku) is
    # the LATIN Kurdish — the Arabic-letter rule that used to carry the
    # 'ku' label is Sorani and now correctly labels 'ckb' (fasttext
    # distinguishes the two). Kurmanji markers are the ASCII function
    # words that survive norm_text (î/ê/û diacritics are stripped to
    # spaces, so only diacritic-free forms qualify). bs/sh vs hr is the
    # hardest split in lid.176 (fasttext itself confuses them); each
    # set holds forms the SIBLING sets exclude (bs 'nakon/bez/svoje',
    # sh the ekavian 'posle' + clitic clusters, hr keeps
    # 'su/ali/kao/nije') — argmax decides, documented approximation.
    "ku": "ku ji bi li gelek heye dike wan dibe hem".split(),
    "bs": "da je se kako nakon bez svoje njih".split(),
    "sh": "oni ih im uz kod posle".split(),
}

# Script-detection rules, FIRST MATCH WINS (normalization strips these
# codepoints, so marker voting can't see them). Kana before Han: real
# Japanese text mixes kana with kanji; pure-Han text is Chinese.
# Each entry: (language code, character-class regex fragment).
SCRIPT_RULES: list[tuple[str, str]] = [
    ("ja", "[ぁ-ゟ゠-ヿ]"),      # hiragana + katakana
    ("ko", "[가-힣]"),           # hangul syllables
    ("yue", "[嘅喺哋咗嚟]"),      # written-Cantonese particles, BEFORE
                                 # the generic Han block. Only the
                                 # strongly Cantonese-specific ones:
                                 # 唔/咁/嗰 are deliberately excluded —
                                 # Mandarin prose uses 唔 as an
                                 # interjection and 咁 in dialect
                                 # quoting, and one hit anywhere flips
                                 # the whole document (documented
                                 # approximation, single-char rule)
    # Wu Chinese by its own pronouns (侬 "you", 阿拉 "we") BEFORE the
    # generic Han block. 侬 appears in classical Mandarin poetry and
    # 阿拉 transliterates "Allah" — one hit flips the document, same
    # documented single-sequence approximation as yue above.
    ("wuu", "侬|阿拉"),
    ("zh", "[一-鿿]"),           # CJK unified ideographs
    # Arabic-script family: most-specific letters first. Urdu's retro-
    # flex/heh-goal/bari-ye letters are Urdu-only; Persian's pe/che/
    # zhe/gaf are shared WITH Urdu, so ur must precede fa, and both
    # precede the generic Arabic block.
    # round-5: Pashto's retroflexes (ټ U+067C, ډ U+0689, ړ U+0693...)
    # and Sindhi's implosives are DIFFERENT codepoints from Urdu's
    # (ٹ U+0679, ڈ U+0688, ڑ U+0691) — no overlap, order vs ur free
    ("ps", "[ټځڅډړږښ]"),         # pashto-specific, BEFORE ar
    ("sd", "[ڄڃڳڻ]"),            # sindhi-specific, BEFORE ar
    # Western Punjabi (Shahmukhi) shares Urdu's letter set, so it is
    # split by function words Urdu never uses (وچ "in", نوں dative)
    # BEFORE the ur letter class claims the text. Space-delimited on
    # BOTH sides: bare "وچ "/"نوں " are suffixes of the common Urdu
    # words سوچ "thought" and جنوں "madness"
    ("pnb", " وچ | نوں |پنجابی"),
    ("ur", "[ٹڈڑںےہ]"),          # urdu-specific, BEFORE fa and ar
    ("ug", "[ۇۈ]"),              # uyghur-specific vowels, BEFORE fa/ar
    ("ckb", "[ڕڵێ]"),            # sorani kurdish-specific, BEFORE fa/ar
                                 # (the LATIN Kurdish 'ku' lives in
                                 # LANG_MARKERS; fasttext splits them)
    ("lrc", "[ۉ]"),              # northern luri waw-with-inverted-v,
                                 # BEFORE fa/ar
    # South Azerbaijani / Mazanderani write Turkic/Caspian words in
    # Perso-Arabic script — no letters of their own, so word-sequence
    # rules BEFORE fa (اولان/ایله/اولوب and اینتا/وونه are not Persian
    # forms; NOT Mazanderani هسته "is" — that spelling is the common
    # Persian noun "kernel", e.g. هسته‌ای "nuclear")
    ("azb", "اولان|ایله|اولوب"),
    ("mzn", "اینتا|وونه|مازرونی"),
    ("fa", "[پچژگ]"),            # persian-specific, BEFORE ar
    # Egyptian Arabic by its own function words (مش/عشان/دلوقتي/ازاي
    # — standard Arabic never uses these), word-sequence rule BEFORE
    # the generic block; placed after the letter-class rules above
    # (Pashto/Sindhi/Urdu/Uyghur/Kurdish/Persian letters win first)
    ("arz", "مش |عشان|دلوقتي|ازاي"),
    # Cyrillic family: Kazakh's straight-stroke vowels/consonants are
    # Kazakh-only (and Kazakh text also uses і, which Ukrainian's rule
    # would claim — so kk first); Mongolian's ө/ү are shared with
    # Kazakh but kk has already matched by here.
    # round-5 Cyrillic family, each with letters no OTHER rule claims.
    # tg/tt/ba/cv must precede kk: ә/ғ/қ are shared Kipchak/Tajik
    # letters kk's class claims, while ҷ/ӣ/ӯ (Tajik), җ (Tatar — vs
    # Kazakh ж), ҙ (Bashkir), ӑ/ӗ/ӳ (Chuvash; ҫ is shared ba/cv so NOT
    # used) appear in no Kazakh text. Kazakh keeps ұ as its own.
    ("tg", "[ҷӣӯҶӢӮ]"),          # tajik-specific, BEFORE kk/ru
    # Kalmyk's extra-letter set (ә һ җ ң ө ү) is IDENTICAL to Tatar's
    # — ordinary Tatar text carries both һ (һәм "and") and җ, so no
    # letter rule can split them. Word-sequence rule instead (болн
    # "and", келн "language", the self-name), BEFORE tt
    ("xal", "болн |келн|хальмг"),
    ("tt", "[җҖ]"),              # tatar-specific, BEFORE kk/ru
    ("ba", "[ҙҘ]"),              # bashkir-specific, BEFORE kk/ru
    ("cv", "[ӑӗӳӐӖӲ]"),          # chuvash-specific, BEFORE kk/ru
    # round-6 Cyrillic additions. All patterns stay RE2-compatible
    # (mirrored into DuckDB regexp_matches): no lookaround anywhere —
    # the two "combo" rules below use anchored negated-class full
    # matches instead.
    ("sah", "[ҕҔ]"),             # yakut-specific, BEFORE kk/ru
    ("mrj", "[ӓӹӒӸ]"),           # hill mari ä/ï̈, BEFORE mhr — Hill
                                 # Mari also writes ҥ, which mhr's
                                 # class would otherwise claim
    ("mhr", "[ҥҤ]"),             # meadow mari-specific (yakut ҥ texts
                                 # carry ҕ and matched above), BEFORE kk
    # Tuvan's letter signature (Russian + ң ө ү) is identical to
    # Kyrgyz's, so it is split by word sequences Kyrgyz never uses
    # (болгаш "and", чүве "thing") BEFORE the ky combo rule
    ("tyv", "болгаш|чүве|тыва "),
    # Kyrgyz = Russian alphabet + ң ө ү and NOTHING else, so the rule
    # is "ң AND ө/ү present, zero Kazakh-only letters anywhere" —
    # placed BEFORE kk (kk's class claims ң) and BEFORE mn (which
    # claims ө/ү). Kazakh text keeps қ/ғ/ә/ұ and falls through to kk;
    # Mongolian has no ң and falls through to mn.
    (
        "ky",
        "^[^әғқұӘҒҚҰ]*(?:[ңҢ][^әғқұӘҒҚҰ]*[өүӨҮ]"
        "|[өүӨҮ][^әғқұӘҒҚҰ]*[ңҢ])[^әғқұӘҒҚҰ]*$",
    ),
    ("kk", "[әғқңұӘҒҚҢҰ]"),      # kazakh-specific, BEFORE uk/mn/ru
    # Buryat = Russian + ө ү һ. Yakut һ-texts matched above via ҕ,
    # Kalmyk via һ+җ, and Kazakh (which also lists һ for loanwords)
    # via its own letters — so AFTER kk, a bare һ means Buryat.
    # A Kazakh text whose only non-Russian letter is һ would misfire;
    # real Kazakh text always carries ә/ғ/қ/ң/ұ (documented)
    ("bxr", "[һҺ]"),
    ("be", "[ўЎ]"),              # belarusian-specific, BEFORE ru
    ("sr", "[ђћЂЋ]"),            # serbian cyrillic-specific, BEFORE ru
    ("mk", "[ѓќѕЃЌЅ]"),          # macedonian-specific, BEFORE ru
    ("kv", "[ӧӦ]"),              # komi ӧ, BEFORE uk — komi orthography
                                 # also uses і, which uk's class would
                                 # claim (uk has no ӧ, so no reverse
                                 # misfire); mari ҥ-texts matched
                                 # above; udmurt shares ӧ — documented
                                 # approximation
    # Rusyn is the only East-Slavic orthography using BOTH ы (which
    # Ukrainian dropped) and і (which Russian dropped) — their
    # co-occurrence, BEFORE uk. Pre-1918 Russian and mixed ru/uk
    # quotations misfire — documented approximation
    ("rue", "[ыЫ][\\s\\S]*[іІ]|[іІ][\\s\\S]*[ыЫ]"),
    ("uk", "[єїіґЄЇІҐ]"),        # ukrainian-specific cyrillic, BEFORE ru
    ("mn", "[өүӨҮ]"),            # mongolian cyrillic, BEFORE ru
    # Avar and Lezgian share the palochka with Chechen, so they are
    # split by their own function words (буго/гьаб "is/this", гзаф/
    # авай "many/having") BEFORE the ce class; palochka text matching
    # neither set still falls to ce — documented approximation
    ("av", "буго|гьаб |рагӏи"),
    ("lez", "гзаф|авай|жезва"),
    ("ce", "[ӏӀ]"),              # chechen (palochka; shared by other
                                 # Caucasian languages — documented
                                 # approximation to the most common)
    ("os", "[ӕӔ]"),              # ossetian-specific, BEFORE ru
    # Karachay-Balkar and Erzya write with the bare Russian alphabet —
    # word-sequence rules. krc MUST precede bg: its гъ/къ digraphs put
    # multiple ъ in nearly every sentence, which bg's doubled-jer rule
    # would otherwise claim
    ("krc", "болгъан|бла |эмда"),
    ("myv", "эрзянь|улить|истямо"),
    # Bulgarian shares its alphabet with Russian minus ы/э/ё; the only
    # positive signal is heavy use of ъ as a vowel. Rule: two ъ
    # anywhere and zero Russian-only letters in the whole text (an
    # anchored negated-class full match — RE2 has no negative
    # lookahead). Runs AFTER every specific Cyrillic rule, just
    # BEFORE ru.
    ("bg", "^[^ыэёЫЭЁ]*[ъЪ][^ыэёЫЭЁ]*[ъЪ][^ыэёЫЭЁ]*$"),
    ("ru", "[А-яЁё]"),           # cyrillic
    ("ar", "[؀-ۿ]"),             # arabic
    ("el", "[Ͱ-Ͽ]"),             # greek
    ("yi", "[װױײ]"),             # yiddish double-vav/vav-yud/double-yud
                                 # ligatures (U+05F0-05F2, outside the
                                 # א-ת block), BEFORE he
    ("he", "[א-ת]"),             # hebrew
    ("th", "[ก-๛]"),             # thai
    # Devanagari family: the block is shared by hi/mr/ne/sa, so the
    # siblings are split by WORD-sequence rules (plain alternations —
    # still RE2-safe) on forms Hindi never uses, before the block
    # fallback: Marathi's copula आहे (Hindi: है), Nepali's verb
    # endings छन्/भएको/गर्दछ, Sanskrit's अस्ति/भवति. A Hindi text
    # quoting such a form misfires — documented approximation, same
    # first-match contract as every family rule here.
    ("mr", "आहे|आणि|म्हणून|केले"),   # marathi, BEFORE hi
    # Doteli is Nepali's closest sibling and may carry Nepali verb
    # forms, so its own forms (हुन्या, थिया vs Nepali थियो/थिए) run
    # BEFORE ne; the rest of the Devanagari word rules are mutually
    # disjoint forms Hindi never uses: Maithili's अछि/छथि copulas,
    # Bhojpuri's बाटे/हमनी/भईल, Newar's खः/थ्व, Konkani's आनी/म्हूण
    # (vs Marathi आणि/म्हणून — different strings)
    ("dty", "डोटेली|हुन्या|थिया "),
    ("ne", "छन्|भएको|गर्दछ|हुन्छ"),  # nepali, BEFORE hi
    ("sa", "अस्ति|भवति|तस्य|इति च"),  # sanskrit, BEFORE hi
    ("mai", "अछि|छथि|सेहो"),
    ("bh", "बाटे|हमनी|भईल"),
    ("new", "खः|थ्व |जुया"),
    ("gom", "आनी|म्हूण|आसा "),
    ("hi", "[ऀ-ॿ]"),            # devanagari
    # Bishnupriya Manipuri writes Bengali script — split by its own
    # demonstratives (এহান "this", হানর genitive) BEFORE as/bn
    ("bpy", "এহান|হানর|মারি "),
    ("as", "[ৰৱ]"),              # assamese ra/wa, BEFORE the bengali block
    ("bn", "[ঀ-৿]"),            # bengali
    ("ta", "[஀-௿]"),            # tamil
    ("te", "[ఀ-౿]"),            # telugu
    ("kn", "[ಀ-೿]"),            # kannada
    ("ml", "[ഀ-ൿ]"),            # malayalam
    ("gu", "[઀-૿]"),            # gujarati
    ("pa", "[਀-੿]"),            # gurmukhi (punjabi)
    ("or", "[଀-୿]"),            # odia
    ("si", "[඀-෿]"),            # sinhala
    ("xmf", "[ჸ]"),              # mingrelian glottal-stop letter,
                                 # BEFORE the georgian block
    ("ka", "[Ⴀ-ჿ]"),             # georgian
    ("hy", "[԰-֏]"),             # armenian
    ("my", "[က-႟]"),             # myanmar
    ("km", "[ក-៿]"),             # khmer
    ("lo", "[ກ-ໟ]"),             # lao
    ("am", "[ሀ-፿]"),             # ethiopic (amharic)
    ("bo", "[ༀ-࿿]"),             # tibetan
    # round-5: unique blocks / unique Latin letters (rules run on RAW
    # text, so Latin-script diacritics normalization would strip are
    # usable). Vietnamese: ơ/ư + the Latin Extended Additional range
    # U+1EA0-U+1EF9 (Vietnamese tone forms) — đ excluded, it is also
    # Croatian/Serbian Latin. Azerbaijani: Latin schwa ə U+0259
    # (distinct codepoint from Cyrillic ә).
    ("vi", "[ơưƠƯẠ-ỹ]"),         # vietnamese
    ("az", "[əƏ]"),              # azerbaijani latin
    ("dv", "[ހ-ޱ]"),             # thaana (divehi)
    ("chr", "[Ꭰ-Ᏽ]"),            # cherokee
    ("iu", "[ᐁ-ᙿ]"),             # canadian aboriginal syllabics (inuktitut)
]


def norm_text(c: Column) -> Column:
    """Lowercase, collapse every non-alphanumeric run to one space, trim.
    (Parity contract: duckdb `trim(regexp_replace(lower(x),'[^a-z0-9]+',' ','g'))`.)"""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text (empty text → empty array)."""
    n = norm_text(c)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token estimate: words + digit runs + punctuation
    marks each count; long words count ceil(len/6) pieces (a public
    rule-of-thumb approximation of BPE token rates)."""
    t = tokens(c)
    word_pieces = F.aggregate(
        t,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.ceil(F.length(w) / 6.0).cast("bigint"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (word_pieces + F.coalesce(punct, F.lit(0))).cast("bigint")


def stopword_ratio(c: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    t = tokens(c)
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(c: Column) -> Column:
    """Share of characters that are neither alphanumeric nor whitespace."""
    non_punct = F.regexp_replace(c, r"[^a-zA-Z0-9\s]", "")
    return F.when(
        F.length(c) > 0, (F.length(c) - F.length(non_punct)) / F.length(c)
    ).otherwise(F.lit(0.0))


def mean_word_length(c: Column) -> Column:
    t = tokens(c)
    total = F.aggregate(t, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def quality_score(c: Column) -> Column:
    """Deterministic 0-1 document quality composite (length band,
    stopword presence, punctuation sanity, word-length sanity) — the
    heuristic-filter family used by public web-scale corpus pipelines
    (C4/Gopher-style rules)."""
    tc = token_count(c).cast("double")
    len_ok = F.when((tc >= 10) & (tc <= 5000), 1.0).otherwise(
        F.when(tc > 0, 0.5).otherwise(0.0)
    )
    sw = stopword_ratio(c)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), 1.0).otherwise(0.5)
    pr = punct_ratio(c)
    punct_ok = F.when(pr <= 0.2, 1.0).otherwise(F.when(pr <= 0.4, 0.5).otherwise(0.0))
    mwl = mean_word_length(c)
    mwl_ok = F.when((mwl >= 2.5) & (mwl <= 10), 1.0).otherwise(0.5)
    return F.round(0.4 * len_ok + 0.3 * sw_ok + 0.2 * punct_ok + 0.1 * mwl_ok, 4)


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-word hit counts per language (n-gram-free heuristic
    language ID; fasttext replaces this in prod via mapInPandas)."""
    t = tokens(c)

    def _hits(markers: list[str]):
        arr = F.array(*[F.lit(w) for w in markers])
        # NB: the lambda must take exactly one arg — a second arg would
        # be bound as the element index by Spark's HOF converter
        return F.size(F.filter(t, lambda x: F.array_contains(arr, x)))

    return {lang: _hits(m) for lang, m in LANG_MARKERS.items()}


def lang_predict(c: Column) -> Column:
    """Language ID: script detection first, in SCRIPT_RULES order
    (normalization strips non-latin codepoints, so marker voting can't
    see them), then argmax over marker-word hits with deterministic
    tie-break by language code order; nothing matched → 'und'.
    A production swap-in (fasttext lid.176) plugs into the SAME
    distinct→mapInPandas path — operators.text_ml.lang_id_distinct."""
    scores = lang_scores(c)
    langs = sorted(scores)
    # argmax via array_max over (score, -rank, lang) structs: every
    # score expression appears exactly ONCE. (A nested when-chain would
    # embed each score at every comparison level — expression-tree and
    # codegen size grow quadratically-to-exponentially with languages;
    # measured 150x slower at 12 languages.) Struct ordering compares
    # fields left-to-right, so ties on score resolve to the smallest
    # rank = first language in sorted order.
    best = F.array_max(
        F.array(*[
            F.struct(
                scores[lang].alias("s"),
                F.lit(-i).alias("nr"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(langs)
        ])
    )
    out = F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
    for lang, pattern in reversed(SCRIPT_RULES):
        out = F.when(c.rlike(pattern), F.lit(lang)).otherwise(out)
    return out


def lang_top_k(c: Column, k: int = 5) -> Column:
    """Top-k languages WITH confidence — array<struct<lang, conf>>,
    conf in percent rounded to 2, mirroring the reference's
    `detect_language_with_confidence` output shape (Profiler.py:232-259:
    fasttext probabilities * 100). Same decision order as lang_predict:
    a script-rule match short-circuits to [(lang, 100.0)]; otherwise the
    marker argmax generalizes to the top-k positive scores with
    conf = 100 * score / total_hits (a normalized-margin proxy for the
    model's calibrated probability — the label ordering is identical to
    lang_predict's by construction); no hits at all → [('und', 0.0)].

    WHAT THE PERCENTAGE MEANS (calibration contract, for report
    consumers): conf is the language's SHARE OF MARKER-WORD HITS in
    the text, not a model probability. It diverges from fasttext-style
    calibrated probabilities in four characterized ways (each pinned
    by tests/test_text.py::test_lang_confidence_calibration_contract):

    1. Mixed-language text splits conf proportionally to each
       language's marker-hit counts — a half-English/half-French doc
       reports ~both near 50, where a whole-document classifier
       concentrates mass on one label; on genuinely mixed text the
       top-1 RANKING can differ from fasttext's when one language's
       function words are individually more frequent.
    2. No length calibration: a 3-word text with one marker hit gets
       conf 100.0, the same as a 10k-word monolingual doc — fasttext's
       probability would reflect the thin evidence.
    3. Script-rule matches short-circuit to exactly [(lang, 100.0)],
       never a distribution over related same-script languages (ru vs
       uk vs bg all read as the script rule's label at 100).
    4. Only marker-bearing languages can score; labels in the pinned
       lid.176-superset surface without marker lists never appear in
       the top-k (they are reachable via the fasttext seam only).

    Use conf to rank and to gauge MIXTURE (shares sum to 100 across
    all scored languages), not as P(lang | text). Swapping in real
    lid.176 via lang_id_distinct's predict_fn seam restores calibrated
    probabilities with the same output shape.

    The sorted struct array is referenced twice (slice + total); both
    references are deterministic and identical, so whole-stage codegen's
    subexpression elimination evaluates the 100+-struct build once — and
    nothing marker-derived is captured inside a per-element lambda (the
    HOF lambda-capture trap: a captured outer expression re-evaluates
    per element)."""
    scores = lang_scores(c)
    langs = sorted(scores)
    ranked = F.reverse(
        F.array_sort(
            F.array(*[
                F.struct(
                    scores[lang].alias("s"),
                    F.lit(-i).alias("nr"),
                    F.lit(lang).alias("l"),
                )
                for i, lang in enumerate(langs)
            ])
        )
    )
    total = F.aggregate(
        ranked, F.lit(0).cast("bigint"), lambda a, x: a + x["s"].cast("bigint")
    )
    top = F.filter(F.slice(ranked, 1, k), lambda x: x["s"] > 0)
    # division via zip_with against a repeated-total array: capturing
    # `total` inside a transform() lambda would re-evaluate the whole
    # marker-score build per element (the HOF capture trap again) —
    # zip_with's inputs are each evaluated ONCE, outside the lambda
    scored = F.zip_with(
        top,
        F.array_repeat(total, F.size(top)),
        lambda x, t: F.struct(
            x["l"].alias("lang"),
            F.round(100.0 * x["s"] / t, 2).alias("conf"),
        ),
    )
    out = F.when(F.size(top) > 0, scored).otherwise(
        F.array(F.struct(F.lit("und").alias("lang"), F.lit(0.0).alias("conf")))
    )
    for lang, pattern in reversed(SCRIPT_RULES):
        out = F.when(
            c.rlike(pattern),
            F.array(
                F.struct(F.lit(lang).alias("lang"), F.lit(100.0).alias("conf"))
            ),
        ).otherwise(out)
    return out


# PII scrub patterns — ASCII-only constructions chosen so Java regex
# (Spark) and RE2 (DuckDB) match IDENTICAL spans: no alternations whose
# leftmost-first (Java) vs leftmost-longest (RE2) semantics could
# diverge, no backreferences, no lookaround (RE2 has none). Order
# matters: URLs first (emails/IPs can appear inside them), then email,
# IP, then long digit runs (card/account-like).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ \t\r\n]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("longnum", r"\b[0-9]{13,19}\b", "<NUM>"),
]


def redact_pii(c: Column) -> Column:
    """Scrub emails / URLs / IPv4s / long digit runs to typed
    placeholder tokens — the standard pre-training privacy pass.
    Patterns applied in PII_PATTERNS order; byte-identical in the DuckDB
    oracle (same regexes, same order)."""
    out = c
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(c: Column) -> dict[str, Column]:
    """Match counts per PII class (counted on the PRE-redaction text;
    earlier-class replacements can consume later-class matches during
    redaction — e.g. an email inside a URL — so counts here are
    per-class independent)."""
    # idx=0 (whole match) must be explicit: Spark's regexp_extract_all
    # defaults to group 1 and raises at runtime on group-free patterns
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))
        for name, pattern, _ in PII_PATTERNS
    }


def md5_int60(c: Column) -> Column:
    """First 15 hex chars of md5 as a 60-bit non-negative int64 —
    bit-identical in DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def fingerprint(c: Column) -> Column:
    """Content fingerprint of the normalized text (near-dup at the
    exact-after-normalization tier)."""
    return md5_int60(norm_text(c))


def char_ngrams(c: Column, n: int = 3) -> Column:
    """Character n-gram shingles of the normalized text, as an array.
    Pure JVM array ops, no UDF.

    Built as an elementwise concat FOLD over n shifted copies of the
    char array — NOT `transform(sequence(...), i -> substr(s, i, n))`:
    an interpreted HOF lambda re-evaluates the captured `s` (the whole
    lower+regexp normalization chain) once per ELEMENT, i.e. O(len²)
    work per document (same trap as winnow_fingerprints' old window
    min, measured ~100x). zip_with pads the shorter side with null and
    concat(null) nulls out, but those tail elements fall outside the
    final slice. Also fixes the short-string edge: sequence(1, 0)
    counts DOWN [1, 0], so strings shorter than n used to yield
    phantom duplicate grams; now they yield []."""
    s = norm_text(c)
    count = F.greatest(F.length(s) - (n - 1), F.lit(0))
    grams = F.split(s, "")
    for j in range(1, n):
        shifted = F.slice(
            F.split(s, ""), j + 1, F.greatest(F.length(s) - j, F.lit(1))
        )
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, b))
    return F.when(count >= 1, F.slice(grams, 1, count)).otherwise(
        F.array().cast("array<string>")
    )


def winnow_fingerprints(c: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (the MOSS local-fingerprint
    construction, Schleimer/Wilkerson/Aiken 2003): hash every k-gram
    (rolling window of the normalized text), slide a window of w
    consecutive hashes, keep the minimum of each window, dedupe, sort.
    Guarantees any shared substring of length >= k + w - 1 between two
    documents yields at least one shared fingerprint — the substring-
    overlap dedup tier between whole-doc fingerprints and MinHash.

    All JVM-side higher-order array ops (transform/slice/zip_with) —
    no UDF; mirrored 1:1 in oracle_fragments.sql_winnow.

    Construction note: the window minima are built as an elementwise
    least() FOLD over w-1 SHIFTED copies of the hash array (zip_with
    pads the shorter side with null; least skips nulls), NOT as
    per-window `array_min(slice(hashes, i, w))` inside a transform
    lambda. Interpreted HOF lambdas re-evaluate captured outer
    expressions per ELEMENT, so the lambda form recomputes the entire
    md5 k-gram chain once per window — O(n²) md5s per document
    (measured 117s for 100 ~300-char docs; the fold form is ~1s). All
    references here are row-scope: the chain evaluates O(w) times per
    row."""
    hashes = F.transform(char_ngrams(c, k), md5_int60)
    n_win = F.greatest(F.size(hashes) - (w - 1), F.lit(0))
    windowed = hashes
    for j in range(1, w):
        shifted = F.slice(
            hashes, j + 1, F.greatest(F.size(hashes) - j, F.lit(1))
        )
        windowed = F.zip_with(windowed, shifted, lambda a, b: F.least(a, b))
    # documents shorter than k+w-1 chars have no windows and an empty
    # fingerprint set (oracle parity: DuckDB's end-exclusive range()
    # yields [] for the same inputs)
    wins = F.when(n_win >= 1, F.slice(windowed, 1, n_win)).otherwise(
        F.array().cast("array<bigint>")
    )
    return F.array_sort(F.array_distinct(wins))


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a MATERIALIZED token-array column
    (array<string>), as an array — empty when the document has fewer
    than n tokens. The single shared window construction behind
    operators/dedup.word_ngram_hashes and operators/quality.
    ngram_repetition, so both provably see identical grams.

    `toks` must be a plain (already-projected) column reference, never
    the tokenization expression itself: HOF lambdas re-evaluate
    captured outer EXPRESSIONS once per element (see the capture-trap
    notes on char_ngrams)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def unicode_normalize(c: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC/NFKC/NFD/NFKD) via an
    Arrow-batched pandas UDF — the one text primitive Spark's builtin
    expressions genuinely cannot express (no JVM-side normalizer is
    exposed through pyspark.sql.functions). pandas Series.str.normalize
    is a vectorized wrapper over unicodedata; NULLs pass through.
    Cross-engine contract: NFC matches DuckDB's nfc_normalize exactly
    (both defer to the Unicode tables) — the clean_text_documents
    oracle replays it; NFKC/NFD/NFKD have no DuckDB twin and are
    pytest-verified."""
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s):
        return s.str.normalize(form)

    return _norm(c)


def clean_text(
    c: Column,
    form: str | None = "NFC",
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """Corpus text-cleaning TRANSFORM (the Dolma/CCNet-style pre-pass
    that runs before every filter/dedup tier):

    1. `form`: Unicode normalization (default NFC — canonical
       composition so byte-level dedup/fingerprints see one encoding
       of each grapheme); None skips the (UDF) step entirely and the
       whole transform stays JVM-side.
    2. `strip_control`: remove C0 control characters and DEL except
       tab/newline/CR ([\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]) —
       PDF/OCR artifacts that break tokenizers.
    3. `collapse_whitespace`: CRLF/CR -> LF, horizontal-whitespace
       runs -> one space, spaces hugging newlines dropped, ends
       trimmed. Line STRUCTURE is preserved (newlines survive) so
       line-shape quality signals still work downstream.

    NULL stays NULL. Every regex is RE2-safe and mirrored verbatim in
    the DuckDB oracle."""
    out = c
    if form is not None:
        out = unicode_normalize(out, form)
    if strip_control:
        out = F.regexp_replace(
            out, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""
        )
    if collapse_whitespace:
        out = F.regexp_replace(out, "\r\n?", "\n")
        out = F.regexp_replace(out, "[ \t]+", " ")
        out = F.regexp_replace(out, " ?\n ?", "\n")
        out = F.trim(out)
    return out
