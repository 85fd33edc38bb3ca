"""Language analyzer chains (french/german/spanish/italian/portuguese/
dutch) — golden-locked light-stemming behavior + registry + end-to-end
index/search with a non-English chain."""

import os

import pytest

from lucene_1_spark.analysis import get_analyzer


@pytest.mark.parametrize("name", ["french", "german", "spanish",
                                  "italian", "portuguese", "dutch",
                                  "russian", "swedish", "norwegian",
                                  "danish", "finnish", "hungarian",
                                  "czech", "romanian", "indonesian",
                                  "turkish", "arabic", "greek",
                                  "persian", "hindi", "bulgarian",
                                  "catalan", "galician", "basque",
                                  "armenian", "bengali", "latvian",
                                  "lithuanian", "estonian", "irish",
                                  "sorani", "brazilian", "nepali",
                                  "serbian", "tamil", "telugu",
                                  "thai", "japanese", "korean"])
def test_registry_resolves(name):
    an = get_analyzer(name)
    assert an.tokens("") == []
    assert an is get_analyzer(name)  # memoized


GOLDENS = {
    # (analyzer, text) -> expected tokens (stop removal + light stem)
    ("french", "les chevaux et la maison"): ["cheval", "maison"],
    ("french", "nationalisation des marchés"): ["nationalis", "march"],
    ("german", "die Häuser und der Gärten"): ["haus", "gart"],
    ("german", "Straße"): ["stras"],
    ("spanish", "los niños y las casas"): ["nin", "cas"],
    ("spanish", "rápidamente"): ["rapida"],
    ("italian", "le città e i libri"): ["citt", "libr"],
    ("portuguese", "as nações e os amigos"): ["nac", "amig"],
    ("dutch", "de huizen en de koningen"): ["huiz", "koning"],
    # round-4 languages: inflected pairs conflate to one stem, stop
    # words drop, language-specific casing/normalization applies
    ("russian", "книги и книгами"): ["книг", "книг"],
    ("russian", "красивый красивая"): ["красив", "красив"],
    ("swedish", "flickorna och flickor"): ["flick", "flick"],
    ("norwegian", "husene og huset"): ["hus", "hus"],
    ("danish", "hunden og hundene"): ["hund", "hund"],
    ("finnish", "talossa ja talot"): ["talo", "talo"],
    ("hungarian", "házakban és házak"): ["haz", "haz"],
    ("czech", "hrady a hradech"): ["hrad", "hrad"],
    ("romanian", "timpurilor și timpuri"): ["timp", "timp"],
    ("indonesian", "bukunya dan membaca"): ["buku", "baca"],
    ("turkish", "kitaplar ve kitapları"): ["kitap", "kitap"],
    # TurkishLowerCaseFilter semantics: İ→i, I→ı (dotless) before
    # stemming; the locative strip on ISPARTA is the documented
    # light-stemmer aggressiveness
    ("turkish", "İstanbul ISPARTA"): ["istanbul", "ıspar"],
    # ArabicNormalization (ال strip, ة→ه then suffix strip)
    ("arabic", "الكتاب والكتب في المدرسة"): ["كتاب", "كتب", "مدرس"],
    # round-5 languages (el/fa/hi/bg — VERDICT item 5)
    # GreekLowerCaseFilter folds tonos + final sigma before stemming
    ("greek", "Οι υπολογιστές και οι μηχανές"): ["υπολογιστ", "μηχαν"],
    ("greek", "ΑΝΘΡΩΠΟΣ ανθρώπου"): ["ανθρωπ", "ανθρωπ"],
    # Persian: ک→ك, ی→ي fold; ها plural and ی suffixes strip in
    # sequence (PersianStemmer.java suffix order)
    ("persian", "کتاب‌ها و کتابی"): ["كتاب", "ها", "كتاب"],
    ("persian", "دانشجویان و دانشجو"): ["دانشجو", "دانشجو"],
    # Hindi: nukta fold + matra-aware tokenization + lightweight
    # stemmer (Ramanathan & Rao suffix table)
    ("hindi", "लड़का लड़के लड़कियों"): ["लडक", "लडक", "लडक"],
    # normalize runs BEFORE stop (HindiAnalyzer.java:126-128), so और
    # reaches the stop filter as ओर and survives — reference-faithful
    ("hindi", "किताबें और किताब"): ["किताब", "ओर", "किताब"],
    # Bulgarian: definite article + plural alternations (Savoy BUIR)
    ("bulgarian", "градовете и град"): ["град", "град"],
    ("bulgarian", "хората и хора"): ["хор", "хор"],
    ("bulgarian", "книгата и книги"): ["книг", "книг"],
    # round-5 batch 4 (VERDICT missing item 5): inflected pairs
    # conflate; elision (ca/ga), Irish mutation casing, Bengali nukta
    # normalization + matra-aware tokens, Sorani yeh/kaf fold
    ("catalan", "l'aigua i les aigües"): ["aigu", "aigu"],
    ("catalan", "els llibres i el llibre"): ["llibr", "llibr"],
    ("galician", "as cancions e a cancion"): ["can", "can"],
    ("galician", "os irmans e o irman"): ["irman", "irman"],
    ("basque", "etxea eta etxeetako"): ["etxe", "etxe"],
    ("basque", "liburuak eta liburua"): ["liburu", "liburu"],
    ("armenian", "գրքերի և գրքեր"): ["գրք", "գրք"],
    ("armenian", "տներում և տների"): ["տներ", "տներ"],
    ("bengali", "বইগুলো এবং বইগুলির"): ["বই", "বই"],
    ("bengali", "ছেলেদের এবং ছেলেরা"): ["ছেলে", "ছেলে"],
    ("latvian", "grāmatas un grāmatām"): ["grāmat", "grāmat"],
    ("latvian", "kaķis un kaķi"): ["kaķ", "kaķ"],
    ("lithuanian", "knygos ir knygoms"): ["knyg", "knyg"],
    ("lithuanian", "vaikas ir vaikams"): ["vaik", "vaik"],
    ("estonian", "raamatutele ja raamatud"): ["raamatu", "raamatu"],
    ("estonian", "majas ja majade"): ["maja", "maja"],
    # IrishLowerCaseFilter: tUachtarán -> t-uachtarán (mutation prefix
    # kept, hyphenated); hyphen-split n-athair leaves the bare "n" to
    # the HYPHENATIONS stop set; d' elision
    ("irish", "an tUachtarán agus an t-uachtarán"):
        ["t-uachtarán", "uachtarán"],
    ("irish", "d'fhear agus n-athair"): ["fhear", "athair"],
    ("sorani", "کتێبەکان و کتێبێک"): ["کتێب", "کتێب"],
    ("sorani", "منداڵەکەی و منداڵان"): ["منداڵ", "منداڵ"],
    # round-5 batch 5: every analysis/common language dir now has a
    # chain (br ne sr ta te + th/ja/ko via the dictionary segmenter)
    ("brazilian", "as nações e a nação"): ["nac", "nac"],
    ("brazilian", "casinhas e casas"): ["cas", "cas"],
    ("nepali", "किताबहरूको र किताब"): ["किताब", "किताब"],
    ("nepali", "नेपालमा र नेपाल"): ["नेपाल", "नेपाल"],
    # SerbianNormalizationFilter: Cyrillic and Latin spellings fold to
    # the same bald-Latin stem (the filter's whole point)
    ("serbian", "књиге и knjige"): ["knjig", "knjig"],
    ("serbian", "београд и beograd"): ["beograd", "beograd"],
    # Tamil plural கள் strip + the ங் -> ம் sandhi reversal
    ("tamil", "புத்தகங்கள் மற்றும் புத்தகம்"):
        ["புத்தகம்", "புத்தகம்"],
    # TeluguStemmer is an exact port: single-pass, so the double
    # plural strips one layer per application (reference behavior)
    ("telugu", "పుస్తకము మరియు పుస్తకములు"): ["పుస్తక", "పుస్తకము"],
    # long->short vowel normalization (ఊ -> ఉ) before stemming
    ("telugu", "ఈ ఊరిలో"): ["ఇ", "ఉరిల"],
    # plain-name CJK/Thai chains resolve to the dictionary segmenter
    ("thai", "สวัสดีประเทศไทย และ"): ["สวัสดี", "ประเทศ", "ไทย"],
    ("japanese", "日本語の学生"): ["日本", "語", "の", "学生"],
    ("korean", "한국사람"): ["한국", "사람"],
}


@pytest.mark.parametrize("key", sorted(GOLDENS, key=str))
def test_golden_stems(key):
    name, text = key
    assert get_analyzer(name).tokens(text) == GOLDENS[key], key


def test_stopwords_leave_position_gaps():
    an = get_analyzer("french")
    # 'et' and 'la' are stopwords: positions of survivors keep gaps
    got = an.tokens_with_positions("chevaux et la maison")
    assert got == [("cheval", 0), ("maison", 3)]


def test_end_to_end_index_with_french_analyzer(spark, tmp_root):
    import pandas as pd

    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    pdf = pd.DataFrame([
        ("r", "d0", "c", "fr", "le cheval blanc"),
        ("r", "d1", "c", "fr", "les chevaux noirs"),
        ("r", "d2", "c", "fr", "la maison bleue"),
    ], columns=["repo", "path", "commit", "lang", "content"])
    d = os.path.join(tmp_root, "idx_french")
    IndexBuilder(spark, d, IndexConfig(analyzer="french", n_buckets=4,
                                       n_doc_partitions=2)) \
        .build(spark.createDataFrame(pdf))
    s = IndexSearcher(IndexReader(spark, d))
    # singular and plural stem to the same term -> both docs match
    hits = {r["doc_id"] for r in s.search_df("cheval", k=None).collect()}
    assert hits == {0, 1}
    hits2 = {r["doc_id"] for r in s.search_df("chevaux", k=None).collect()}
    assert hits2 == {0, 1}


def test_end_to_end_index_with_russian_analyzer(spark, tmp_root):
    import pandas as pd

    from lucene_1_spark.index import IndexBuilder, IndexReader
    from lucene_1_spark.index.builder import IndexConfig
    from lucene_1_spark.search import IndexSearcher
    pdf = pd.DataFrame([
        ("r", "d0", "c", "ru", "новая книга"),
        ("r", "d1", "c", "ru", "старые книги и журналы"),
        ("r", "d2", "c", "ru", "журнал на столе"),
    ], columns=["repo", "path", "commit", "lang", "content"])
    d = os.path.join(tmp_root, "idx_russian")
    IndexBuilder(spark, d, IndexConfig(analyzer="russian", n_buckets=4,
                                       n_doc_partitions=2)) \
        .build(spark.createDataFrame(pdf))
    s = IndexSearcher(IndexReader(spark, d))
    # singular and plural query forms stem together -> both docs match
    hits = {r["doc_id"] for r in s.search_df("книга", k=None).collect()}
    assert hits == {0, 1}
    hits2 = {r["doc_id"] for r in s.search_df("книгами", k=None).collect()}
    assert hits2 == {0, 1}
    # Snowball artifact the reference shares (RussianStemmer.java a_4
    # 'л' group-1): журнал ends verb-like -ал so it stems to 'журна',
    # while журналы takes the noun rule to 'журнал' — the two forms do
    # NOT conflate under genuine Snowball (the light stemmer did)
    hits3 = {r["doc_id"] for r in s.search_df("журналы", k=None).collect()}
    assert hits3 == {1}
    hits4 = {r["doc_id"] for r in s.search_df("журнал", k=None).collect()}
    assert hits4 == {2}


def test_snowball_stemmers_match_reference_goldens():
    """ru/sv/no/da default chains now run SNOWBALL stemmers, matching
    the reference analyzers' defaults (ru/RussianAnalyzer.java:114 ->
    org.tartarus.snowball.ext.RussianStemmer, likewise sv/no/da).
    Goldens are the reference's own analyzer tests
    (TestRussianAnalyzer.java:36-41, TestSwedishAnalyzer.java:34-35,
    TestNorwegianAnalyzer.java:34-35, TestDanishAnalyzer.java:34-35)."""
    from lucene_1_spark.analysis.snowball import (danish_snowball_stem,
                                                  norwegian_snowball_stem,
                                                  russian_snowball_stem,
                                                  swedish_snowball_stem)
    ru = {"вместе": "вмест", "силе": "сил",
          "электромагнитной": "электромагнитн", "энергии": "энерг",
          "имели": "имел", "представление": "представлен",
          "знание": "знан", "это": "эт", "хранилось": "хран",
          "тайне": "тайн"}
    for w, e in ru.items():
        assert russian_snowball_stem(w) == e, w
    assert swedish_snowball_stem("jaktkarlarne") == "jaktkarl"
    assert swedish_snowball_stem("jaktkarlens") == "jaktkarl"
    assert norwegian_snowball_stem("havnedistriktene") == "havnedistrikt"
    assert norwegian_snowball_stem("havnedistrikter") == "havnedistrikt"
    assert danish_snowball_stem("undersøgelse") == "undersøg"
    assert danish_snowball_stem("undersøg") == "undersøg"
    # full analyzer chain (stop filter + snowball), reference golden
    from lucene_1_spark.analysis import get_analyzer
    assert get_analyzer("russian").tokens(
        "Вместе с тем о силе электромагнитной энергии имели "
        "представление еще") == ["вмест", "сил", "электромагнитн",
                                 "энерг", "имел", "представлен"]
    # the Savoy-light variants stay available (the reference's
    # *LightStemFilter alternatives)
    assert get_analyzer("russian_light").tokens("книгами") == ["книг"]


def test_ru_snowball_sql_twin_matches_python():
    """The generated DuckDB CTE chain in oracle_sql()['ft_ru_stem_topk']
    must reproduce analysis/snowball.russian_snowball_stem exactly —
    property-checked over random words from the transliteration
    alphabet plus adversarial shapes (vowel-free, vowel-only, group-1
    preconditions, R2-gated derivational, нн tidy-up)."""
    import random

    import duckdb

    import __spark_entry__ as entrymod
    from lucene_1_spark.analysis.snowball import russian_snowball_stem

    sql = entrymod.oracle_sql()["ft_ru_stem_topk"]
    pre, rest = sql.split("sn0 AS", 1)
    snpart = "WITH sn0 AS" + rest.split(",\ntf AS")[0]
    rng = random.Random(42)
    alpha = "абвгдежзиклмнопрстуфхцчшщыя"
    words = ["", "б", "ост", "ость", "красивость", "честность",
             "нн", "сильнн", "читавшая", "читавши", "увшись",
             "большейше", "стон", "окно", "ёлками"]
    words += ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
              for _ in range(600)]
    # append real suffixes to random stems so every class fires
    from lucene_1_spark.analysis import snowball as sb
    sufs = (sb._RU_PG1 + sb._RU_PG2 + sb._RU_ADJ + sb._RU_VERB1
            + sb._RU_VERB2 + sb._RU_NOUN + ("ость", "ейше", "нн", "ь"))
    words += ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
              + rng.choice(sufs) for _ in range(600)]
    words = sorted({w for w in words if w})
    con = duckdb.connect()
    con.execute("CREATE TABLE toks0x (doc_id BIGINT, term VARCHAR)")
    con.executemany("INSERT INTO toks0x VALUES (?, ?)",
                    list(enumerate(words)))
    q = (snpart.replace("FROM toks0)", "FROM toks0x)")
         + "\nSELECT t.term, s.term FROM stems s JOIN toks0x t "
           "USING (doc_id)")
    bad = [(raw, got, russian_snowball_stem(raw))
           for raw, got in con.execute(q).fetchall()
           if got != russian_snowball_stem(raw)]
    assert not bad, bad[:10]
