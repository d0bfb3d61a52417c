"""Multi-language ID (X7 full-strength, r5): profile-scored argmax over
7 languages, pure column expressions, oracle-replayable.

Reference analog: Language.cpp/Lang.cpp n-gram language detection
(SURVEY.md §2.8 X7) — the Spark rebuild scores space-padded
function-word grams per language with the length/replace count.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators import textstats as TS

SAMPLES = [
    ("en", "the cat sat on the mat and it is that simple for all of us"),
    ("de", "der hund und die katze sind nicht das problem mit dem zu haus"),
    ("fr", "le chat est dans la maison et les enfants ne sont pas une chose"),
    ("es", "el perro que vive con los vecinos es una mascota para la casa del barrio"),
    ("it", "il gatto che dorme non vuole essere per niente anche come gli altri"),
    ("nl", "de hond en het kind zijn niet met een bal voor dat huis ook"),
    ("pt", "um gato e uma casa sem os problemas mas com mais ideias como dos outros das coisas"),
]


def _predict(spark, rows):
    df = spark.createDataFrame(rows, "want string, text string")
    return {
        r["want"]: r["got"]
        for r in df.select(
            "want", TS.langid_multi(F.col("text")).alias("got")
        ).collect()
    }


def test_seven_languages_classified(spark):
    got = _predict(spark, SAMPLES)
    for want, pred in got.items():
        assert pred == want, f"{want!r} classified as {pred!r}"


def test_null_empty_and_nonletter_are_other(spark):
    rows = [("a", None), ("b", ""), ("c", "12345 !!! ### 678")]
    df = spark.createDataFrame(rows, "k string, text string")
    got = [
        r["got"]
        for r in df.select(TS.langid_multi(F.col("text")).alias("got")).collect()
    ]
    assert got == ["other", "other", "other"]


def test_tie_breaks_alphabetically(spark):
    # 'que' is in both es and fr profiles: a text of only 'que' scores
    # es=1, fr=1 -> first max alphabetically is es
    df = spark.createDataFrame([("que",)], "text string")
    got = df.select(TS.langid_multi(F.col("text")).alias("g")).first()["g"]
    assert got == "es"


def test_sql_twin_matches_engine(spark):
    # the generated DuckDB expression must classify every sample row
    # identically to the Spark column expression
    expr = TS.langid_multi_sql("text")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (want VARCHAR, text VARCHAR)"
    )
    rows = SAMPLES + [("x", None), ("y", ""), ("z", "que")]
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    oracle = dict(con.execute(f"SELECT want, {expr} FROM t").fetchall())
    engine = _predict(spark, [(w, t) for w, t in rows])
    assert engine == oracle


def test_profiles_are_ascii_words():
    for lg, words in TS.LANG_PROFILES.items():
        assert len(words) == 10, lg
        for w in words:
            assert w.isascii() and w.isalpha() and w == w.lower(), (lg, w)
