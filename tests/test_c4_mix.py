"""Unit tests for the C4 heuristic filter battery (operators/c4.py) and
the τ=2 temperature mix (operators/sampling.py temperature_*)."""

import pyspark.sql.functions as F
import pytest

from open_source_search_engine_spark.operators import c4
from open_source_search_engine_spark.operators.sampling import (
    temperature_mix,
    temperature_quotas,
)


def _lines_df(spark, lines):
    return spark.createDataFrame([(lines,)], "lines array<string>")


def _kept(spark, lines):
    df = _lines_df(spark, lines)
    return df.select(c4.kept_lines(F.col("lines")).alias("k")).first()["k"]


class TestC4LineRules:
    def test_terminal_punctuation_required(self, spark):
        kept = _kept(
            spark,
            ["good solid sentence here.", "no terminal punct here at all"],
        )
        assert kept == ["good solid sentence here."]

    def test_all_terminal_marks_accepted(self, spark):
        lines = [
            "ends with period one two.",
            "ends with bang one two!",
            "ends with question one two?",
            'ends with quote one two."',
            "trailing spaces tolerated one.  ",
        ]
        assert _kept(spark, lines) == lines

    def test_min_words(self, spark):
        kept = _kept(spark, ["short one.", "three words here."])
        assert kept == ["three words here."]

    def test_javascript_line_dropped(self, spark):
        kept = _kept(
            spark,
            ["enable JavaScript to continue.", "a normal kept sentence."],
        )
        assert kept == ["a normal kept sentence."]

    def test_empty_line_dropped(self, spark):
        assert _kept(spark, ["", "keep this one fine."]) == [
            "keep this one fine."
        ]


class TestC4PageRules:
    def _keep(self, spark, text, n_kept):
        df = spark.createDataFrame([(text, n_kept)], "t string, n int")
        return df.select(
            c4.page_kept(F.col("t"), F.col("n")).alias("k")
        ).first()["k"]

    def test_min_kept_lines(self, spark):
        assert self._keep(spark, "clean page", 3)
        assert not self._keep(spark, "clean page", 2)

    def test_lorem_ipsum_poisons(self, spark):
        assert not self._keep(spark, "has Lorem Ipsum filler", 5)

    def test_curly_brace_poisons(self, spark):
        assert not self._keep(spark, "function f() { return }", 5)

    def test_bad_word_poisons_whole_word_only(self, spark):
        assert not self._keep(spark, "contains badword here", 5)
        # substring is NOT a whole-word hit
        assert self._keep(spark, "contains badwordy here", 5)

    def test_clean_text_empty_not_null_when_dropped(self, spark):
        df = spark.createDataFrame(
            [(["no punct line"],)], "lines array<string>"
        ).withColumn("t", F.lit("page with { brace"))
        row = c4.with_c4_columns(df, "lines", "t").first()
        assert row["page_kept"] is False
        assert row["clean_text"] == ""

    def test_with_c4_columns_full_battery(self, spark):
        df = spark.createDataFrame(
            [
                (
                    [
                        "keep this solid line.",
                        "and another kept one.",
                        "a third good line.",
                        "no punct",
                    ],
                    "clean page",
                )
            ],
            "lines array<string>, t string",
        )
        row = c4.with_c4_columns(df, "lines", "t").first()
        assert row["n_lines"] == 4
        assert row["n_kept_lines"] == 3
        assert row["page_kept"] is True
        assert row["clean_text"] == (
            "keep this solid line. and another kept one. a third good line."
        )


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # 40 'en', 10 'de', 5 'fr' — a skewed stratum distribution
    rows = []
    for i in range(40):
        rows.append((i, f"en text {i}", "en"))
    for i in range(10):
        rows.append((100 + i, f"de text {i}", "de"))
    for i in range(5):
        rows.append((200 + i, f"fr text {i}", "fr"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )


class TestTemperatureMix:
    def test_quota_math_matches_hand_computation(self, spark, skewed_docs):
        import math

        q = {
            r["lang"]: (r["_cnt"], r["_quota"])
            for r in temperature_quotas(skewed_docs, "lang", 30).collect()
        }
        ps = {
            lang: round(math.sqrt(cnt / 55) * 1_000_000)
            for lang, cnt in [("en", 40), ("de", 10), ("fr", 5)]
        }
        total_ps = sum(ps.values())
        for lang, (cnt, quota) in q.items():
            assert quota == min(cnt, (30 * ps[lang]) // total_ps)

    def test_rebalances_toward_tail_strata(self, spark, skewed_docs):
        q = {
            r["lang"]: r["_quota"]
            for r in temperature_quotas(skewed_docs, "lang", 30).collect()
        }
        # raw proportions would give en 21.8 of 30; sqrt-rebalanced en
        # share must sit strictly below that, tail strata above theirs
        assert q["en"] < 22
        assert q["fr"] >= 4  # raw share would be 2.7

    def test_selection_respects_quotas(self, spark, skewed_docs):
        sel = temperature_mix(skewed_docs, "lang", 30, "text", "doc_id")
        got = {
            r["lang"]: r["n"]
            for r in sel.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        q = {
            r["lang"]: r["_quota"]
            for r in temperature_quotas(skewed_docs, "lang", 30).collect()
        }
        assert got == {k: v for k, v in q.items() if v > 0}

    def test_partitioning_invariant(self, spark, skewed_docs):
        a = sorted(
            r["doc_id"]
            for r in temperature_mix(
                skewed_docs, "lang", 30, "text", "doc_id"
            ).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in temperature_mix(
                skewed_docs.repartition(13), "lang", 30, "text", "doc_id"
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_target_larger_than_corpus_keeps_everything_possible(
        self, spark, skewed_docs
    ):
        q = {
            r["lang"]: (r["_cnt"], r["_quota"])
            for r in temperature_quotas(skewed_docs, "lang", 10_000).collect()
        }
        # quota is clamped to the stratum size, never above
        for cnt, quota in q.values():
            assert quota <= cnt


def test_temperature_mix_survives_caller_quota_column(spark, skewed_docs):
    docs = skewed_docs.withColumn("_quota", F.lit(999))
    sel = temperature_mix(docs, "lang", 30, "text", "doc_id")
    # caller's column survives untouched and selection matches the
    # plain-column run
    assert "_quota" in sel.columns
    assert sel.filter(F.col("_quota") != 999).count() == 0
    plain = temperature_mix(skewed_docs, "lang", 30, "text", "doc_id")
    assert sorted(r["doc_id"] for r in sel.collect()) == sorted(
        r["doc_id"] for r in plain.collect()
    )


def test_temperature_mix_accepts_precomputed_quotas(spark, skewed_docs):
    q = temperature_quotas(skewed_docs, "lang", 30)
    a = temperature_mix(skewed_docs, "lang", 30, "text", "doc_id", quotas=q)
    b = temperature_mix(skewed_docs, "lang", 30, "text", "doc_id")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
