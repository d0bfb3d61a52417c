"""PII scrub: counts match redactions, redaction is idempotent and
leaves no residual matches, and the chain order is stable."""

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.operators.scrub import (
    PII_PATTERNS,
    pii_count,
    pii_report,
    scrub_pii,
)

ROWS = [
    (0, "contact alice@example.com or bob.smith+x@sub.domain.org today"),
    (1, "server at 10.0.0.1 and 192.168.255.254 responded"),
    (2, "leaked key deadbeefdeadbeefdeadbeefdeadbeef in log"),
    (3, "mixed: eve@corp.io from 127.0.0.1 key 0123456789abcdef0123456789abcdef"),
    (4, "clean text with no identifiers at all"),
    (5, "short hex cafe1234 stays; version 1.2.3.4.5 has a dotted quad inside"),
    (6, "uppercase secret DEADBEEFDEADBEEFDEADBEEFDEADBEEF must scrub too"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_counts(spark, docs):
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_hexkey"], r["n_pii"])
        for r in docs.select("doc_id", *pii_report(F.col("text"))).collect()
    }
    assert got[0] == (2, 0, 0, 2)
    assert got[1] == (0, 2, 0, 2)
    assert got[2] == (0, 0, 1, 1)
    assert got[3] == (1, 1, 1, 3)
    assert got[4] == (0, 0, 0, 0)
    # '1.2.3.4.5' DOES contain one ipv4 match: digit->'.' IS a word
    # boundary in both Java regex and RE2, so '1.2.3.4' matches and the
    # scan resumes at '.5' (no second quad left) — pin that semantics
    assert got[5] == (0, 1, 0, 1)  # and cafe1234 is too short for a hexkey
    assert got[6] == (0, 0, 1, 1)  # uppercase hex keys are secrets too


def test_scrub_removes_all_matches(spark, docs):
    scrubbed = docs.select(
        "doc_id", scrub_pii(F.col("text")).alias("text")
    )
    residual = scrubbed.select(*pii_report(F.col("text"))).agg(
        F.sum("n_email").alias("e"), F.sum("n_ipv4").alias("i")
    ).collect()[0]
    assert residual["e"] == 0 and residual["i"] == 0


def test_scrub_idempotent(spark, docs):
    once = docs.select("doc_id", scrub_pii(F.col("text")).alias("t"))
    twice = once.select("doc_id", scrub_pii(F.col("t")).alias("t"))
    a = {r["doc_id"]: r["t"] for r in once.collect()}
    b = {r["doc_id"]: r["t"] for r in twice.collect()}
    assert a == b


def test_scrub_content(spark, docs):
    out = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", scrub_pii(F.col("text")).alias("t")
        ).collect()
    }
    assert out[0] == "contact <EMAIL> or <EMAIL> today"
    assert out[1] == "server at <IP> and <IP> responded"
    assert out[2] == "leaked key <KEY> in log"
    assert out[3] == "mixed: <EMAIL> from <IP> key <KEY>"
    assert out[4] == ROWS[4][1]  # clean text untouched
    assert out[5] == "short hex cafe1234 stays; version <IP>.5 has a dotted quad inside"
    assert out[6] == "uppercase secret <KEY> must scrub too"


def test_duckdb_parity(spark, docs):
    """The exact patterns and chain order replay in DuckDB's RE2 —
    the property the driver oracle depends on."""
    import duckdb

    con = duckdb.connect()
    pdf = docs.toPandas()
    con.register("docs", pdf)
    expr = "text"
    for _name, pat, rep in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _rep in PII_PATTERNS
    )
    oracle = {
        int(r[0]): tuple(r[1:])
        for r in con.execute(
            f"SELECT doc_id, {expr} AS scrubbed, {counts} FROM docs"
        ).fetchall()
    }
    got = {
        r["doc_id"]: (r["t"], r["n_email"], r["n_ipv4"], r["n_hexkey"])
        for r in docs.select(
            "doc_id",
            scrub_pii(F.col("text")).alias("t"),
            *[
                pii_count(F.col("text"), name).alias(f"n_{name}")
                for name, _p, _r in PII_PATTERNS
            ],
        ).collect()
    }
    assert got == oracle


def test_unknown_kind(spark):
    with pytest.raises(ValueError):
        pii_count(F.lit("x"), "ssn")


# --- Gopher repetition helpers (textstats) ---------------------------------


def test_dup_ngram_counts_hand_checked(spark):
    from open_source_search_engine_spark.operators import textstats

    rows = [
        (0, "a b a b a"),     # 2-grams: ab ba ab ba -> 2 dups of 4
        (1, "x y z"),          # 2-grams: xy yz -> 0 dups of 2
        (2, "q"),              # shorter than n -> (0, 0)
        (3, "r r r r"),        # 2-grams: rr rr rr -> 2 dups of 3 (>1/2)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = textstats.tokens_simple(F.col("text"))
    d2, t2 = textstats.dup_ngram_counts(toks, 2)
    got = {
        r["doc_id"]: (r["d"], r["t"], r["f"])
        for r in docs.select(
            "doc_id",
            d2.alias("d"),
            t2.alias("t"),
            F.round(textstats.dup_ngram_fraction(toks, 2), 4).alias("f"),
        ).collect()
    }
    assert got[0] == (2, 4, 0.5)
    assert got[1] == (0, 2, 0.0)
    assert got[2] == (0, 0, 0.0)
    assert got[3] == (2, 3, 0.6667)
    # the exact >1/2 integer test: only doc 3 is 'repetitive'
    rep = {
        r["doc_id"]
        for r in docs.select("doc_id", d2.alias("d"), t2.alias("t"))
        .filter(F.col("t") < 2 * F.col("d"))
        .collect()
    }
    assert rep == {3}


def test_word_ngrams_validation(spark):
    from open_source_search_engine_spark.operators import textstats

    with pytest.raises(ValueError):
        textstats.word_ngrams(F.col("x"), 0)


def test_pii_report_reconciles_with_scrub(spark):
    """Staged counting (review r4h): n_pii must equal the number of
    replacements scrub_pii performs, even when one span matches two
    patterns ('1.2.3.4@corp.com' is ONE email redaction, not
    email+ipv4)."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.operators.scrub import (
        pii_report,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [("contact: 1.2.3.4@corp.com and 5.6.7.8",)], "text string"
    )
    row = df.select(
        *pii_report(F.col("text")), scrub_pii(F.col("text")).alias("s")
    ).first()
    assert row["n_email"] == 1
    assert row["n_ipv4"] == 1  # only the standalone IP
    assert row["n_pii"] == 2
    assert row["s"] == "contact: <EMAIL> and <IP>"
