"""PII scrub / bad-word / domain filters: deterministic inline fixtures
(the synthetic documents table contains no PII by construction), plus a
no-Python-in-plan check — these must stay pure codegen projections."""

from __future__ import annotations

from pyspark.sql import functions as F

from kupo_spark.functions.scrub import (
    badwords_flag,
    domain_filter,
    pii_scrub,
    url_domain,
)
from kupo_spark.plans.explain import formatted_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_scrub_redacts_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail me at jane.doe+x@example.co.uk or call (555) 123-4567"),
            (2, "server at 192.168.0.1 and 8.8.8.8; bogus 999.999.1.1 stays"),
            (3, "ssn 123-45-6789 inside text"),
            (4, "clean document with numbers 12345 and words"),
        ],
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].text_scrubbed == "mail me at [EMAIL] or call [PHONE]"
    assert (out[1].n_email, out[1].n_phone) == (1, 1)
    assert out[2].text_scrubbed == "server at [IP] and [IP]; bogus 999.999.1.1 stays"
    assert out[2].n_ip == 2
    assert out[3].text_scrubbed == "ssn [SSN] inside text"
    assert out[3].n_ssn == 1 and out[3].n_phone == 0
    assert out[4].text_scrubbed == docs.where("doc_id=4").first().text
    assert out[4].has_pii is False and out[1].has_pii is True


def test_pii_families_do_not_double_count(spark):
    # the email eats its digits before the phone pattern runs
    docs = _docs(spark, [(1, "reach 555-123-4567@example.com today")])
    r = pii_scrub(docs).first()
    assert r.text_scrubbed == "reach [EMAIL] today"
    assert (r.n_email, r.n_phone) == (1, 0)


def test_badwords_whole_word_case_insensitive(spark):
    docs = _docs(
        spark,
        [
            (1, "the Badger crossed"),          # substring only -> clean
            (2, "that was BAD and bad again"),  # two whole-word hits
            (3, "all clean here"),
        ],
    )
    out = {r.doc_id: (r.n_badwords, r.blocked) for r in
           badwords_flag(docs, ["bad", "awful"]).collect()}
    assert out == {1: (0, False), 2: (2, True), 3: (0, False)}


def test_url_domain_and_blocklist(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://sub.Spam.example:8080/path?q=1"),
            (2, "http://user:pw@ok.org/x"),
            (3, "plain.example/path"),
            (4, "https://spamexample.net/"),
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: (r.domain, r.blocked) for r in
           domain_filter(docs, ["spam.example"]).collect()}
    assert out[1] == ("sub.spam.example", True)   # subdomain of blocked
    assert out[2] == ("ok.org", False)
    assert out[3] == ("plain.example", False)     # sibling, not subdomain
    assert out[4] == ("spamexample.net", False)   # no substring smear
    only = {r.doc_id: r.domain for r in domain_filter(docs, []).collect()}
    assert only[1] == "sub.spam.example"


def test_scrub_plans_are_pure_projection(spark):
    docs = _docs(spark, [(1, "x")])
    for df in (
        pii_scrub(docs),
        badwords_flag(docs, ["bad"]),
        domain_filter(docs.withColumnRenamed("text", "url"), ["a.b"]),
    ):
        plan = formatted_plan(df)
        assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_badwords_punctuation_edged_entries_match(spark):
    """Entries whose edge characters are non-word (\\b would never match
    there) still match as whole tokens via the lookaround boundaries."""
    docs = _docs(
        spark,
        [
            (1, "i love c++ a lot"),
            (2, "comparing c+++x is not the token c alone"),  # c++ then +x
            (3, "plain c code"),
            (4, "the word BADGER alone is never flagged"),
            (5, "plain bad word"),
        ],
    )
    got = {
        r.doc_id: (r.n_badwords, r.blocked)
        for r in badwords_flag(docs, ["c++", "bad"]).collect()
    }
    assert got[1] == (1, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (1, True)
