"""PII scrubbing and URL/bad-word filtering — the redaction/exclusion
pass of a pretraining corpus pipeline (the C4 cleaning rules: Raffel et
al. 2020 §2.2 drop pages with blocklisted words; PII masking per the
standard email/phone/IP/SSN regex families).

Everything is JVM-side (`regexp_replace` / `regexp_count` /
`parse_url`-free domain extraction) — codegen-friendly single-scan
projections with no UDF, no shuffle, no Python in the hot path.  The
regexes are deliberately conservative, deterministic, and documented
inline; swapping in an org's canonical PII patterns is a constant edit.

No reference analog (kupo indexes UTxOs, not text); these extend the
`documents`-table operator family (SURVEY.md "training-data pipeline"
section) alongside quality/lang-id/dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_scrub",
    "badwords_flag",
    "url_domain",
    "domain_filter",
]

#: pattern → placeholder, applied in order (email before phone so the
#: digits in a local-part never half-match a phone).
PII_PATTERNS: list[tuple[str, str, str]] = [
    # local@domain.tld — conservative RFC-lite form
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # SSN-shaped 3-2-4 digit groups with dashes (before generic phones,
    # which would otherwise eat the same digits)
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    # +1 555 123 4567 / (555) 123-4567 / 555-123-4567: 7+ digits with
    # separators, optional country code
    ("phone", r"(?<!\d)(\+?\d{1,3}[ .-])?(\(\d{2,4}\)[ .-]?|\d{2,4}[ .-])\d{3}[ .-]?\d{3,4}(?!\d)", "[PHONE]"),
    # dotted-quad IPv4 with per-octet 0-255 bound
    ("ip", r"\b((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b", "[IP]"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_scrubbed, n_email, n_ssn, n_phone, n_ip, has_pii):
    typed-placeholder redaction plus per-kind match counts.

    Counts are taken against the PROGRESSIVELY scrubbed text (the same
    string each pattern actually rewrites), so `n_<kind>` is exactly the
    number of `[<KIND>]` placeholders that pattern inserted — no
    double-counting when families overlap (a phone inside an email)."""
    scrubbed: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(scrubbed, F.lit(pat)).alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out = docs.select("doc_id", scrubbed.alias("text_scrubbed"), *counts)
    total = sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS)
    return out.withColumn("has_pii", total > 0)


def badwords_flag(
    docs: DataFrame, words: list[str], text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_badwords, blocked): C4's page-drop rule — any
    case-insensitive whole-word blocklist hit marks the document.  The
    blocklist compiles into ONE alternation regex evaluated in a single
    codegen pass (no token explode, no join); at 100 TB the list rides
    the plan as a literal, never a broadcast table."""
    if not words:
        return docs.select(
            "doc_id", F.lit(0).alias("n_badwords"), F.lit(False).alias("blocked")
        )
    import re

    # longest-first so overlapping entries ("bad", "badger") match whole;
    # re.escape keeps metacharacter-bearing entries ("c++", "a.b") literal
    # (Python and Java regex agree on backslash-escaped punctuation).
    # Word boundaries via lookarounds, not \b: \b is an empty match between
    # \w and \W, so "\bc\+\+\b" can never match ("+" is \W — there is no
    # boundary after it); the lookarounds only require the *neighbouring*
    # text to be non-word, which works for entries with punctuation edges.
    alt = "|".join(
        re.escape(w)
        for w in sorted({w.lower() for w in words}, key=lambda w: (-len(w), w))
    )
    pat = f"(?i)(?<![A-Za-z0-9_])({alt})(?![A-Za-z0-9_])"
    n = F.regexp_count(F.col(text_col), F.lit(pat))
    return docs.select("doc_id", n.alias("n_badwords"), (n > 0).alias("blocked"))


def url_domain(url: Column | str) -> Column:
    """Registrable host of a URL, lowercased, port stripped — pure regex
    (scheme-optional, stops at /, ?, #, :)."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(c, r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/?#@]*@)?([^/?#:]+)", 1)
    return F.lower(host)


def domain_filter(
    docs: DataFrame,
    blocked_domains: list[str],
    url_col: str = "url",
) -> DataFrame:
    """(…docs, domain, blocked): mark documents whose URL host is a
    blocked domain or any subdomain of one.  The blocklist is a literal
    array probed with exists() over suffix matches — one scan, no join;
    a million-entry production list would instead broadcast-join on the
    reversed-domain prefix, same semantics."""
    dom = url_domain(url_col)
    lits = F.array(*[F.lit(d.lower()) for d in blocked_domains])
    blocked = F.exists(
        lits,
        lambda b: (F.col("domain") == b)
        | F.col("domain").endswith(F.concat(F.lit("."), b)),
    )
    return docs.withColumn("domain", dom).withColumn(
        "blocked", blocked if blocked_domains else F.lit(False)
    )
