"""PII detection + redaction (training-data hygiene stage).

Emails, IPv4 addresses and phone numbers are the classic scrub targets a
corpus pipeline runs AFTER extraction and BEFORE tokenization (C4 and
RefinedWeb both ship exactly this stage).  No reference equivalent —
go-readability never post-processes extracted text — so this is an
engine capability like the rest of ``textops``.

Everything is pure Catalyst (``regexp_count`` / chained
``regexp_replace``): scan-bound map work, no shuffle, no Python — the
100 TB shape is "free with the read".

Parity across engines: Spark compiles Java regex, DuckDB compiles RE2.
The patterns below stay inside the common subset (character classes,
bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences) so both engines accept and match them identically.  Two
dialect traps are handled at the call sites: DuckDB's
``regexp_replace`` replaces only the FIRST match unless passed the
``'g'`` flag, and scrub ORDER matters (emails, then IPs, then phones —
a phone pattern can otherwise bite into a dotted quad).

The testdata ``documents`` table carries no natural PII, so the query
derives a deterministic PII-bearing suffix per row from ``doc_id``
(same expression in both engines — the ``textops/urls.py`` synth-URL
precedent), exercising every rule with nonzero counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMAIL_RX = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}\b"
IPV4_RX = r"\b([0-9]{1,3}[.]){3}[0-9]{1,3}\b"
# NANP-shaped core (3-3-4 with separators) plus an optional +country
# prefix; 4-4 national formats (e.g. UK 7946 0958) are out of envelope.
PHONE_RX = r"(\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}\b"

# scrub order is load-bearing: see module docstring
_RULES = (
    (EMAIL_RX, "[EMAIL]"),
    (IPV4_RX, "[IP]"),
    (PHONE_RX, "[PHONE]"),
)


def scrub_pii_col(text_col: F.Column) -> F.Column:
    """Column with every PII match replaced by its class token."""
    out = text_col
    for pat, token in _RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def _synth_pii_text_sql(engine: str) -> str:
    """Deterministic text-with-PII for each (doc_id, text) row, rendered
    identically for Spark SQL and DuckDB (STRING vs VARCHAR casts only)."""
    s = "STRING" if engine == "spark" else "VARCHAR"
    return (
        "text"
        f" || CASE WHEN doc_id % 3 = 0 THEN ' Contact: user' || CAST(doc_id AS {s})"
        " || '@example.org for details.' ELSE '' END"
        f" || CASE WHEN doc_id % 4 = 0 THEN ' Origin server 10.' || CAST(doc_id % 256 AS {s})"
        f" || '.0.' || CAST(doc_id % 100 AS {s}) || ' responded.' ELSE '' END"
        f" || CASE WHEN doc_id % 5 = 0 THEN ' Call +1 (555) 01' || CAST(doc_id % 10 AS {s})"
        " || '-2345 now.' ELSE '' END"
    )


def pii_findings(documents: DataFrame) -> DataFrame:
    """Per-document PII counts + a digest of the redacted text:
    (doc_id, n_emails, n_ips, n_phones, scrubbed_md5).

    The digest value-checks the REDACTION itself (not just the counts)
    against the oracle; counts are taken before scrubbing.
    """
    t = F.expr(_synth_pii_text_sql("spark"))
    scrubbed = scrub_pii_col(t)
    return (
        documents.select(
            "doc_id",
            F.regexp_count(t, F.lit(EMAIL_RX)).cast("long").alias("n_emails"),
            F.regexp_count(t, F.lit(IPV4_RX)).cast("long").alias("n_ips"),
            F.regexp_count(t, F.lit(PHONE_RX)).cast("long").alias("n_phones"),
            F.md5(scrubbed).alias("scrubbed_md5"),
        )
        .filter((F.col("n_emails") + F.col("n_ips") + F.col("n_phones")) > 0)
        .orderBy("doc_id")
    )


def pii_findings_oracle_sql() -> str:
    t = _synth_pii_text_sql("duckdb")
    scrub = t
    for pat, token in _RULES:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all({t}, '{EMAIL_RX}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all({t}, '{IPV4_RX}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all({t}, '{PHONE_RX}')) AS BIGINT) AS n_phones,
       md5({scrub}) AS scrubbed_md5
FROM documents
WHERE len(regexp_extract_all({t}, '{EMAIL_RX}'))
    + len(regexp_extract_all({t}, '{IPV4_RX}'))
    + len(regexp_extract_all({t}, '{PHONE_RX}')) > 0
ORDER BY doc_id
"""
