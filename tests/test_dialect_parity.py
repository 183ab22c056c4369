"""Differential fuzz of the dual-dialect SQL recipes.

The oracle gate only proves Spark↔DuckDB agreement on the testdata
corpus; these tests hammer the two dialect-sensitive scalar recipes —
PII scrub (Java regex vs RE2) and URL canonicalization (string/array
HOFs) — with seeded adversarial inputs and assert the engines agree
value-for-value on ALL of them.  Inputs are batched into one DataFrame
per family so the whole fuzz costs two Spark jobs, not hundreds.
"""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from go_readability_spark.textops.pii import (
    EMAIL_RX,
    IPV4_RX,
    PHONE_RX,
    scrub_pii_col,
)
from go_readability_spark.textops.urls import canonical_url_sql


def _pii_corpus() -> list[str]:
    rnd = random.Random(42)
    atoms = [
        "user@example.com", "a.b+c@x-y.co.uk", "u@h", "@", "a@b.c",
        "nobody@", "@example.com", "UPPER@CASE.ORG", "ü@example.com",
        "x@@y.com", "dot.@trail.com",
        "10.0.0.1", "192.168.1.254", "999.999.999.999", "1.2.3.4.5",
        "10.0.0.", "0.0.0.0", "256.1.1.1", "1.2.3",
        "+1 (555) 794-0958", "555-123-4567", "5551234567",
        "+44 (020) 7946-0958", "555.123.4567", "555 123 4567",
        "(555)123-4567", "+1-555-123-4567", "12345-678-90123",
        "call me", "a < b & c", "' OR 1=1", "line\nbreak", "tab\there",
        "v1.2.3 released", "pi=3.14159", "§", "€100", "文字",
        " ", "", ".", "@.", "1-2", "...", "a-b-c",
    ]
    corpus = list(atoms)
    for _ in range(160):
        k = rnd.randint(1, 5)
        corpus.append(" ".join(rnd.choice(atoms) for _ in range(k)))
    for _ in range(40):
        corpus.append(
            "".join(
                rnd.choice(string.ascii_letters + string.digits + "@.-+() ")
                for _ in range(rnd.randint(0, 60))
            )
        )
    return corpus


def test_pii_scrub_and_counts_agree_across_engines(spark):
    corpus = _pii_corpus()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["i", "t"])
    srows = (
        df.select(
            "i",
            scrub_pii_col(F.col("t")).alias("scrubbed"),
            F.regexp_count("t", F.lit(EMAIL_RX)).alias("ne"),
            F.regexp_count("t", F.lit(IPV4_RX)).alias("ni"),
            F.regexp_count("t", F.lit(PHONE_RX)).alias("np"),
        )
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE c (i INT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(corpus)))
    scrub = "t"
    for pat, token in (
        (EMAIL_RX, "[EMAIL]"),
        (IPV4_RX, "[IP]"),
        (PHONE_RX, "[PHONE]"),
    ):
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    drows = con.execute(
        f"""SELECT i, {scrub} AS scrubbed,
               len(regexp_extract_all(t, '{EMAIL_RX}')) AS ne,
               len(regexp_extract_all(t, '{IPV4_RX}')) AS ni,
               len(regexp_extract_all(t, '{PHONE_RX}')) AS np
            FROM c ORDER BY i"""
    ).fetchall()
    con.close()
    for s, d in zip(srows, drows):
        assert (s.scrubbed, s.ne, s.ni, s.np) == (d[1], d[2], d[3], d[4]), (
            f"dialect divergence on {corpus[s.i]!r}: "
            f"spark={(s.scrubbed, s.ne, s.ni, s.np)} duck={d[1:]}"
        )


def _url_corpus() -> list[str]:
    rnd = random.Random(7)
    atoms = [
        "https://Ex.COM:443/a/?utm_source=x&b=2&a=1#f",
        "http://ex.com:80", "http://ex.com:8080/",
        "https://ex.com/p?utm_a=1&ref=tw", "ftp://Files.Ex.com:21/pub/",
        "https://user@a.com/x", "http://[::1]/y", "not a url", "",
        "https://ex.com/p/q/?z=1&gclid=abc&y=2", "https://ex.com///",
        "HTTPS://EX.COM", "https://ex.com?", "https://ex.com#",
        "https://ex.com/?", "https://ex.com/#a#b", "https://ex.com/a b",
        "scheme+x://h/p", "https://ex.com:0/p", "https://ex.com:443:80/p",
        "https://ex.com/?&", "https://ex.com/?a", "https://ex.com/?a=",
        "https://ex.com/?=b", "https://ex.com/?utm_=1",
        "https://ex.com/?ref", "https://ex.com/?xref=1&fbclid=2",
    ]
    corpus = list(atoms)
    parts = ["https://", "HTTP://", "ex.com", "Ex.COM:443", "/a/b/", "?a=1",
             "&utm_x=2", "#frag", ":8080", "//", "?", "=", "&", " ", "%20"]
    for _ in range(120):
        corpus.append("".join(rnd.choice(parts) for _ in range(rnd.randint(1, 6))))
    return corpus


def test_url_canonicalization_agrees_across_engines(spark):
    corpus = _url_corpus()
    df = spark.createDataFrame([(i, u) for i, u in enumerate(corpus)], ["i", "url"])
    srows = (
        df.select("i", F.expr(canonical_url_sql("url", "spark")).alias("c"))
        .orderBy("i")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE u (i INT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", list(enumerate(corpus)))
    drows = con.execute(
        f"SELECT i, {canonical_url_sql('url', 'duckdb')} AS c FROM u ORDER BY i"
    ).fetchall()
    con.close()
    for s, d in zip(srows, drows):
        assert s.c == d[1], (
            f"dialect divergence on {corpus[s.i]!r}: spark={s.c!r} duck={d[1]!r}"
        )
