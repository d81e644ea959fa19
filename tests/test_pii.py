"""functions.pii unit tests: detection, masking order, count
semantics, and Spark/DuckDB pattern agreement on fixtures the
driver corpus can't exercise (it contains no PII by construction)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions import pii

FIXTURES = [
    (1, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
    (2, "server at 192.168.0.1 and 10.0.0.255 refused"),
    (3, "no personal data here at all"),
    (4, "a@b.io a@b.io twice, phone 555-123-9876"),
    (5, ""),
]


def _df(spark):
    return spark.createDataFrame(FIXTURES, "doc_id long, text string")


def test_counts(spark):
    got = {
        r["doc_id"]: r
        for r in _df(spark)
        .select(
            "doc_id",
            pii.email_count(F.col("text")).alias("e"),
            pii.ip_count(F.col("text")).alias("i"),
            pii.phone_count(F.col("text")).alias("p"),
        )
        .collect()
    }
    assert (got[1]["e"], got[1]["i"], got[1]["p"]) == (1, 0, 1)
    assert (got[2]["e"], got[2]["i"], got[2]["p"]) == (0, 2, 0)
    assert (got[3]["e"], got[3]["i"], got[3]["p"]) == (0, 0, 0)
    assert (got[4]["e"], got[4]["p"]) == (2, 1)


def test_scrub_masks_everything(spark):
    rows = {
        r["doc_id"]: r["m"]
        for r in _df(spark).select("doc_id", pii.scrub(F.col("text")).alias("m")).collect()
    }
    assert rows[1] == "contact <EMAIL> or call <PHONE> now"
    assert rows[2] == "server at <IP> and <IP> refused"
    assert rows[3] == "no personal data here at all"
    assert rows[4] == "<EMAIL> <EMAIL> twice, phone <PHONE>"


def test_spark_and_duckdb_agree_on_fixtures(spark):
    """The same pattern text must behave identically in Java regex
    and RE2 — pinned on the fixtures, not just the PII-free corpus."""
    sdf = (
        _df(spark)
        .select(
            "doc_id",
            pii.email_count(F.col("text")).alias("n_emails"),
            pii.ip_count(F.col("text")).alias("n_ips"),
            pii.phone_count(F.col("text")).alias("n_phones"),
            pii.scrub(F.col("text")).alias("masked"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in FIXTURES)
    c = pii.counts_sql("text")
    ddf = con.sql(
        f"SELECT doc_id, {c['n_emails']} AS n_emails, {c['n_ips']} AS n_ips, "
        f"{c['n_phones']} AS n_phones, {pii.scrub_sql('text')} AS masked "
        f"FROM (VALUES {vals}) v(doc_id, text) ORDER BY doc_id"
    ).df()
    for col in ["n_emails", "n_ips", "n_phones", "masked"]:
        assert list(sdf[col]) == list(ddf[col]), col
