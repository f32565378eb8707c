"""PII redaction fixtures (operators/pii.py). The driver corpus is
digit-free word-salad, so redaction is verified here on handwritten
fixtures rather than by a vacuous always-zero driver query."""

from __future__ import annotations

from hadoop_project_spark.operators import pii


def _redact(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return pii.redact_documents(df).orderBy("doc_id").collect()


def test_email_and_phone(spark):
    rows = _redact(
        spark,
        ["contact jane.doe+spam@example.co.uk or call 415-555-0199 x3"],
    )
    r = rows[0]
    assert r.text == "contact [EMAIL] or call [PHONE] x3"
    assert r.n_email == 1 and r.n_phone == 1 and r.n_pii == 2


def test_ipv4_and_ssn_and_ccn(spark):
    rows = _redact(
        spark,
        [
            "server 10.0.255.14 logged ssn 123-45-6789.",
            "card 4111111111111111 declined",
            "not an ip 999.999.999.999 and not a ccn 123",
        ],
    )
    assert rows[0].text == "server [IPV4] logged ssn [SSN]."
    assert rows[0].n_ipv4 == 1 and rows[0].n_ssn == 1
    assert rows[1].text == "card [CCN] declined"
    assert rows[1].n_ccn == 1
    # 999.x is not a valid dotted-quad; bare '123' is not a card number
    assert rows[2].n_ipv4 == 0 and rows[2].n_ccn == 0


def test_email_digits_not_double_counted_as_phone(spark):
    rows = _redact(spark, ["mail 800-555-1212@txt.example.com now"])
    r = rows[0]
    assert r.n_email == 1
    assert r.n_phone == 0
    assert r.text == "mail [EMAIL] now"


def test_clean_text_untouched(spark):
    rows = _redact(spark, ["the quick brown fox jumps over the lazy dog"])
    r = rows[0]
    assert r.text == "the quick brown fox jumps over the lazy dog"
    assert r.n_pii == 0


def test_planted_corpus_fires_every_kind_at_driver_scale(spark, sf_dir):
    """VERDICT r11 #4: the shipped word-salad corpus is digit/@-free,
    so the planted-corpus query must be what makes the patterns FIRE
    at driver scale — assert the plant puts >0 spans of EVERY kind in
    the corpus (the known 40% fraction), that every planted doc fires,
    and that no clean doc false-fires."""
    from hadoop_project_spark.operators.pii import PII_PATTERNS
    from hadoop_project_spark.plans.pii_queries import (
        pii_planted_redaction,
    )

    rows = pii_planted_redaction(spark, sf_dir).collect()
    planted = [r for r in rows if r.planted]
    clean = [r for r in rows if not r.planted]
    assert planted and clean
    assert len(planted) * 5 == len(rows) * 2  # exactly the 40% fraction
    assert all(r.n_pii > 0 and r.n_email >= 1 for r in planted)
    assert all(r.n_pii == 0 for r in clean)
    for kind, _ in PII_PATTERNS:
        assert sum(r[f"n_{kind}"] for r in planted) > 0, kind
