"""PII redaction (X32) and benchmark decontamination (X31) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import contamination, pii


def test_redact_all_three_classes(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org ip 203.0.113.77 tel +44 123-4567")],
        ["id", "t"],
    )
    row = pii.redact_pii(df, "t").collect()[0]
    assert row["n_emails"] == 1 and row["n_ipv4"] == 1 and row["n_phones"] == 1
    assert row["clean_text"] == "mail <EMAIL> ip <IP> tel <PHONE>"


def test_redact_counts_on_original_text(spark):
    # two IPs, no email/phone — counts must reflect the ORIGINAL text
    df = spark.createDataFrame([(1, "10.0.0.1 and 10.0.0.2")], ["id", "t"])
    row = pii.redact_pii(df, "t").collect()[0]
    assert row["n_ipv4"] == 2 and row["n_emails"] == 0 and row["n_phones"] == 0
    assert row["clean_text"] == "<IP> and <IP>"


def test_redaction_order_email_dots_not_eaten_by_ip(spark):
    # an email whose domain has 4 dot-separated alnum runs must redact as
    # ONE email, not leave a half-redacted IP-like tail
    df = spark.createDataFrame([(1, "x a@b1.c2.d3.example.com y")], ["id", "t"])
    row = pii.redact_pii(df, "t").collect()[0]
    assert row["clean_text"] == "x <EMAIL> y"
    assert row["n_emails"] == 1 and row["n_ipv4"] == 0


def test_anonymize_ipv4_masks_host_octet(spark):
    df = spark.createDataFrame(
        [("203.0.113.77",), ("10.1.2.3",)], ["ip"]
    ).select(pii.anonymize_ipv4("ip").alias("a"))
    assert [r["a"] for r in df.collect()] == ["203.0.113.0", "10.1.2.0"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_flags_shared_ngram(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            (1, "x y alpha beta gamma delta epsilon z"),  # shares one 5-gram
            (2, "p q r s t u v w"),  # disjoint
        ],
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in contamination.contamination_check(train, bench, n=5).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (0, False)


def test_contamination_short_doc_whole_text_gram(spark):
    # docs shorter than n contribute their whole text as one gram — an
    # exact short-text duplicate across corpora is still caught
    bench = _docs(spark, [(100, "tiny doc")])
    train = _docs(spark, [(1, "tiny doc"), (2, "other doc")])
    out = {
        r["doc_id"]: r["contaminated"]
        for r in contamination.contamination_check(train, bench, n=5).collect()
    }
    assert out == {1: True, 2: False}


def test_contamination_hashed_equals_string_path(spark):
    rows = [(i, f"w{i} common run of words here plus w{i + 1} tail") for i in range(20)]
    bench = _docs(spark, rows[:3])
    train = _docs(spark, rows[3:])
    plain = contamination.contamination_check(train, bench, n=3, hashed=False)
    hashed = contamination.contamination_check(train, bench, n=3, hashed=True)
    key = ["doc_id", "n_grams", "n_overlap", "contaminated"]
    assert sorted(map(tuple, plain.select(key).collect())) == sorted(
        map(tuple, hashed.select(key).collect())
    )


def test_contamination_plan_broadcasts_bench(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    train = _docs(spark, [(1, "a b c d e g")])
    plan = contamination.contamination_check(train, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
