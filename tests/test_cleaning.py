"""Corpus-cleaning ops: PII redaction, repetition stats, decontamination."""

from openlogreplicator_spark.functions.cleaning import (
    contamination_stats,
    redact_pii,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_classes_and_order(spark):
    docs = _docs(spark, [
        (1, "mail me at Bob.Smith+x@corp.example.com or call +1 555-123-4567"),
        (2, "ssn 123-45-6789 and server 10.0.0.1 up"),
        (3, "totally clean text here"),
        (4, "two mails a@b.co c@d.org one ip 192.168.1.255"),
    ])
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}

    r = out[1]
    assert r["n_email"] == 1 and r["n_phone"] == 1
    assert "<EMAIL>" in r["clean_text"] and "<PHONE>" in r["clean_text"]
    assert "corp.example.com" not in r["clean_text"]
    assert "555" not in r["clean_text"]

    r = out[2]
    # the SSN is counted as SSN (pass order), never double-counted as phone
    assert r["n_ssn"] == 1 and r["n_phone"] == 0 and r["n_ip"] == 1
    assert r["clean_text"] == "ssn <SSN> and server <IP> up"

    assert out[3]["n_pii"] == 0
    assert out[3]["clean_text"] == "totally clean text here"

    r = out[4]
    assert r["n_email"] == 2 and r["n_ip"] == 1
    assert r["n_pii"] == 3


def test_repetition_stats_counts_multiplicity(spark):
    docs = _docs(spark, [
        # "a b c" x3 -> grams: 7 total, top gram "a b c" occurs 3 times
        (1, "a b c a b c a b c"),
        (2, "w x y z"),  # all distinct
    ])
    out = {r["doc_id"]: r for r in repetition_stats(docs, n=3).collect()}
    assert out[1]["n_grams"] == 7
    assert out[1]["top_gram_count"] == 3
    assert out[1]["n_distinct"] == 3  # 'a b c', 'b c a', 'c a b'
    assert out[2]["n_grams"] == 2 and out[2]["top_gram_count"] == 1


def test_contamination_stats_flags_overlap(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "an entirely different sentence with no overlap at all"),
        (3, "quick brown fox phrases appear here too"),
    ])
    bench = _docs(spark, [(100, "the quick brown fox ran")])
    out = {r["doc_id"]: r for r in contamination_stats(docs, bench).collect()}
    # doc 1 shares 'the quick brown' and 'quick brown fox'
    assert out[1]["n_contaminated"] == 2
    assert out[1]["n_shingles"] == 7
    assert out[2]["n_contaminated"] == 0
    assert out[3]["n_contaminated"] == 1  # 'quick brown fox'


def test_redact_pii_is_map_only(spark):
    """Plan shape: no exchange anywhere — the scrub must stay a scan."""
    docs = _docs(spark, [(1, "x")])
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_asof_join_carries_whole_right_row(spark):
    """A matched right row's legitimate NULL fields must survive — the
    carry is one struct per row, never per-column (per-column
    last(ignorenulls) would stitch fields from different right rows)."""
    import datetime as dt

    from openlogreplicator_spark.functions.temporal import asof_join

    base = dt.datetime(2026, 8, 17, 10, 0, 0)
    right = spark.createDataFrame(
        [("u", base, 1, 2), ("u", base + dt.timedelta(seconds=10), 3, None)],
        "user_id string, ts timestamp, a long, b long")
    left = spark.createDataFrame(
        [("u", base + dt.timedelta(seconds=20), "L1"),
         ("u", base + dt.timedelta(seconds=5), "L0"),
         ("v", base, "NOMATCH")],
        "user_id string, ts timestamp, tag string")
    out = {r["tag"]: r for r in
           asof_join(left, right, key="user_id").collect()}
    # L1 matches the t+10 right row: a=3, b=NULL (NOT b=2 from t+0)
    assert out["L1"]["a"] == 3 and out["L1"]["b"] is None
    # L0 matches the t+0 row
    assert out["L0"]["a"] == 1 and out["L0"]["b"] == 2
    # no prior right row -> all-null right fields
    assert out["NOMATCH"]["a"] is None and out["NOMATCH"]["b"] is None
