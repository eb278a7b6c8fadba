"""Unit tests for the training-data function library (functions/)."""

import pytest
from pyspark.sql import Row, functions as F

from openlogreplicator_spark.functions import dedup as D
from openlogreplicator_spark.functions import similarity as S
from openlogreplicator_spark.functions import textstats as T
from openlogreplicator_spark.functions import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_partitions_docs(spark, docs):
    total = docs.count()
    groups = D.exact_dedup(docs)
    assert groups.agg(F.sum("n_dupes")).collect()[0][0] == total
    # keep_id unique
    assert groups.select("keep_id").distinct().count() == groups.count()


def test_lsh_candidates_cover_high_jaccard_pairs(spark, docs):
    """LSH recall: every pair with very high Jaccard must be an LSH candidate
    (k=32, r=4 => collision prob at J=0.9 is 1-(1-0.9^4)^8 ~ 0.9998)."""
    sample = docs.where(F.col("doc_id") < 200)
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(sample, threshold_pct=90).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in D.lsh_candidate_pairs(sample).collect()
    }
    missed = exact - cand
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_identical_docs_equal(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta"),
         Row(doc_id=2, text="alpha beta gamma delta"),
         Row(doc_id=3, text="completely different words here")]
    )
    out = {r["doc_id"]: r["simhash"] for r in D.simhash(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_minhash_signature_shape(spark, docs):
    sig = D.minhash_signatures(docs.where(F.col("doc_id") < 10), k=16)
    rows = sig.collect()
    assert len(rows) == 10 * 16
    assert all(0 <= r["minhash"] for r in rows)


def test_topk_dot_matches_cosine_order_for_unit_queries(spark, emb):
    """Quantized-dot and cosine top-1 should usually agree on normalized-ish
    synthetic vectors; sanity: both return k rows per query, ranks 1..k."""
    q = emb.where(F.col("vec_id") < 3)
    for fn in (S.topk_dot_quantized, S.topk_cosine):
        out = fn(emb, q, k=4).collect()
        assert len(out) == 3 * 4
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["rnk"])
        assert all(sorted(v) == [1, 2, 3, 4] for v in by_q.values())


def test_ivf_is_pruned_brute_force(spark, emb):
    """Fitted IVF (computed cells, n_probe fan-out): every hit carries the
    exact brute-force quantized dot — pruning changes candidates, not
    scores. Cell-fit determinism + recall live in test_round2_features."""
    out = S.topk_ivf(emb, emb.where(F.col("vec_id") < 3), k=3).toPandas()
    bf = S.topk_dot_quantized(
        emb, emb.where(F.col("vec_id") < 3), k=10**9
    ).toPandas()
    merged = out.merge(bf, on=["query_id", "neighbor_id"],
                       suffixes=("_ivf", "_bf"))
    assert len(merged) == len(out) > 0
    assert (merged["dot_ivf"] == merged["dot_bf"]).all()


def test_quality_stats_and_tokens(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="The quick brown fox. It runs!")])
    q = T.quality_stats(df).collect()[0]
    assert q["n_tokens"] == 6
    assert q["n_punct"] == 2
    tc = T.token_count(df).collect()[0]
    assert tc["n_ws_tokens"] == 6
    # words: the,quick,brown,fox,it,runs + '.' + '!' = 8 BPE-ish tokens
    assert tc["n_bpe_tokens"] == 8


def test_lang_id_markers(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="the cat and the dog of the house"),
        Row(doc_id=2, text="der hund und die katze und das haus"),
        Row(doc_id=3, text="zzz qqq www"),
    ])
    out = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_fingerprint_ignores_whitespace_case(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="Hello   World"),
        Row(doc_id=2, text="hello world"),
    ])
    fps = {r["fp"] for r in T.fingerprint(df).collect()}
    assert len(fps) == 1


def test_winnow_shared_fingerprints_for_overlapping_docs(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="xx the quick brown fox jumps over the lazy dog yy"),
    ])
    out = T.winnow_fingerprints(df)
    f1 = {r["fp_hash"] for r in out.where(F.col("doc_id") == 1).collect()}
    f2 = {r["fp_hash"] for r in out.where(F.col("doc_id") == 2).collect()}
    assert len(f1 & f2) >= len(f1) // 2


def test_multimodal_meta_plumbing(spark, docs):
    media = M.attach_binary_payload(docs.limit(20))
    meta = M.extract_media_meta(media).collect()
    assert len(meta) == 20
    for r in meta:
        assert r["media_type"] == "image/fake"
        assert r["width"] == r["n_bytes"] % 640
        assert r["height"] == r["n_bytes"] % 480
    plan = M.frame_sample_plan(media, every_n=7)
    assert plan.count() > 0


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        M.real_decode(b"bytes")
