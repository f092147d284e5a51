"""Property tests for the non-oracled pipeline paths (SURVEY §7.4
risk 4): the approximate dedup/ANN operators must recover the planted
ground truth that the exact baselines establish on the fixtures."""

from __future__ import annotations

import pytest

from database_join_spark.queries import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


@pytest.fixture(scope="module")
def truth_pairs(spark):
    """Exact O(n²) Jaccard pairs — the ground truth for both
    approximate paths."""
    return _pairs(REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_DIR))


def test_minhash_recall_and_precision(spark, truth_pairs):
    """MinHash-LSH + exact verify must equal the exact baseline:
    verification kills false positives (precision 1.0 by construction)
    and 8 bands × 4 rows catch J≥0.6 pairs w.h.p. (recall 1.0 on the
    planted fixtures)."""
    got = _pairs(REGISTRY["dedup_minhash"].fn(spark, SF_DIR))
    assert truth_pairs, "fixture should contain planted near-dup pairs"
    assert got - truth_pairs == set(), "verified candidates must be real"
    recall = len(got & truth_pairs) / len(truth_pairs)
    assert recall >= 0.9, f"minhash recall {recall} below floor"


def test_simhash_finds_planted_dups(spark, truth_pairs):
    """SimHash hamming≤12 with 4-chunk pigeonhole blocking must
    recover most planted near-dup pairs. (Not all: simhash can place
    token-multiset changes far apart — truth pairs at hamming 31/53
    are invisible to ANY simhash scheme at this threshold.)"""
    got = _pairs(REGISTRY["dedup_simhash"].fn(spark, SF_DIR))
    recall = len(got & truth_pairs) / len(truth_pairs)
    assert recall >= 0.7, f"simhash recall {recall} below floor"


@pytest.mark.parametrize(
    "ann,floor", [("simsearch_lsh", 0.3), ("simsearch_ivf", 0.3)]
)
def test_ann_topk_recall(spark, ann, floor):
    """Both ANN paths must overlap the exact top-k above a floor."""
    exact = REGISTRY["simsearch_embed"].fn(spark, SF_DIR).collect()
    approx = REGISTRY[ann].fn(spark, SF_DIR).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= floor, f"{ann} recall@5 {recall} below floor"


def test_multimodal_schema_and_batching(spark):
    """The Arrow mapInPandas plumbing: fixed schema, one output row
    per input doc, deterministic features."""
    df = REGISTRY["multimodal_features"].fn(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "modality", "n_bytes", "checksum", "head_hex",
    ]
    rows = df.collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == docs
    assert all(r["modality"] == "text-blob" for r in rows[:10])


def test_decode_stub_raises():
    """The image decode stub must fail loudly, not silently fake."""
    from database_join_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")
