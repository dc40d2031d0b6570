"""IVF ANN: output is valid and recall against brute force is reasonable."""

from __future__ import annotations

from sri_spark.similarity.cosine import cosine_topk
from sri_spark.similarity.ivf import ivf_topk
from sri_spark.sources.testdata import load_table


def test_ivf_topk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    truth = [r["vec_id"] for r in cosine_topk(emb, query_id=0, k=10).collect()]
    approx = ivf_topk(emb, query_id=0, k=10, n_lists=8, n_probe=4).collect()
    ids = [r["vec_id"] for r in approx]
    assert len(ids) == 10
    assert len(set(ids)) == 10
    # probing half the cells should recover most of the true top-10
    recall = len(set(ids) & set(truth)) / 10
    assert recall >= 0.5, f"recall {recall} too low: {ids} vs {truth}"
    # scores must be genuine cosines (bounded, sorted desc)
    scores = [r["cosine"] for r in approx]
    assert all(-1.0 <= s <= 1.0 for s in scores)
    assert scores == sorted(scores, reverse=True)
