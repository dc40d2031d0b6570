"""IVF + multi-probe LSH ANN: output validity, recall vs brute force,
build/probe split equivalence."""

from __future__ import annotations

from sri_spark.similarity.cosine import cosine_topk
from sri_spark.similarity.ivf import build_ivf_index, ivf_probe, ivf_topk
from sri_spark.similarity.lsh import rp_ann_topk
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


def test_ivf_probe_matches_inline_build(spark, sf_dir):
    """ivf_topk (build-per-query) and build_ivf_index + ivf_probe (the
    amortized serving shape) must return identical results for the same
    seed/params."""
    emb = load_table(spark, sf_dir, "embeddings")
    inline = ivf_topk(emb, query_id=3, k=10, n_lists=8, n_probe=4).collect()
    model, indexed = build_ivf_index(emb, n_lists=8)
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    split = ivf_probe(indexed, centroids, 3, k=10, n_probe=4).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in split]


def test_lsh_multiprobe_recall_dominates_single(spark, sf_dir):
    """Hamming-1 multi-probe must recover at least as much of the true
    top-10 as single-bucket probing, and materially more overall across a
    small query panel (the whole point of the knob)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 7, 19]
    single_hits = multi_hits = 0
    for qid in qids:
        truth = {r["vec_id"] for r in cosine_topk(emb, qid, k=10).collect()}
        s = {r["vec_id"] for r in rp_ann_topk(emb, qid, k=10, hamming=0).collect()}
        m = {r["vec_id"] for r in rp_ann_topk(emb, qid, k=10, hamming=1).collect()}
        # single-probe candidates are a subset of multi-probe candidates,
        # so per-query recall can only go up
        assert len(s & truth) <= len(m & truth)
        single_hits += len(s & truth)
        multi_hits += len(m & truth)
    assert multi_hits > single_hits, (
        f"multi-probe gained nothing: {multi_hits} vs {single_hits}"
    )
