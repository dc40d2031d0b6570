"""Product-quantization ANN: encode contract, determinism, recall bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from sri_spark.similarity.cosine import cosine_topk
from sri_spark.similarity.pq import (
    K_SUB,
    M_SUBSPACES,
    build_pq_codebooks,
    pq_encode,
    pq_topk,
)
from sri_spark.sources.testdata import load_table


def test_codebooks_shape_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = build_pq_codebooks(emb)
    b2 = build_pq_codebooks(emb)
    assert len(b1) == M_SUBSPACES
    assert all(len(book) == K_SUB for book in b1)
    dim = len(emb.select("embedding").first()[0])
    assert all(len(c) == dim // M_SUBSPACES for book in b1 for c in book)
    assert b1 == b2  # seeded sample + seeded Lloyd's => bit-identical


def test_encode_assigns_nearest_centroid(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    books = build_pq_codebooks(emb)
    rows = pq_encode(emb, books).select("embedding", "__codes").collect()
    d_sub = len(books[0][0])
    for r in rows:
        vec = [float(x) for x in r["embedding"]]
        for j, code in enumerate(r["__codes"]):
            assert 0 <= code < K_SUB
            sub = vec[j * d_sub : (j + 1) * d_sub]
            dists = [
                sum((a - b) ** 2 for a, b in zip(sub, c)) for c in books[j]
            ]
            assert dists[code] == min(dists)


def test_pq_recall_against_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["vec_id"] for r in pq_topk(emb, query_id=0, k=10).collect()}
    truth = {r["vec_id"] for r in cosine_topk(emb, query_id=0, k=10).collect()}
    assert len(got) == 10
    assert len(got & truth) >= 5  # same bound as the catalog contract


def test_pq_exact_rerank_cosines_are_exact(spark, sf_dir):
    """The returned cosine values must equal the brute-force cosine for the
    same ids (PQ approximates the CANDIDATE CHOICE, never the score)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pq_rows = {r["vec_id"]: r["cosine"] for r in pq_topk(emb, query_id=0, k=10).collect()}
    brute = {
        r["vec_id"]: r["cosine"]
        for r in cosine_topk(emb, query_id=0, k=len(pq_rows) * 50).collect()
    }
    for vid, cos in pq_rows.items():
        assert abs(brute[vid] - cos) < 1e-6


def test_pq_query_excluded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assert (
        pq_topk(emb, query_id=7, k=10).filter(F.col("vec_id") == 7).count() == 0
    )


def test_prebuilt_codes_path_matches_inline_encode(spark, sf_dir):
    """pq_topk(encoded_df=...) — the serve-from-stored-codes layout — must
    return exactly what the inline-encode path returns for the same
    codebooks (encoding is query-independent, so precomputing it cannot
    change any result)."""
    from sri_spark.similarity.pq import build_pq_codebooks, pq_encode, pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = build_pq_codebooks(emb)
    codes = pq_encode(emb, books).persist()
    try:
        for qid in (0, 7):
            inline = [
                (r["vec_id"], r["cosine"])
                for r in pq_topk(emb, qid, k=5, books=books).collect()
            ]
            stored = [
                (r["vec_id"], r["cosine"])
                for r in pq_topk(
                    emb, qid, k=5, books=books, encoded_df=codes
                ).collect()
            ]
            assert inline == stored, qid
    finally:
        codes.unpersist()
