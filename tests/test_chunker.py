"""Native chunker == UDTF chunker; chunk geometry invariants."""

from __future__ import annotations

from sri_spark.plans.text_queries import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    text_chunk_windows,
)
from sri_spark.sources.testdata import load_table
from sri_spark.text.chunker import chunk_documents_udtf


def test_udtf_twin_matches_native(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    native = sorted(tuple(r) for r in text_chunk_windows(spark, sf_dir).collect())
    via_udtf = sorted(tuple(r) for r in chunk_documents_udtf(docs).collect())
    assert native == via_udtf and len(native) > 0


def test_chunk_geometry(spark, sf_dir):
    rows = text_chunk_windows(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["chunk_idx"])
        # contiguous indices from 0
        assert [r["chunk_idx"] for r in doc_rows] == list(range(len(doc_rows)))
        # chunk k covers tokens [k*STRIDE, k*STRIDE + SIZE) clipped to the
        # doc: n_tokens = min(SIZE, n_doc - k*STRIDE) for every chunk
        n_doc = (len(doc_rows) - 1) * CHUNK_STRIDE + doc_rows[-1]["n_tokens"]
        for r in doc_rows:
            want = min(CHUNK_SIZE, n_doc - r["chunk_idx"] * CHUNK_STRIDE)
            assert r["n_tokens"] == want, (r["chunk_idx"], n_doc)
        # consecutive chunks overlap by SIZE - STRIDE tokens
        if len(doc_rows) > 1:
            a = doc_rows[0]["chunk"].split()
            b = doc_rows[1]["chunk"].split()
            assert a[CHUNK_STRIDE:] == b[: CHUNK_SIZE - CHUNK_STRIDE]
