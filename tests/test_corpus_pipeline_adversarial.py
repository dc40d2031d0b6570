"""Adversarial-corpus runs of the COMPOSED pipeline (depth twin of the
catalog-level degenerate sweep): `run_corpus_pipeline` must survive and
stay structurally consistent on corpora the sf fixtures never produce —
zero rows, one row, 100% duplicates, empty/punctuation-only/CJK text
(ANSI-mode division hazards in the quality/language scorers), and a
single document larger than the whole per-language token budget.

The catalog sweep (tests/test_degenerate_catalog_sweep.py) covers each
stage's QUERY on constant input; this covers the stage COMPOSITION on
hostile input, where one stage's degenerate output is the next stage's
input. Expected-degenerate output (0 exported docs) is fine; an exception
or a broken stage chain is the only failure.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sri_spark.etl.corpus_pipeline import run_corpus_pipeline
from sri_spark.plans.training_queries import BENCH_PCT, BENCH_SALT

STAGE_ORDER = [
    "score",
    "lang_id",
    "quality_gate",
    "exact_dedup",
    "near_dup_keep_best",
    "decontaminate",
    "token_budget",
    "pack",
    "shard_export",
]

# 60 stopword-heavy English tokens, no punctuation/digits: quality_score
# = 0.5*min(60/100,1) + 0.3 + 0.2 = 0.8 >= QUALITY_FLOOR, lang_id = en
GOOD_EN = " ".join(["the quick brown fox and the lazy dog of the old town"] * 5)


def _bench_bucket(doc_id: int) -> int:
    """Python mirror of the pipeline's bench-slice hash
    (functions/hashing.md5_int on BENCH_SALT || doc_id, mod 100)."""
    h = hashlib.md5(f"{BENCH_SALT}{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 100


def _train_ids(start: int, n: int) -> list[int]:
    """First `n` doc_ids >= start that fall OUTSIDE the bench slice, so
    expected survivor counts are deterministic."""
    out, i = [], start
    while len(out) < n:
        if _bench_bucket(i) >= BENCH_PCT:
            out.append(i)
        i += 1
    return out


def _write_docs(tmp_path, rows: list[tuple[int, str]]) -> str:
    """Write a documents.parquet with the fixture schema; returns sf_dir."""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["adv"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _assert_chain(result: dict) -> dict:
    """Structural invariants every run must satisfy, hostile or not."""
    stages = {s["stage"]: s for s in result["stages"]}
    assert [s["stage"] for s in result["stages"]] == STAGE_ORDER
    for prev, nxt in zip(result["stages"], result["stages"][1:]):
        assert nxt["n_in"] == prev["n_out"], (prev, nxt)
    assert stages["score"]["n_in"] == stages["score"]["n_out"]  # 1:1 enrich
    for name in STAGE_ORDER[1:7]:  # every filter stage only removes rows
        assert stages[name]["n_out"] <= stages[name]["n_in"], name
    assert stages["pack"]["n_out"] == stages["pack"]["n_in"]  # 1:1 on rows
    assert stages["shard_export"]["n_out"] == stages["shard_export"]["n_in"]
    assert result["packed_sequences"] >= 0
    return stages


def test_zero_row_corpus(spark, tmp_path):
    sf = _write_docs(tmp_path, [])
    stages = _assert_chain(run_corpus_pipeline(spark, sf, str(tmp_path / "out")))
    assert stages["score"]["n_out"] == 0
    assert stages["shard_export"]["n_out"] == 0


def test_single_good_doc_survives_to_export(spark, tmp_path):
    (doc_id,) = _train_ids(0, 1)  # outside the bench slice: must survive
    sf = _write_docs(tmp_path, [(doc_id, GOOD_EN)])
    stages = _assert_chain(run_corpus_pipeline(spark, sf, str(tmp_path / "out")))
    assert stages["shard_export"]["n_out"] == 1
    assert stages["near_dup_keep_best"]["n_out"] == 1  # a singleton is kept


def test_all_duplicates_collapse_to_one(spark, tmp_path):
    ids = _train_ids(0, 60)
    sf = _write_docs(tmp_path, [(i, GOOD_EN) for i in ids])
    stages = _assert_chain(run_corpus_pipeline(spark, sf, str(tmp_path / "out")))
    assert stages["exact_dedup"]["n_out"] == 1
    # identical texts are one near-dup cluster; its keeper is the survivor
    assert stages["shard_export"]["n_out"] == 1


def test_hostile_text_is_ansi_safe(spark, tmp_path):
    """Empty/whitespace/punctuation/digit-only/CJK texts hit every
    data-derived denominator in the scorers (token count 0, length 0)
    under the session's ANSI mode — must filter, never throw."""
    ids = _train_ids(0, 6)
    rows = [
        (ids[0], ""),
        (ids[1], "   \t  \n "),
        (ids[2], "!!! ??? ... ;;; ---"),
        (ids[3], "123 456 789 000 111"),
        (ids[4], "今天天气很好" * 10),
        (ids[5], GOOD_EN),
    ]
    sf = _write_docs(tmp_path, rows)
    stages = _assert_chain(run_corpus_pipeline(spark, sf, str(tmp_path / "out")))
    assert stages["score"]["n_out"] == 6  # scoring itself never drops
    assert stages["shard_export"]["n_out"] == 1  # only the good doc exports


def test_doc_larger_than_token_budget_yields_empty_tail(spark, tmp_path):
    """A single doc whose token count exceeds TOKEN_BUDGET_PER_LANG: its
    own cumulative sum is already over budget, so selection is empty and
    the pack/export tail must flow 0 rows."""
    from sri_spark.plans.curation_queries import TOKEN_BUDGET_PER_LANG

    giant = " ".join(["the and of to in was for on with is"] * (
        TOKEN_BUDGET_PER_LANG // 10 + 1
    ))
    (doc_id,) = _train_ids(0, 1)
    sf = _write_docs(tmp_path, [(doc_id, giant)])
    stages = _assert_chain(run_corpus_pipeline(spark, sf, str(tmp_path / "out")))
    assert stages["token_budget"]["n_in"] == 1
    assert stages["token_budget"]["n_out"] == 0
    assert stages["shard_export"]["n_out"] == 0


def test_stage_counts_deterministic_across_runs(spark, tmp_path):
    ids = _train_ids(0, 20)
    rows = [(i, f"{GOOD_EN} variant {chr(97 + k % 26)}") for k, i in enumerate(ids)]
    sf = _write_docs(tmp_path, rows)
    r1 = run_corpus_pipeline(spark, sf, str(tmp_path / "out1"))
    r2 = run_corpus_pipeline(spark, sf, str(tmp_path / "out2"))
    strip = lambda r: [
        {k: v for k, v in s.items() if k != "sec"} for s in r["stages"]
    ]
    assert strip(r1) == strip(r2)
    assert r1["packed_sequences"] == r2["packed_sequences"]
