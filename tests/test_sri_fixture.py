"""The SRI CSV fixture generator itself — chunked and unchunked writes must
agree on shape, and coverage rows (unparseable date, non-numeric value,
duplicate pair, fan-out code, trailing-space key) must appear exactly once
regardless of chunking (round-7 ADVICE: every chunk re-injected them and a
sub-31-row final chunk crashed with IndexError)."""

from __future__ import annotations

import csv

from tests.sri_fixture import generate_sri_rows, write_sri_csv


def _read(path):
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def _coverage_counts(rows):
    return {
        "bad_date": sum(1 for r in rows if r[11] == "not-a-date"),
        "bad_number": sum(1 for r in rows if r[10] == "N/D"),
        "fanout_code": sum(1 for r in rows if r[1] == "7777"),
        "trailing_space": sum(1 for r in rows if r[2] == "COMPRA LOCAL "),
    }


def test_chunked_write_handles_small_final_chunk(tmp_path):
    # n=100, chunk_rows=40 → final chunk has 20 rows (< the coverage index
    # range); this crashed with IndexError before the round-8 fix
    p = str(tmp_path / "small_tail.csv")
    write_sri_csv(p, n=100, chunk_rows=40)
    _, rows = _read(p)
    assert len(rows) == 100


def test_chunked_write_injects_coverage_rows_exactly_once(tmp_path):
    p_chunked = str(tmp_path / "chunked.csv")
    p_plain = str(tmp_path / "plain.csv")
    write_sri_csv(p_chunked, n=200, chunk_rows=50)
    write_sri_csv(p_plain, n=200)
    _, chunked = _read(p_chunked)
    _, plain = _read(p_plain)
    assert len(chunked) == len(plain) == 200
    want = {"bad_date": 1, "bad_number": 1, "fanout_code": 2, "trailing_space": 1}
    assert _coverage_counts(plain) == want
    assert _coverage_counts(chunked) == want


def test_tiny_batch_skips_coverage_rows():
    # coverage rows need indices up to 30 — a 20-row batch must not crash
    # and must carry no injected markers
    rows = generate_sri_rows(n=20, seed=1)
    assert len(rows) == 20
    strs = [[str(c) for c in r] for r in rows]
    assert _coverage_counts(strs) == {
        "bad_date": 0,
        "bad_number": 0,
        "fanout_code": 0,
        "trailing_space": 0,
    }
