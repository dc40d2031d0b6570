"""Python-UDTF document chunker — the row-generating Python escape hatch.

The NATIVE formulation (plans/text_queries.py::text_chunk_windows —
sequence + slice + explode, fuses into the scan, no Python) is the one to
use: this UDTF twin exists for the cases that genuinely need per-row
Python in a 1→N operator (a real tokenizer library, structure-aware
splitting), and as the engine's demonstration of the Spark 4 UDTF API —
the table-function analogue of the scalar-UDF "last resort" rule. The
pytest proves both produce identical chunks on the same inputs.

UDTFs run row-at-a-time in a Python worker (no Arrow batching as of
Spark 4.1): expect order-of-magnitude slower than the native plan — fine
for a structure-aware splitter dominated by library time, wrong for plain
token windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@udtf(returnType="chunk_idx: long, chunk: string, n_tokens: long")
class ChunkWindows:
    """Emit overlapping token windows for one document's text."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        toks = [t for t in (text or "").lower().strip().split() if t]
        if not toks:
            return
        i = 0
        idx = 0
        while i < len(toks):
            window = toks[i : i + CHUNK_SIZE]
            yield idx, " ".join(window), len(window)
            i += CHUNK_STRIDE
            idx += 1


def chunk_documents_udtf(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk, n_tokens) via the UDTF, preserving the
    carried doc_id through a lateral join."""
    docs.sparkSession.udtf.register("chunk_windows", ChunkWindows)
    docs.createOrReplaceTempView("__chunk_in")
    return docs.sparkSession.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
        FROM __chunk_in d, LATERAL chunk_windows(d.text) c
        """
    )
