"""Product-quantization (PQ) approximate nearest neighbours — the third ANN
path next to IVF (similarity.ivf) and random-hyperplane LSH (similarity.lsh).

Index: split the D-dim vector into M contiguous subvectors; per subspace,
seeded KMeans learns K_SUB centroids (the codebook); each vector is encoded
as M small codes (the classic Jégou/Douze/Schmid PQ layout — public
"Product Quantization for Nearest Neighbor Search", TPAMI 2011). The
codebooks are index METADATA: M × K_SUB × (D/M) floats on the driver.

Query (ADC — asymmetric distance computation): precompute the M × K_SUB
table of partial dots between the query's subvectors and every centroid
(driver-side, metadata-sized), then score every encoded vector with M
array-literal lookups + a sum — a pure Column expression that fuses into
the scan of the (id, codes) table. Approximate top rerank_mult*k by ADC
cosine, then exact-cosine re-rank only those candidates.

Why this scales to 100 TB: the full-vector table is scanned ONCE at encode
time; after that the hot ranking path reads only (id, M-byte codes) —
a ~D*4/M-fold I/O reduction (64-dim float → 4 codes is 64×) — and the
exact re-rank touches rerank_mult*k rows. Both ranking and re-rank end in
TakeOrderedAndProject (true top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sri_spark.similarity.cosine import _as_double, _dot, _norm

M_SUBSPACES = 8
K_SUB = 16
TRAIN_SAMPLE = 4096  # codebook training sample (driver-side, bounded)


def _lloyd(pts, k: int, seed: int, iters: int = 20):
    """Seeded Lloyd's k-means on a small numpy array (training sample only).
    Deterministic: k-means++-style seeding from a fixed RandomState, empty
    clusters reseeded to the farthest point."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(pts)
    # k-means++ seeding
    centers = [pts[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [((pts - c) ** 2).sum(axis=1) for c in centers], axis=0
        )
        total = d2.sum()
        if total <= 0:
            centers.append(pts[rng.randint(n)])
            continue
        # clamp: fp rounding can leave cumsum[-1] < rand(), which would
        # index one past the end on an otherwise valid input
        idx = min(np.searchsorted(np.cumsum(d2 / total), rng.rand()), n - 1)
        centers.append(pts[idx])
    C = np.array(centers)
    for _ in range(iters):
        d2 = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            sel = pts[assign == j]
            if len(sel):
                C[j] = sel.mean(axis=0)
            else:
                C[j] = pts[d2.min(axis=1).argmax()]
    return C


def build_pq_codebooks(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = M_SUBSPACES,
    k_sub: int = K_SUB,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Fit the M per-subspace codebooks on a bounded training sample.

    Training on a sample is the published PQ practice (codebooks for
    billion-vector indexes are fit on ~100k-1M vectors): one deterministic
    TABLESAMPLE-style pull of TRAIN_SAMPLE rows (ordered by id hash so the
    sample is rerun-stable), then seeded Lloyd's per subspace driver-side —
    the collect is the training sample, bounded by TRAIN_SAMPLE regardless
    of corpus size, not a data-scale operation. Returns codebooks[m][k] =
    centroid subvector (index metadata: M × K_SUB × D/M floats)."""
    import numpy as np

    sample_rows = (
        df.select(_as_double(F.col(vec_col)).alias("__v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(TRAIN_SAMPLE)
        .collect()
    )
    if not sample_rows:
        raise ValueError("cannot train PQ codebooks on an empty input")
    pts = np.array([r["__v"] for r in sample_rows])
    dim = pts.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = np.ascontiguousarray(pts[:, j * d_sub : (j + 1) * d_sub])
        C = _lloyd(sub, k_sub, seed + j)
        books.append([[float(x) for x in c] for c in C])
    return books


def _sq_dist(sub, centroid: list[float]):
    """||sub - centroid||² as a Column (centroid is a literal)."""
    return F.aggregate(
        F.zip_with(
            sub,
            F.array(*[F.lit(v) for v in centroid]),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    codes_col: str = "__codes",
) -> DataFrame:
    """Attach the M-code column: per subspace, argmin centroid distance.
    Pure Column expressions (K_SUB distance terms per subspace — the
    standard O(D·K_SUB) PQ encode cost), no Python in the row path."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    vec = _as_double(F.col(vec_col))
    codes = []
    for j in range(m):
        sub = F.slice(vec, j * d_sub + 1, d_sub)
        dists = F.array(*[_sq_dist(sub, c) for c in codebooks[j]])
        # array_position is 1-based; the min element compares equal to itself
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return df.withColumn(codes_col, F.array(*codes))


def pq_topk(
    df: DataFrame,
    query_id: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    m: int = M_SUBSPACES,
    k_sub: int = K_SUB,
    seed: int = 42,
    rerank_mult: int = 16,
    scan_df: DataFrame | None = None,
    books: list[list[list[float]]] | None = None,
    encoded_df: DataFrame | None = None,
) -> DataFrame:
    """Top-k cosine neighbours of `query_id` via PQ/ADC + exact re-rank.

    `scan_df` restricts ADC scoring to a subset (e.g. the IVF-probed
    cells) while codebooks still train on the full `df` — the IVF-PQ
    composition every production ANN index (FAISS IVFPQ) uses: coarse
    quantizer picks the cells, PQ codes rank within them. `books` supplies
    prebuilt codebooks (build_pq_codebooks) so a serving loop trains once
    and amortizes across queries.

    `encoded_df` supplies rows that ALREADY carry the `__codes` column
    (pq_encode run once at index-build time, the production layout):
    encoding is the expensive per-row expression (M x K_SUB centroid
    distances + argmin — costly both to codegen and to execute), and it is
    query-independent, so a serving loop must never pay it per query. When
    given, `books` must be the codebooks that produced it."""
    if books is None:
        books = build_pq_codebooks(
            df, vec_col=vec_col, id_col=id_col, m=m, k_sub=k_sub, seed=seed
        )
    d_sub = len(books[0][0])
    if encoded_df is not None:
        encoded = encoded_df
    else:
        encoded = pq_encode(
            scan_df if scan_df is not None else df, books, vec_col=vec_col
        )

    # query subvectors: one driver-side row (index-metadata-sized)
    q = df.filter(F.col(id_col) == query_id).select(
        _as_double(F.col(vec_col)).alias("__q")
    )
    q_vec = [float(x) for x in q.first()[0]]
    q_norm = sum(x * x for x in q_vec) ** 0.5

    # ADC tables, driver-side: adc[j][c] = <q_j, centroid_{j,c}>; and the
    # centroid norms for the approximate vector norm. M*K_SUB floats each.
    adc: list[list[float]] = []
    cent_sq: list[list[float]] = []
    for j in range(m):
        qj = q_vec[j * d_sub : (j + 1) * d_sub]
        adc.append([sum(a * b for a, b in zip(qj, c)) for c in books[j]])
        cent_sq.append([sum(x * x for x in c) for c in books[j]])

    def lookup(table: list[list[float]]):
        # Σ_j table[j][codes[j]] as array-literal lookups (codes are 0-based)
        return sum(
            F.element_at(
                F.array(*[F.lit(v) for v in table[j]]),
                F.element_at("__codes", j + 1) + 1,
            )
            for j in range(m)
        )

    approx_cos = lookup(adc) / (F.sqrt(lookup(cent_sq)) * F.lit(q_norm))
    cand = (
        encoded.filter(F.col(id_col) != query_id)
        .select(id_col, vec_col, approx_cos.alias("__approx"))
        .orderBy(F.desc("__approx"), F.asc(id_col))
        .limit(rerank_mult * k)
    )

    # exact re-rank on the candidate set only (rerank_mult*k rows)
    qa = F.array(*[F.lit(v) for v in q_vec])
    exact = _dot(_as_double(F.col(vec_col)), qa) / (
        _norm(_as_double(F.col(vec_col))) * F.lit(q_norm)
    )
    return (
        cand.select(id_col, F.round(exact, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
