"""Similarity search over embedding columns (array<float>).

  * ``cosine_topk``        — brute-force exact top-k: broadcast the (small)
    query set against the corpus, cosine via one numpy einsum per Arrow
    batch, rank per query. The exactness baseline.
  * ``lsh_bucketed_topk``  — random-hyperplane LSH scale path: seeded
    hyperplanes → sign-bit bucket key → candidates share a bucket in ≥1
    table → exact cosine re-rank on the (much smaller) candidate set.
    Recall < 1.0 by design; tested against the brute-force oracle.
  * ``embedding_near_duplicates`` — pairs above a cosine threshold.

At 100 TB the corpus side streams (no shuffle: the query set/hyperplanes are
broadcast literals) and only candidates hit the re-rank join.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine(a, b) -> F.Column:
    """Expression-form cosine (higher-order functions). Kept for inline/
    declarative use; the ANN re-rank paths use the Arrow-batch numpy kernel
    (``_pair_cos``) — the HOF form runs interpreted and stops scaling with
    cores once candidates reach millions of pairs."""
    return (_dot(a, b) / (_norm(a) * _norm(b))).cast("double")


def _pair_cos(a, b, compute_dtype: str = "float64") -> F.Column:
    from slower_whisper_spark.functions.vectorized import make_cosine_pair

    return make_cosine_pair(compute_dtype)(a, b)


# queries larger than this fall back to the pair-wise cross-join path: the
# matrix kernel collects the query set to the driver (bounded collect — the
# same pattern as the stop-shingle set), and 10^4 × 64-dim float64 is ~5 MB
_QUERY_MATRIX_CAP = 10_000


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbours per query: (query_id, neighbor_id, cos, rank).

    queries is expected to be small (broadcast); corpus streams.

    Plan shape (guide §4.1/§2.3): the query set is collected once (bounded —
    ≤ ``_QUERY_MATRIX_CAP`` rows, the broadcast-dimension pattern) into a
    numpy matrix captured by a ``mapInPandas`` kernel over the CORPUS alone,
    so each corpus vector crosses the Arrow boundary exactly ONCE instead of
    once per query (the previous crossJoin shipped |corpus| × |queries|
    vector PAIRS through Python), and one dgemm per batch scores every
    query. The kernel also pre-reduces to an exact per-batch top-k per query
    under the same total order the window uses — (cos DESC NULLS LAST,
    neighbor_id ASC) — so the global window ranks batches × queries × k rows
    instead of |corpus| × |queries|. Zero-norm vectors keep the NULL-cos
    semantics of the pair kernel (sort last, never rank above a number).
    """
    q_probe = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    q_rows = q_probe.limit(_QUERY_MATRIX_CAP + 1).collect()
    if len(q_rows) > _QUERY_MATRIX_CAP:  # pragma: no cover - scale fallback
        return _cosine_topk_pairs(corpus, queries, id_col=id_col, vec_col=vec_col,
                                  query_id_col=query_id_col, k=k, exclude_self=exclude_self)

    qid_t = queries.schema[query_id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_t}, neighbor_id {nid_t}, cos double"
    narrow = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    spark = corpus.sparkSession
    if not q_rows:
        scored = spark.createDataFrame([], out_schema)
    else:
        import pandas as pd

        q_ids = [r["query_id"] for r in q_rows]
        Q = np.array([list(r["__qv"]) for r in q_rows], dtype=np.float64)  # (q, d)
        qn = np.linalg.norm(Q, axis=1)
        Qt = np.ascontiguousarray(Q.T)

        def part_topk(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                C = np.array(pdf["__cv"].tolist(), dtype=np.float64)  # (b, d)
                nids = pdf["neighbor_id"].to_numpy()
                num = C @ Qt
                den = np.linalg.norm(C, axis=1)[:, None] * qn[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = num / den
                out_q: list = []
                out_n: list = []
                out_c: list = []
                for j, qid in enumerate(q_ids):
                    col = cos[:, j]
                    mask = nids != qid if exclude_self else np.ones(len(col), bool)
                    finite = np.flatnonzero(mask & np.isfinite(col))
                    if len(finite):
                        sel = finite[np.lexsort((nids[finite], -col[finite]))][:k]
                        out_q += [qid] * len(sel)
                        out_n += list(nids[sel])
                        out_c += [float(x) for x in col[sel]]
                    nonf = np.flatnonzero(mask & ~np.isfinite(col))
                    if len(nonf):
                        sel = nonf[np.argsort(nids[nonf], kind="stable")][:k]
                        out_q += [qid] * len(sel)
                        out_n += list(nids[sel])
                        out_c += [None] * len(sel)
                yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cos": out_c})

        scored = narrow.mapInPandas(part_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _cosine_topk_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Pair-wise crossJoin form of ``cosine_topk``: the fallback when the
    query set exceeds the driver-matrix cap. Ships every (query, corpus)
    vector pair through the Arrow boundary — correct at any |queries|, but
    |queries|× the transfer of the matrix kernel."""
    # native vector type end-to-end: the numpy kernel upcasts to float64
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id", "neighbor_id", _pair_cos(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_planes, dim)).astype(float)


def _vec_dim(df: DataFrame, vec_col: str, dim: int | None) -> int:
    """Vector dimensionality: the explicit parameter when given, else one
    bounded ``first()`` probe (arrays carry no length in the schema). Callers
    on fixed-dim corpora should pass ``dim`` — it removes a driver round-trip
    per operator call."""
    if dim is not None:
        return dim
    return len(df.select(vec_col).first()[0])


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> F.Column:
    """Sign-bit bucket id for ONE table as a pure Column expression. Kept as
    the didactic/declarative form; the bucketed operators below use
    ``make_lsh_buckets`` instead — the HOF dot runs interpreted (memory-
    bound, poor core scaling) and the unrolled-arithmetic alternative
    explodes the Catalyst tree to ~10^5 nodes at 64 dims × many tables
    (driver OOM during codegen). One numpy matmul per Arrow batch computes
    ALL tables' buckets with a tiny plan."""
    vec = F.col(vec_col).cast("array<double>")
    bits = []
    for i, h in enumerate(planes):
        lit_h = F.array(*[F.lit(float(x)) for x in h])
        bits.append(F.when(_dot(vec, lit_h) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    dim: int | None = None,
    rerank_dtype: str = "float64",
) -> DataFrame:
    """ANN top-k: candidates share an LSH bucket in ≥1 of n_tables, exact
    cosine re-rank on candidates only.

    ``rerank_dtype="float32"`` runs the einsum kernel in single precision —
    half the bytes through the memory-bandwidth-bound re-rank (the measured
    limiter on wide candidate sets), at ~1e-7 relative score perturbation.
    Keep float64 wherever the top-k set is oracle-compared. Buckets come from one numpy-matmul
    Arrow UDF (all tables at once); the re-rank is the einsum kernel
    (``make_cosine_pair``) — Arrow-batched, never per-row Python.

    The multi-table candidate dedup runs over INT PAIRS ONLY — the bucket
    rows carry no vector payload, so the ``distinct()`` exchange shuffles
    ~16 bytes/row instead of the ~1 KB/row a 64-dim double array would cost
    (at 10^9 candidates that is ~50× shuffle volume). Vectors re-join after
    the dedup with the CORPUS STREAMING: the deduped candidate set is
    bounded by |queries| × candidates-per-query (the query side is small by
    this operator's contract), so it broadcasts — the corpus is never
    shuffled at any point in the plan (measured: the corpus-side sort-merge
    fallback cost 2× wall at 1M vectors / 2 cores)."""
    from slower_whisper_spark.functions.vectorized import make_lsh_buckets

    tables = _hyperplanes(_vec_dim(corpus, vec_col, dim), n_planes, n_tables, seed)
    bucket_udf = make_lsh_buckets(tables)

    def bucketed(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        # native (float32) vectors go to the UDF — numpy upcasts to float64
        # INSIDE the kernel (exact widening, identical results to a Spark
        # cast) so the Arrow transfer moves half the bytes
        return df.select(
            F.col(idc).alias(out_id),
            F.posexplode(bucket_udf(F.col(vec_col))).alias("table", "bucket"),
        )

    cb = bucketed(corpus, id_col, "neighbor_id")
    qb = bucketed(queries, query_id_col, "query_id")
    cand = cb.join(F.broadcast(qb), ["table", "bucket"]).select("query_id", "neighbor_id").distinct()
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    cvec = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    qvec = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    scored = (
        cvec.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _pair_cos(F.col("__qv"), F.col("__cv"), rerank_dtype).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ivf_centroids(dim: int, n_centroids: int, seed: int) -> np.ndarray:
    """Training-free IVF centroids: seeded gaussian directions, row-
    normalized. Production IVF trains kmeans centroids on a sample; the
    cell-routing plan (assign → probe → re-rank) is identical, so the
    centroid source is swappable without touching the operator."""
    rng = np.random.RandomState(seed)
    c = rng.normal(size=(n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
    dim: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k — the second scale path next to hyperplane LSH: corpus
    vectors route to their nearest centroid CELL (one cell each); each query
    probes its ``n_probe`` best cells; exact cosine re-ranks the union of
    probed cells. At 10^9+ vectors the corpus is effectively partitioned by
    cell (write it bucketed/partitioned by cell id for pruning); a probe
    touches n_probe/n_centroids of the data. Assignment is one numpy matmul
    per Arrow batch; recall grows with n_probe (tested vs brute force).

    ``centroids`` swaps in trained cells (see ``train_ivf_centroids`` for the
    sampled-kmeans path) — the routing plan is identical either way."""
    from slower_whisper_spark.functions.vectorized import make_ivf_assign

    if centroids is not None:
        cents = np.asarray(centroids, dtype=float)
        cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    else:
        cents = _ivf_centroids(_vec_dim(corpus, vec_col, dim), n_centroids, seed)
    assign1 = make_ivf_assign(cents, n_probe=1)
    assignp = make_ivf_assign(cents, n_probe=n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    cand = c.join(F.broadcast(q), "cell").select("query_id", "neighbor_id", "__qv", "__cv")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id", _pair_cos(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign_cells(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    dim: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, vec, cell) — the corpus with its IVF cell materialized, for
    ``df.write.partitionBy("cell")``: at 10^9+ vectors the probe path then
    reads ONLY the probed cells' files (hive partition pruning — proved by a
    PartitionFilters plan test), turning a full-corpus scan into
    n_probe/n_centroids of the data per query batch."""
    if centroids is not None:
        cents = np.asarray(centroids, dtype=float)
        cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    else:
        cents = _ivf_centroids(_vec_dim(df, vec_col, dim), n_centroids, seed)
    from slower_whisper_spark.functions.vectorized import make_ivf_assign

    assign1 = make_ivf_assign(cents, n_probe=1)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.element_at(assign1(F.col(vec_col)), 1).alias("cell"),
    )


def ivf_topk_partitioned(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    k: int = 10,
    n_probe: int = 4,
    n_centroids: int = 16,
    seed: int = 42,
    exclude_self: bool = True,
    dim: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF top-k over a cell-partitioned corpus (``ivf_assign_cells`` →
    ``write.partitionBy("cell")`` → read back): the probed cell set is
    collected from the (small, broadcast-regime) query side first and pushed
    into the corpus scan as ``cell IN (...)`` — a PARTITION filter on the
    hive layout, so unprobed cells' files are never opened. Same results as
    ``ivf_topk`` with the same centroids (asserted in tests); this variant
    exists for corpora big enough that reading 100% of the vectors to route
    them per query batch is the dominant cost."""
    if centroids is not None:
        cents = np.asarray(centroids, dtype=float)
        cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    else:
        cents = _ivf_centroids(_vec_dim(queries, vec_col, dim), n_centroids, seed)
    from slower_whisper_spark.functions.vectorized import make_ivf_assign

    assignp = make_ivf_assign(cents, n_probe=n_probe)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    # one tiny job on the query side yields the probe set — the partition
    # filter literal for the corpus scan
    probed = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    c = corpus.filter(F.col("cell").isin(probed)).select(
        F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cell"
    )
    cand = c.join(F.broadcast(q), "cell").select("query_id", "neighbor_id", "__qv", "__cv")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id", _pair_cos(F.col("__qv"), F.col("__cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def train_ivf_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 100_000,
    n_iter: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical-kmeans IVF centroids from a bounded sample.

    A ≤``sample_size`` uniform sample is collected to the driver (one count +
    one sample job — training-time cost, not query-time) and Lloyd-iterated
    in numpy: assign = argmax(X·Cᵀ), update = row-normalized mean, empty
    cells re-seed from the sample. Deterministic for a fixed seed. At 100 TB
    the sample stays 10^5 rows regardless of corpus size — training cost is
    O(sample · n_centroids · dim) on the driver, and the resulting centroids
    feed ``ivf_topk(..., centroids=...)`` unchanged. Trained cells track the
    corpus's real cluster structure, so probes recover far more true
    neighbours than seeded random directions at the same n_probe (asserted
    in tests vs the brute-force oracle)."""
    n = df.count()
    frac = min(1.0, sample_size / max(n, 1) * 1.2)  # slight over-sample, then cap
    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .sample(fraction=frac, seed=seed)
        .limit(sample_size)
        .collect()
    )
    X = np.array([r.v for r in rows], dtype=float)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    if len(C) < n_centroids:  # degenerate tiny sample: pad with random directions
        C = np.vstack([C, _ivf_centroids(X.shape[1], n_centroids - len(C), seed + 1)])
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                C[j] = m / max(np.linalg.norm(m), 1e-12)
            else:
                C[j] = X[rng.randint(len(X))]
    return C


# Fixed-point scale for exact-mode kmeans partials: normalized components
# are in [-1, 1], so quantized values fit 2^40 and int64 partial sums stay
# exact up to ~2^23 (≈8M) rows per cell per batch-tree — far beyond any
# per-cell test corpus. Drop to 2**32 if a cell can exceed that.
_KMEANS_FXP_SCALE = float(2**40)


def _kmeans_exact_partial(X: np.ndarray, C: np.ndarray):
    """One batch's mergeable partial in exact fixed-point arithmetic:
    (cells present, int64 counts, int64 per-dim quantized sums). Because
    int64 addition is associative, merging partials — in ANY batching or
    order — yields bit-identical sums to a single-pass computation, making
    the trained centroids a pure function of the vector multiset (the
    deterministic-KLL trick applied to kmeans state)."""
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(X @ C.T, axis=1)
    Q = np.round(X * _KMEANS_FXP_SCALE).astype(np.int64)
    cells, inv = np.unique(assign, return_inverse=True)
    sums = np.zeros((len(cells), X.shape[1]), dtype=np.int64)
    np.add.at(sums, inv, Q)
    counts = np.bincount(inv, minlength=len(cells)).astype(np.int64)
    return cells, counts, sums


def _kmeans_exact_update(
    sums: np.ndarray, counts: np.ndarray, d: int, n_centroids: int, seed: int
) -> np.ndarray:
    """Centroid update from merged exact partials: row-normalized mean
    (scale cancels in the normalization), empty cells re-seeded
    deterministically."""
    reseed = _ivf_centroids(d, n_centroids, seed + 1)
    C = np.empty((n_centroids, d), dtype=float)
    for j in range(n_centroids):
        if counts[j]:
            s = sums[j].astype(np.float64)
            C[j] = s / max(np.linalg.norm(s), 1e-12)
        else:
            C[j] = reseed[j]
    return C


def train_ivf_centroids_exact_local(
    X: np.ndarray, *, n_centroids: int = 16, n_iter: int = 10, seed: int = 42
) -> np.ndarray:
    """Single-process twin of ``train_ivf_centroids_distributed(exact=True)``
    over an in-memory matrix: same seeded init, same fixed-point partial
    math, same update — bit-identical centroids (asserted in tests). This is
    the oracle-replay path: a DuckDB-side checker fetches the same vectors
    and derives the exact centroid literals the cluster job trains."""
    X = np.asarray(X, dtype=np.float64)
    d = X.shape[1]
    C = _ivf_centroids(d, n_centroids, seed)
    for _ in range(n_iter):
        cells, counts_p, sums_p = _kmeans_exact_partial(X, C)
        sums = np.zeros((n_centroids, d), dtype=np.int64)
        counts = np.zeros(n_centroids, dtype=np.int64)
        sums[cells] += sums_p
        counts[cells] += counts_p
        C = _kmeans_exact_update(sums, counts, d, n_centroids, seed)
    return C


def train_ivf_centroids_distributed(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_iter: int = 10,
    seed: int = 42,
    dim: int | None = None,
    exact: bool = False,
) -> np.ndarray:
    """Spherical-kmeans IVF centroids with NO driver-side data collection —
    the cluster-scale twin of ``train_ivf_centroids`` (which stays the
    default: its ≤10⁵ sample transfer is one bounded job and trains in
    milliseconds).

    Exact distributed Lloyd, the KLL-manifest pattern applied to kmeans
    state: each iteration is ONE ``mapInPandas`` pass where every Arrow
    batch emits its mergeable partial — (cell, count, per-dimension vector
    sum) — against the broadcast current centroids; the ≤ batches ×
    n_centroids partial rows collect to the driver (independent of corpus
    size) and merge by summation, exactly associative/commutative like the
    KLL sketch merge. Update = row-normalized merged mean; empty cells
    re-seed from deterministic directions. Per-iteration cost: one scan, a
    BLAS argmax per batch, ~n_centroids·dim·n_batches doubles over the wire
    — no shuffle at all. Deterministic for a fixed seed (summation merged in
    sorted cell order on the driver; float batch-order variation stays
    below centroid-movement scale and the final assignment argmax is
    robust to it at test tolerance).

    ``exact=True`` switches the partials to fixed-point int64 sums
    (``_kmeans_exact_partial``): integer addition is associative, so the
    merged sums — and therefore the trained centroids — are bit-identical
    regardless of batch boundaries, partition count, or merge order: a pure
    function of the vector multiset. That is what lets a local single-pass
    replay (``train_ivf_centroids_exact_local``) reproduce the cluster-
    trained centroids exactly for oracle checking. Float mode (default)
    keeps full precision for production training, where 1e-16 batch-order
    wobble is irrelevant.

    Reference analog: the trained-vs-seeded routing recall contract of
    ``train_ivf_centroids`` (same assertion runs against both paths)."""
    d = dim or _vec_dim(df, vec_col, None)
    vecs = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    C = _ivf_centroids(d, n_centroids, seed)

    import pandas as pd

    sum_t = "array<long>" if exact else "array<double>"
    out_schema = f"cell int, n long, s {sum_t}"
    for _ in range(n_iter):
        Cb = C.copy()

        def partials(batches, _C=Cb, _exact=exact):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(pdf["v"].tolist(), dtype=np.float64)
                if _exact:
                    cells, counts, sums = _kmeans_exact_partial(X, _C)
                else:
                    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                    assign = np.argmax(X @ _C.T, axis=1)
                    cells, inv = np.unique(assign, return_inverse=True)
                    sums = np.zeros((len(cells), X.shape[1]))
                    np.add.at(sums, inv, X)
                    counts = np.bincount(inv, minlength=len(cells))
                yield pd.DataFrame(
                    {
                        "cell": cells.astype("int32"),
                        "n": counts.astype("int64"),
                        "s": [row.tolist() for row in sums],
                    }
                )

        rows = vecs.mapInPandas(partials, schema=out_schema).collect()
        if exact:
            sums = np.zeros((n_centroids, d), dtype=np.int64)
            counts = np.zeros(n_centroids, dtype=np.int64)
            for r in rows:  # int64 addition: order-independent
                sums[r["cell"]] += np.asarray(r["s"], dtype=np.int64)
                counts[r["cell"]] += r["n"]
            C = _kmeans_exact_update(sums, counts, d, n_centroids, seed)
            continue
        sums = np.zeros((n_centroids, d))
        counts = np.zeros(n_centroids)
        for r in sorted(rows, key=lambda r: r["cell"]):  # deterministic merge order
            sums[r["cell"]] += np.asarray(r["s"])
            counts[r["cell"]] += r["n"]
        reseed = _ivf_centroids(d, n_centroids, seed + 1)
        for j in range(n_centroids):
            if counts[j]:
                C[j] = sums[j] / max(np.linalg.norm(sums[j]), 1e-12)
            else:
                C[j] = reseed[j]
    return C


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 6,
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 200,
    persisted: list[DataFrame] | None = None,
    stats_out: dict | None = None,
    warn_on_drop: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cos ≥ threshold) via LSH candidate
    buckets + exact verification. As in ``lsh_bucketed_topk``, the
    multi-table dedup ``distinct()`` runs on the INT PAIR only — vectors
    re-join (by id, both sides corpus-resident) for the exact re-rank, so the
    dedup exchange never carries array payloads.

    ``max_bucket_size`` guards the bucket self-join against quadratic blowup
    on low-entropy corpora (near-identical vectors — EXACTLY the input a
    near-dup pass meets — land in one giant bucket): buckets larger than the
    cap are dropped from candidate generation, mirroring
    ``minhash_lsh_candidates`` — the same windowed count over the join keys,
    so the guarded bucket rows are ONE exchange that both (merge-hinted)
    self-join sides reuse: the Python-UDF bucket computation and its shuffle
    run once, with nothing persisted. Members of a dropped bucket can still
    pair through their OTHER n_tables-1 tables; pass ``None`` for the
    unguarded exact-candidate path at test scale.

    ``warn_on_drop`` (default True): when the cap is active, an eager probe
    counts the buckets the cap will drop and logs a WARNING if any — recall
    loss on near-identical-vector corpora must never be silent (ADVICE r4).
    The probe is one bounded extra job whose shuffle carries only DISTINCT
    (table, bucket) partials (map-side combine), far below the join itself;
    100-TB callers that track drops through ``stats_out`` dashboards can
    pass ``warn_on_drop=False`` to keep the default path job-free.

    ``stats_out``: pass a dict to capture the probe's exact count —
    filled with ``{"buckets_dropped": n}`` (implies the probe runs).

    ``persisted``: accepted for interface stability; the current plan
    persists nothing, so the list stays empty."""
    from slower_whisper_spark.functions.vectorized import make_lsh_buckets

    tables = _hyperplanes(_vec_dim(df, vec_col, dim), n_planes, n_tables, seed)
    bucket_udf = make_lsh_buckets(tables)
    b = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucket_udf(F.col(vec_col))).alias("table", "bucket"),
    )
    if max_bucket_size:
        # always-visible cap notice (no job): the exact dropped count needs
        # an extra aggregation, so it is opt-in via stats_out — but the cap
        # being ACTIVE is never silent, and the driver-checked oracle replays
        # the cap so its effect is correctness-visible
        _log.info(
            "embedding_near_duplicates: max_bucket_size=%d active — buckets "
            "above the cap are excluded from candidate generation",
            max_bucket_size,
        )
        if warn_on_drop or stats_out is not None:
            n_big = (
                b.groupBy("table", "bucket")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > max_bucket_size)
                .count()
            )
            if stats_out is not None:
                stats_out["buckets_dropped"] = int(n_big)
            if n_big:
                _log.warning(
                    "embedding_near_duplicates: dropping %d bucket(s) larger "
                    "than max_bucket_size=%d from candidate generation — "
                    "members may still pair via their other %d table(s)",
                    n_big,
                    max_bucket_size,
                    n_tables - 1,
                )
        w = Window.partitionBy("table", "bucket")
        b = (
            b.withColumn("__bn", F.count(F.lit(1)).over(w))
            .filter(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    # force sort-merge on the self-join: both sides are the identical
    # (table, bucket)-partitioned subtree, so SMJ reuses ONE exchange and the
    # Python-UDF bucket computation runs once — AQE's default would instead
    # broadcast one side, recomputing that whole subtree as the build
    b = b.hint("merge")
    cand = (
        b.alias("a")
        .join(
            b.alias("c"),
            (F.col("a.table") == F.col("c.table"))
            & (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.id") < F.col("c.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"))
        .distinct()
    )
    vec = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__v"))
    return (
        cand.join(vec.select(F.col("id").alias("id_a"), F.col("__v").alias("__va")), "id_a")
        .join(vec.select(F.col("id").alias("id_b"), F.col("__v").alias("__vb")), "id_b")
        .select("id_a", "id_b", _pair_cos(F.col("__va"), F.col("__vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
