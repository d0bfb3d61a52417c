"""Similarity search over embedding columns (array<float>).

Not in the reference (Gigablast has no vector search) — added as the
training-data-pipeline extension mandated for this rebuild: brute-force
cosine top-k as the exact baseline, plus an LSH-bucketed variant
(random-hyperplane signs) as the 100 TB scale path: candidates are
generated per bucket, scored exactly, so recall degrades gracefully with
fewer probed buckets instead of cost growing with corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product with zip_with + aggregate (JVM-side, no UDF).
    Fold order is left-to-right — matches DuckDB list_reduce for oracle
    parity on float accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    keep_vec: bool = False,
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrderedAndProject (no shuffle of
    the full table — the per-partition heap merges at the driver, the same
    physical shape as the BM25 top-k).

    ``keep_vec=True`` carries the (casted) embedding through the top-k so
    re-rank consumers (MMR) get the k vectors for free — k*dim values
    through the heap instead of a SECOND full scan + join to recover
    them."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cast_vec = F.col(vec_col).cast("array<double>")
    cols = [
        F.col(id_col),
        F.round(cosine_col(cast_vec, q), 4).alias("cosine"),
    ]
    if keep_vec:
        cols.append(cast_vec.alias(vec_col))
    scored = vectors.select(*cols)
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _hyperplanes(n_planes: int, dim: int, seed: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(vec: Column, planes) -> Column:
    """Sign-bit bucket id of ``vec`` under the given hyperplanes (pure
    column expression, codegen'd)."""
    out = F.lit(0)
    for i in range(len(planes)):
        out = out + F.when(
            _dot(vec, F.array(*[F.lit(float(p)) for p in planes[i]])) >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
    return out


def lsh_bucketed_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket of the query is
    scanned exactly; other buckets are pruned at the parquet scan
    (partition/row-group pruning on the bucket column at scale).

    ``n_probes`` is the recall knob (multi-probe LSH): probe the query's
    bucket plus its nearest neighbors in Hamming distance (1-bit flips
    first), trading scan volume for recall without rebuilding buckets."""
    import numpy as np

    planes = _hyperplanes(n_planes, len(query_vec), seed)
    v = vectors.withColumn(
        "_bucket", _bucket_expr(F.col(vec_col).cast("array<double>"), planes)
    )
    qv = np.asarray(query_vec)
    qb = int(sum((1 << i) for i in range(n_planes) if float(planes[i] @ qv) >= 0.0))
    n_probes = min(n_probes, 1 << n_planes)  # full probe == exact
    # probe order: flip masks ranked by the TOTAL |margin| of flipped
    # planes (closest decision boundaries first — standard multi-probe);
    # enumerating 2^n_planes masks is fine for the small plane counts a
    # bucket column uses (the bucket count, not the corpus, bounds this)
    margins = np.abs(planes @ qv)
    masks = np.arange(1 << n_planes, dtype=np.int64)
    bits = (masks[:, None] >> np.arange(n_planes)[None, :]) & 1
    cost = bits @ margins
    order = np.argsort(cost, kind="stable")  # mask 0 (cost 0) first
    probes = [int(qb ^ masks[m]) for m in order[:n_probes].tolist()]
    return brute_force_topk(
        v.filter(F.col("_bucket").isin(probes)), query_vec, id_col, vec_col, k
    )


def _cell_expr(cents: list) -> Column:
    """Nearest-centroid cell id of column ``_v`` as a pure (codegen'd)
    expression: lexicographic max of (similarity, -index) structs — ties
    resolve to the SMALLEST centroid index (ORDER BY sim DESC, idx ASC),
    the closed-form rule an external SQL oracle can replay."""
    sims = [
        F.struct(
            cosine_col(
                F.col("_v"), F.array(*[F.lit(float(x)) for x in c])
            ).alias("s"),
            F.lit(-i).alias("ni"),
        )
        for i, c in enumerate(cents)
    ]
    return -F.array_max(F.array(*sims))["ni"]


def kmeans_centroids(
    v: DataFrame, nlist: int, iters: int, id_col: str
) -> list[list[float]]:
    """Deterministic spherical k-means over ``v`` (columns: id_col, _v).

    Init = the ``nlist`` smallest-id vectors (the previous seed-sample
    rule, so iters=0 reproduces it exactly); each Lloyd round assigns
    cells with the SAME codegen'd expression queries use, then reduces
    per-(cell, dimension) sums in one shuffle — only ``nlist * dim``
    aggregate rows ever reach the driver, so a round costs one job
    regardless of corpus size.  Means are L2-normalized (spherical:
    cosine argmax == dot argmax against unit centroids); an emptied cell
    keeps its previous centroid.  No RNG anywhere — same input, same
    centroids (the driver-oracle determinism requirement)."""
    rows = v.orderBy(F.col(id_col)).limit(nlist).collect()
    cents = [list(map(float, r["_v"])) for r in rows]
    if not cents:
        return cents
    for _ in range(max(0, iters)):
        assigned = v.withColumn("_cell", _cell_expr(cents))
        agg = (
            assigned.select("_cell", F.posexplode("_v").alias("_i", "_x"))
            .groupBy("_cell", "_i")
            .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in agg:
            by_cell.setdefault(int(r["_cell"]), {})[int(r["_i"])] = (
                float(r["_s"]) / float(r["_n"])
            )
        new_cents = []
        for i, old in enumerate(cents):
            mean = by_cell.get(i)
            if not mean:
                new_cents.append(old)  # emptied cell keeps its centroid
                continue
            vec = np.array([mean[j] for j in range(len(old))])
            n = float(np.linalg.norm(vec))
            new_cents.append((vec / n).tolist() if n > 0 else old)
        cents = new_cents
    return cents


def ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 2,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) ANN: vectors are partitioned into ``nlist``
    Voronoi cells around coarse centroids; the query scores exactly only
    the ``nprobe`` cells whose centroids are nearest to it.  ``nprobe ==
    nlist`` probes every cell == exact brute force (the same oracle trick
    as ``lsh_bucketed_topk``'s full probe).

    ``kmeans_iters=0`` (default): centroids are the deterministic seed
    sample (``nlist`` smallest ids) — replayable in closed form by a SQL
    oracle.  ``kmeans_iters>0`` runs that many deterministic spherical
    Lloyd rounds (``kmeans_centroids``): better-placed centroids raise
    recall at a given nprobe; correctness is centroid-independent (full
    probe is exact either way).  At 100 TB ``_cell`` is a partition
    column written at ingest with the SAME assignment expression —
    probing prunes whole files/row-groups at the parquet scan, so query
    cost tracks nprobe/nlist of the corpus rather than the corpus; the
    nlist-literal assignment expression stays codegen'd and the centroid
    set rides the closure like the query vector itself (no shuffle
    anywhere on the query path)."""
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    # nlist * dim floats to the driver — same footprint class as query_vec
    cents = kmeans_centroids(v, nlist, kmeans_iters, id_col)
    if not cents:  # empty input: no cells to probe, exact scan is free
        return brute_force_topk(vectors, query_vec, id_col, vec_col, k)
    assigned = v.withColumn("_cell", _cell_expr(cents))
    qv = np.asarray(query_vec, dtype=np.float64)

    def _cos(c) -> float:
        c = np.asarray(c, dtype=np.float64)
        d = float(np.linalg.norm(c) * np.linalg.norm(qv))
        return float(c @ qv) / d if d else 0.0

    order = sorted(range(len(cents)), key=lambda i: (-_cos(cents[i]), i))
    probes = order[: max(1, min(nprobe, len(cents)))]
    return brute_force_topk(
        assigned.filter(F.col("_cell").isin(probes)), query_vec, id_col, "_v", k
    )


def quantize_embeddings(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization:
    ``scale = max|x| / 127``, ``q_i = round(x_i / scale)`` ∈ [-127, 127].

    The at-scale shape: the int8 column is written at ingest next to (or
    instead of) the float32 vectors — 4× less scan IO for the ranking
    stage.  Cosine against a full-precision query is SCALE-FREE under
    per-vector symmetric quantization (the scale cancels in both the dot
    product and the norm), so ranking reads ONLY the int8 array; the
    scale column is kept for dequantized dot products / reconstruction.

    Pure column expressions (codegen'd, no UDF) and closed-form —
    a SQL oracle replays it exactly (round = half away from zero in both
    Spark and DuckDB).  All-zero vectors get q = 0-vector, scale = 0."""
    v = F.col(vec_col).cast("array<double>")
    sc = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    q = F.when(sc == 0, F.transform(v, lambda x: F.lit(0.0))).otherwise(
        F.transform(v, lambda x: F.round(x / sc, 0))
    )
    return vectors.select(
        F.col(id_col),
        q.cast("array<tinyint>").alias("q"),
        sc.cast("double").alias("scale"),
    )


def quantized_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 50,
    quantized: DataFrame | None = None,
) -> DataFrame:
    """Two-stage ANN: int8-quantized cosine picks ``rerank`` candidates
    from the (4× cheaper) quantized scan, then exactly those rows are
    re-scored at full precision and the true top-k returned.

    ``quantized`` accepts a pre-materialized ``quantize_embeddings``
    table (the stored-at-ingest shape); None quantizes on the fly.
    ``rerank >= corpus size`` degrades to exact brute force — the same
    full-probe==exact oracle trick as ``lsh_bucketed_topk``/``ivf_topk``,
    but the default entry oracle replays BOTH stages in SQL.

    Scale shape: stage 1 is a scan of the int8 column +
    TakeOrderedAndProject (per-partition heap, no shuffle); stage 2 is a
    ``rerank``-bounded point fetch (pushed ``In(id, …)`` filter — the
    Msg22 doc-fetch shape), so full-precision vectors are read for only
    ~k·C rows no matter the corpus size."""
    if quantized is None:
        quantized = quantize_embeddings(vectors, id_col, vec_col)
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    approx = cosine_col(F.col("q").cast("array<double>"), qv)
    cand = (
        quantized.select(F.col(id_col), approx.alias("_approx"))
        .orderBy(F.desc("_approx"), F.asc(id_col))
        .limit(max(k, rerank))
    )
    # driver-bounded candidate list (<= rerank ids) -> pushed-filter
    # point scan of the full-precision rows
    ids = [r[0] for r in cand.select(id_col).collect()]
    return brute_force_topk(
        vectors.filter(F.col(id_col).isin(ids)), query_vec, id_col, vec_col, k
    )


def pairwise_cosine_above(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Embedding near-dup pairs (a < b, cosine >= threshold).

    Candidates form ONLY inside an LSH bucket (``bands`` independent
    hyperplane signatures OR'd together — two vectors are candidates if
    they agree on all ``n_planes`` sign bits of at least one band), then
    each candidate pair is scored exactly.  No cartesian product: the
    join key is (band, bucket), candidate volume is bounded per bucket by
    ``max_bucket_size`` (degenerate hot buckets dropped, as in
    dedup.minhash_lsh_pairs).  Recall rises with ``bands`` and falls with
    ``n_planes``; P(candidate) = 1 - (1 - (1 - θ/π)^n_planes)^bands for
    angle θ."""
    from pyspark.sql.types import ArrayType, IntegerType

    # NULL embeddings are excluded up front (no meaningful cosine; one
    # null row must not kill the matmul kernel)
    v = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # all bands' sign-buckets in ONE vectorized Arrow kernel (numpy matmul
    # against the stacked (bands*n_planes, dim) plane matrix) — a
    # per-plane Catalyst fold expression was interpreter-bound here, and
    # unlike the query-time probe path there is no pushdown to preserve:
    # every row needs its buckets.  dim is inferred from the first Arrow
    # batch inside the kernel (the planes depend only on seed/dim, so
    # every task regenerates the identical matrix — no driver-side job
    # just to read the dimension).
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def all_buckets(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype=object)
        lens = {len(x) for x in col}
        if len(lens) != 1:
            # hyperplanes depend on dim — mixed-dimension input would
            # silently bucket batches under different plane matrices
            raise ValueError(
                f"pairwise_cosine_above: mixed embedding dims {sorted(lens)}"
            )
        M = np.array(col.tolist(), dtype=np.float64)
        P = np.concatenate(
            [_hyperplanes(n_planes, M.shape[1], seed + 1000 * b) for b in range(bands)]
        )
        S = ((M @ P.T) >= 0).reshape(len(M), bands, n_planes)
        return pd.Series(list((S * weights).sum(axis=2).astype(np.int32)))

    banded = v.select(
        "id", F.posexplode(all_buckets(F.col("v"))).alias("band", "bucket")
    )
    # bucket cap via a window over the SAME (band, bucket) partitioning
    # the self-join shuffles on: one exchange serves the cap filter and
    # the join probe, instead of the former count-agg + left_semi which
    # re-evaluated the hyperplane matmul UDF an extra time (same fix as
    # dedup.simhash_near_pairs / minhash_lsh_pairs)
    from pyspark.sql import Window

    bounded = (
        banded.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("band", "bucket"))
        )
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    cand = (
        bounded.alias("l")
        .join(
            bounded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    return (
        cand.join(v.select(F.col("id").alias("a"), F.col("v").alias("_va")), "a")
        .join(v.select(F.col("id").alias("b"), F.col("v").alias("_vb")), "b")
        .select(
            "a",
            "b",
            F.round(cosine_col(F.col("_va"), F.col("_vb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
