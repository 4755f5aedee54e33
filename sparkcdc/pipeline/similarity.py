"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, rank per query. The corpus side streams — no
  shuffle of vectors, only of the (query, id, sim) triples that survive.
- ``ivf_topk`` — IVF-style ANN: partition the corpus into ``n_cells``
  centroid cells (deterministic seeded centroids), search only ``n_probe``
  nearest cells per query. At 10^9 vectors this turns a full scan into a
  (n_probe/n_cells) partial scan, and cell assignment is a narrow equi-join
  key — the classic inverted-file layout, expressed entirely in DataFrame
  ops (cells would be the Iceberg partition key at rest).

Ranking ties are broken by id so results are fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot_product

#: deterministic pseudo-random hyperplanes for sign-LSH: component (p, d)
#: = ((a*p + b*d + c) mod M - M/2) / (M/2) in [-1, 1). Closed-form integer
#: arithmetic so any engine (or the DuckDB oracle) reproduces them exactly.
LSH_M = 8191  # Mersenne prime 2^13-1
LSH_A, LSH_B, LSH_C = 2_654_435_761 % LSH_M, 40_503, 97


def hyperplane_component(p: int, d: int) -> float:
    v = (LSH_A * (p + 1) * (d + 7) + LSH_B * (p + 3) + LSH_C) % LSH_M
    return (v - LSH_M / 2) / (LSH_M / 2)


def hyperplane(p: int, dim: int) -> list[float]:
    return [hyperplane_component(p, d) for d in range(dim)]


def hyperplane_lsh_buckets(
    df: DataFrame,
    *,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sign-LSH (random-hyperplane / SimHash-for-vectors): bit p of the
    bucket id is sign(v · plane_p). Cosine-similar vectors collide with
    probability 1 − θ/π per bit, so near-dup candidates = same bucket —
    a narrow equi-join key, the scale path for embedding dedup.

    Pure Catalyst: each plane is a literal array folded with zip_with; no
    UDF, no shuffle. Output: (id, bucket).
    """
    from pyspark.sql import functions as FF

    bucket = FF.lit(0).cast("long")
    for p in range(n_planes):
        plane = FF.array(*[FF.lit(x) for x in hyperplane(p, dim)])
        bit = (dot_product(FF.col(vec_col), plane) >= 0).cast("long")
        bucket = bucket + bit * (1 << p)
    return df.select(FF.col(id_col).alias("id"), bucket.alias("bucket"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Output: (query_id, neighbor_id, rank, cos) — excludes self-matches.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("qvec"), F.col("cvec")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_assign: int = 1,
) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroid cells.

    Output: (id, cell, crank). Centroids are broadcast (they are small by
    construction: n_cells ≪ corpus).
    """
    cent = centroids.select(
        F.col("cell"), F.col(vec_col).alias("cvec")
    )
    v = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    scored = v.join(F.broadcast(cent)).select(
        "id",
        "cell",
        F.round(cosine_similarity(F.col("vec"), F.col("cvec")), 6).alias("csim"),
    )
    w = Window.partitionBy("id").orderBy(F.col("csim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_assign)
        .select("id", "cell", "crank")
    )


def seeded_centroids(
    corpus: DataFrame,
    *,
    n_cells: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic centroid seed set: the ``n_cells`` corpus vectors with
    the smallest ids (a k-means init stand-in; production would run
    k-means|| once offline and persist the centroids).

    ``orderBy(id).limit(n)`` plans as TakeOrderedAndProject — each task
    keeps its local top-n and the driver merges n_cells rows — so the seed
    selection is distributed. (A global ``Window.orderBy`` here would pull
    the whole corpus through one task — the single-partition-sort trap.)
    The row_number window that assigns cell ids runs AFTER the limit, over
    exactly ``n_cells`` rows, so its single partition is trivially small.
    """
    small = corpus.select(F.col(id_col), F.col(vec_col)).orderBy(
        F.col(id_col).asc()
    ).limit(n_cells)
    w = Window.orderBy(F.col(id_col).asc())
    return (
        small.withColumn("__rn", F.row_number().over(w))
        .select((F.col("__rn") - 1).alias("cell"), F.col(vec_col))
    )


def refine_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd iterations over the seeded centroids: assign → mean per cell.

    Pure DataFrame ops: the mean of ``array<float>`` columns is a
    ``posexplode`` + groupBy(cell, dim) avg + re-assemble — one narrow
    shuffle per iteration, O(corpus × dim) rows of (float, int) after
    map-side partial aggregation. Empty cells keep their previous centroid.
    """
    for _ in range(iters):
        assigned = assign_cells(
            corpus, centroids, vec_col=vec_col, id_col=id_col, n_assign=1
        )
        v = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        exploded = (
            assigned.join(v, "id")
            .select("cell", F.posexplode("vec").alias("dim", "x"))
        )
        means = (
            exploded.groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias(vec_col)
            )
        )
        # cells that captured no vectors keep their old centroid
        keep = centroids.alias("old").join(
            means.select("cell"), "cell", "left_anti"
        )
        centroids = means.unionByName(keep.select("cell", vec_col))
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: search only the ``n_probe`` cells nearest each query.

    Output: (query_id, neighbor_id, rank, cos). Approximate — recall
    depends on n_probe/n_cells (exact when n_probe == n_cells);
    ``refine_iters`` Lloyd steps tighten the cells (better recall at equal
    n_probe) at the cost of one assign+mean pass per iteration.
    """
    cents = seeded_centroids(corpus, n_cells=n_cells, vec_col=vec_col, id_col=id_col)
    if refine_iters > 0:
        cents = refine_centroids(
            corpus, cents, iters=refine_iters, vec_col=vec_col, id_col=id_col
        )
    corpus_cells = assign_cells(
        corpus, cents, vec_col=vec_col, id_col=id_col, n_assign=1
    ).select(F.col("id").alias("neighbor_id"), F.col("cell"))
    query_cells = assign_cells(
        queries, cents, vec_col=vec_col, id_col=id_col, n_assign=n_probe
    ).select(F.col("id").alias("query_id"), F.col("cell"))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).join(corpus_cells, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).join(F.broadcast(query_cells), "query_id")

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("qvec"), F.col("cvec")), 6
            ).alias("cos"),
        )
        .distinct()  # a neighbor can appear via multiple probed cells
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
