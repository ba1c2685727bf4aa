"""Embedding similarity search (approximate-nearest-neighbor).

North-star extension: top-k cosine neighbors over an embedding column
(``array<float>``).

Two strategies:

- :func:`cosine_topk` — brute-force exact baseline: query-batch ×
  corpus join with JVM-side ``aggregate``/``zip_with`` dot products, then
  per-query top-k via ``row_number``. The join broadcasts the (small)
  query batch, so the corpus side never shuffles — it streams one pass.
  At 100 TB-scale corpora this is the correct *exact* plan: one corpus
  scan per query batch, embarrassingly parallel.
- :func:`lsh_topk` — random-hyperplane (sign) LSH: 16-bit bucket
  signatures from deterministic pseudo-random planes; candidates meet via
  an equi-join on any matching band, exact cosine re-ranks candidates
  only. Sub-linear candidate volume; recall measured in tests against
  the brute-force baseline.

Vectors are cast to double before arithmetic: fp32 accumulation drifts
across engines/orders, fp64 keeps the oracle comparable at 1e-6.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import rebalance_for_compute


# Cell count past which "auto" assignment routing prefers the
# two-stage index (ivf_assign_indexed) over the flat argmax scan.
# Measured wall (docs/BENCH_NOTES_r11/r12.md): the flat
# ``n x n_cells x dim`` scan turns superlinear at ~1-2k cells
# (400k x 16-dim, 4096 cells: 204 s flat vs 10 s indexed); below ~1k
# the constant-size flat expression is exact and cheaper than the
# index's extra super-cell stage. Shared by semdedup.semantic_dedup
# and ivf_topk.
ASSIGN_INDEX_AUTO_CELLS = 1024


def _require_filter(query_filter: str | None) -> str:
    """Fail with a usable message instead of `df.filter(None)`'s opaque
    Py4J type error when the caller supplies neither query source."""
    if query_filter is None:
        raise ValueError(
            "a query set is required: pass either `queries` (a DataFrame "
            "of query vectors) or `query_filter` (a SQL predicate "
            "selecting them from the corpus)"
        )
    return query_filter


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sql_vec(v: list[float]) -> str:
    """A float vector as a SQL double-array literal.

    ``CAST(repr AS DOUBLE)`` rather than a bare literal: Spark parses
    plain decimal literals as DECIMAL (repr round-trips exactly through
    decimal38 -> double), and one parsed string replaces a py4j
    round-trip per element (16 planes x 64 dims = 1024 Column calls
    otherwise — measured ~1s of query-compile time).
    """
    return "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in v) + ")"


def _sql_dot(vec_sql: str, const_sql: str) -> str:
    """SQL text of _dot(vec, const): identical op order -> identical floats."""
    return (
        f"aggregate(zip_with({vec_sql}, {const_sql},"
        f" (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs with cosine similarity >= threshold (embedding near-dup).

    O(n²/2) comparisons — the exact verifier / small-corpus path; LSH
    (below) is the scale path. Output: (vec_a, vec_b, cos), vec_a < vec_b.
    """
    # Norms are precomputed per vector (bit-identical to recomputing
    # them per pair, but O(n) instead of O(n²) norm work). The streamed
    # side of the nested-loop join is rebalanced so pair scoring
    # parallelizes even off a single-split scan.
    emb = rebalance_for_compute(emb)
    a = emb.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
    )


def cosine_pairs_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.4,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via a blocked triangle join.

    Same output as :func:`cosine_pairs`, scale-safe physical plan. The
    naive form is a theta-join (``vec_a < vec_b``) — Spark can only run
    that as BroadcastNestedLoopJoin/cartesian, which concentrates all
    O(n²) work in the join operator and dies at large n. Here vectors
    are hashed into ``n_blocks`` blocks and every unordered block pair
    (i <= j) becomes a join key: the left side replicates each vector to
    keys ``(blk, j>=blk)``, the right side to ``(i<=blk, blk)``, and the
    pair join is a plain shuffle **equi-join** on the block-pair key.
    Each unordered vector pair meets on exactly one key, so no distinct
    pass is needed. Per-row replication is ~n_blocks/2 per side; work
    spreads evenly over n_blocks*(n_blocks+1)/2 independent tasks of
    (n/n_blocks)² scoring ops each — skew-free by construction, and
    n_blocks tunes task granularity to the cluster.

    Why not LSH candidates: the fixtures (and real diffuse embedding
    corpora) have pair mass right at the threshold — random-hyperplane
    banding has per-pair recall < 1 at any banding for borderline
    similarities, so a banded plan cannot reproduce the exact answer.
    Exact threshold-all-pairs over diffuse data is inherently quadratic
    in compute (the near-threshold pair count itself grows ~n²);
    blocking makes that quadratic distributed and equi-join shaped. For
    high-threshold near-dup where approximate recall is acceptable,
    :func:`lsh_topk`-style banded candidates are the sub-quadratic path.

    Norms are computed once per vector before replication. Scoring uses
    the same sequential ``aggregate`` fold as :func:`cosine_pairs`, so
    floats are bit-identical to the naive plan.

    Measured at sf0.1 (2000 × 64-dim, ~2M pairs, local[32], median of
    3): naive BNLJ 10.3s vs blocked 5.8s (1.8×) — and the blocked plan's
    advantage compounds with scale because each of the B(B+1)/2 tasks is
    an independent, evenly-sized unit where the BNLJ concentrates the
    stream side per broadcast batch.
    """
    emb = rebalance_for_compute(emb)
    nb = int(n_blocks)
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("blk"),
    )
    left = base.select(
        F.col("vid").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
        F.col("blk").alias("blk_a"),
        F.explode(F.sequence(F.col("blk"), F.lit(nb - 1))).alias("other"),
    ).withColumn("pk", F.col("blk_a") * nb + F.col("other")).drop("other")
    right = base.select(
        F.col("vid").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb_"),
        F.col("blk").alias("blk_b"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("other"),
    ).withColumn("pk", F.col("other") * nb + F.col("blk_b")).drop("other")
    pairs = left.join(right, "pk").filter(
        (F.col("blk_a") < F.col("blk_b"))
        | ((F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb_"))
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select(
            F.least("id_a", "id_b").alias("vec_a"),
            F.greatest("id_a", "id_b").alias("vec_b"),
            F.round("cos", 4).alias("cos"),
        )
    )


def cosine_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str | None = None,
    queries: DataFrame | None = None,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (or ``emb.filter(query_filter)``) is broadcast against the
    corpus; ranking uses round(cos, 6) with neighbor-id tie-break so the
    result set is engine-portable. Self-matches are excluded.

    Output: (query_id, neighbor_id, cos, rank).
    """
    q = queries if queries is not None else emb.filter(_require_filter(query_filter))
    emb = rebalance_for_compute(emb)  # corpus side: parallel dot products
    qs = q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = (
        corpus.join(F.broadcast(qs), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cos, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hard_negatives(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_filter: str | None = None,
    queries: DataFrame | None = None,
    k: int = 5,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the top-k
    most-similar vectors carrying a DIFFERENT label (DPR / SimCSE-style
    training-pair construction — in-batch negatives are easy, the
    negatives worth shipping to the trainer are the near-misses).

    Same plan shape as :func:`cosine_topk` (broadcast query batch against
    the rebalanced corpus, JVM-side fold dot products, per-query window
    top-k with round(cos, 6) + neighbor-id tie-break); the label
    inequality rides the broadcast-join condition, so mismatched-label
    pairs are dropped before the window shuffle.

    Output: (query_id, query_label, neighbor_id, neighbor_label, cos,
    rank).
    """
    q = queries if queries is not None else emb.filter(_require_filter(query_filter))
    emb = rebalance_for_compute(emb)
    qs = q.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    scored = corpus.join(
        F.broadcast(qs), F.col("query_label") != F.col("neighbor_label")
    ).withColumn("cos", F.round(cos, 6))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "cos",
            "rank",
        )
    )


def cosine_topk_blocked(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k, vectorized: numpy block-matmul inside ``mapInPandas``.

    The SQL higher-order-function dot product (:func:`cosine_topk`) is
    interpreted per element on the JVM; for brute-force scoring the
    BLAS-backed ``queries @ block.T`` over Arrow batches is the right
    physical plan at scale — one corpus pass, a (k × queries) partial
    top-k per batch, tiny global re-rank. Results match
    :func:`cosine_topk` up to fp summation order (ranking uses
    round-6 + id tie-break like the SQL path).

    This is the documented exception to "UDFs are the slow path": the
    kernel is dense linear algebra, where vectorized C beats codegen'd
    per-element expressions. Measured at sf0.1 (500 queries × 5000
    corpus × 64 dims, local[32], warm): SQL HOF 5.7s vs blocked 0.46s
    (12×). Oracle-checked queries keep the SQL form (bit-reproducible
    summation order); use this for production batch scoring.
    """
    import numpy as np

    q_rows = emb.filter(query_filter).select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def _score(batches):
        ids, qm = bc.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(block, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = qm @ (block / norms).T  # (n_queries, batch)
            nb = sims.shape[1]
            take = min(k + 1, nb)  # +1 covers a possible self-match
            import pandas as pd

            part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            out_q, out_n, out_c = [], [], []
            neigh_ids = pdf[id_col].to_numpy()
            for qi in range(len(ids)):
                for j in part[qi]:
                    out_q.append(ids[qi])
                    out_n.append(neigh_ids[j])
                    out_c.append(round(float(sims[qi, j]), 6))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos": out_c}
            )

    partial = rebalance_for_compute(emb.select(id_col, vec_col)).mapInPandas(
        _score, schema="query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        partial.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / s for x in v])
    return planes


def lsh_signature(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Attach a random-hyperplane sign signature column ``lsh_sig`` (int).

    Planes are seeded constants shipped as literal arrays — pure
    expressions, no UDF, no shuffle (a narrow projection).
    """
    planes = _planes(dim, n_planes, seed)
    # The plane matrix is ONE nested-array literal scored with
    # higher-order functions, so the expression tree is constant-size in
    # both n_planes and dim (the earlier unrolled CASE-per-plane form was
    # ~2k nodes at 16x64 and its per-query analysis+codegen measurably
    # outweighed interpreted lambda evaluation — same finding as
    # ivf_assign). Bit positions are disjoint, so the OR-fold is a sum.
    matrix = "array(" + ", ".join(_sql_vec(p) for p in planes) + ")"
    sig = (
        f"aggregate(transform({matrix}, (p, i) -> "
        f"CASE WHEN aggregate(zip_with({vec_col}, p, (x, y) -> x * y), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) >= 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, b) -> acc + b)"
    )
    return emb.withColumn("lsh_sig", F.expr(sig))


def ivf_centroids(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    refine_iters: int = 0,
) -> list[list[float]]:
    """Train the IVF coarse quantizer.

    Deterministic random init — a hash-ordered sample of the corpus —
    optionally refined with ``refine_iters`` Lloyd (k-means) iterations.
    Each iteration is two distributed steps: assignment (narrow
    projection against broadcast centroid literals) and an element-wise
    mean per cell computed as ``posexplode`` -> ``groupBy(cell, pos)`` ->
    ``avg`` — one shuffle keyed on (cell, dim), no UDFs, scales to any
    corpus size. Only the (n_cells × dim) centroid matrix ever reaches
    the driver. Empty cells keep their previous centroid.

    Spherical k-means: centroids are L2-normalized after init and after
    every mean update, so dot-product assignment equals cosine
    assignment and the mean cannot shrink centroids toward the origin
    (which would collapse the dot-product objective for near-random
    vectors).
    """

    def _unit(v: list[float]) -> list[float]:
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / s for x in v]

    rows = (
        emb.orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents = [_unit([float(x) for x in r[0]]) for r in rows]
    # corpus shorter than n_cells: the smaller cell set IS the trained
    # quantizer (same clamp as ivf_centroids_indexed — without it the
    # refine rebuild below indexes cells that never existed)
    n_cells = min(n_cells, len(cents))
    for _ in range(refine_iters):
        assigned = ivf_assign(emb, cents, vec_col=vec_col, n_probe=1)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = {c: list(v) for c, v in enumerate(cents)}  # keep empty cells
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.pos] = r.m
        for cell, dims in by_cell.items():
            new[cell] = _unit([dims[i] for i in range(len(dims))])
        cents = [new[c] for c in range(n_cells)]
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    n_probe: int = 1,
    unroll_threshold: int = 0,
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest IVF cells (by dot
    product against the shared centroid set). Narrow projection — no
    shuffle, one pass. Output: input columns + ``cell``, one row per
    probed cell.

    Default expression form: the centroid matrix is a single
    nested-array LITERAL (data, not operators) scored with higher-order
    functions (``transform`` + ``zip_with``/``aggregate``), so the
    expression TREE is constant-size no matter how many cells —
    n_cells=4096 plans exactly like n_cells=16. An unrolled
    one-dot-product-per-cell alternative (n_cells × dim expression
    nodes inside whole-stage codegen) is selectable via
    ``unroll_threshold`` but measured SLOWER even at n_cells=16
    (0.43 s vs 0.31 s steady-state at sf0.1): per-query Catalyst
    analysis + codegen of the wide tree costs more than the HOF
    lambdas' interpreted evaluation, and at n_cells=4096 the unrolled
    tree (~256k nodes) would blow past the 64 KB JVM method limit
    entirely.
    """
    if len(centroids) <= unroll_threshold:
        # Single parsed expression for the scored-cells array (_sql_vec).
        scored = "array(" + ", ".join(
            f"struct(-({_sql_dot(vec_col, _sql_vec(c))}) AS neg_sim, "
            f"{ci} AS cell)"
            for ci, c in enumerate(centroids)
        ) + ")"
    else:
        matrix = "array(" + ", ".join(_sql_vec(c) for c in centroids) + ")"
        scored = (
            f"transform({matrix}, (c, i) -> struct("
            f"-aggregate(zip_with({vec_col}, c, (x, y) -> x * y), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS neg_sim, "
            f"i AS cell))"
        )
    ranked = (
        f"transform(slice(array_sort({scored}), 1, {int(n_probe)}), s -> s.cell)"
    )
    return emb.select("*", F.expr(f"explode({ranked}) AS cell"))


def _supercell_groups(
    centroids: list[list[float]], n_super: int, lloyd_iters: int = 5
) -> tuple[list[list[float]], list[list[int]]]:
    """Driver-side k-means over the CENTROIDS themselves: returns
    (super_centroids, groups) with ``groups[s]`` the centroid indices
    owned by super-cell ``s``. Deterministic: init takes every
    ``k/n_super``-th centroid, Lloyd on plain dot products (centroids
    are already unit-norm), empty super-cells keep their previous
    position. Pure Python over a k x dim list — the quantizer is
    parameters, not data."""
    k = len(centroids)
    n_super = min(n_super, k)
    sup = [list(centroids[(i * k) // n_super]) for i in range(n_super)]

    def _assign() -> list[list[int]]:
        groups: list[list[int]] = [[] for _ in range(n_super)]
        for ci, c in enumerate(centroids):
            best, best_s = None, 0
            for si, s in enumerate(sup):
                d = sum(x * y for x, y in zip(c, s))
                if best is None or d > best:
                    best, best_s = d, si
            groups[best_s].append(ci)
        return groups

    groups = _assign()
    for _ in range(lloyd_iters):
        for si, members in enumerate(groups):
            if not members:
                continue
            dim = len(sup[si])
            m = [
                sum(centroids[ci][j] for ci in members) / len(members)
                for j in range(dim)
            ]
            n = math.sqrt(sum(x * x for x in m)) or 1.0
            sup[si] = [x / n for x in m]
        groups = _assign()
    return sup, groups


def ivf_assign_indexed(
    emb: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
    n_super: int | None = None,
    n_probe_super: int = 2,
    n_probe: int = 1,
) -> DataFrame:
    """Two-stage (coarse-quantized) IVF assignment — the scale rung
    past :func:`ivf_assign`'s flat scan, whose cost is
    ``n x n_cells x dim`` and becomes the measured wall past ~1-2k
    cells (``docs/BENCH_NOTES_r11.md``, semdedup probe: 4096 cells,
    400k rows -> the assignment dominates a 23-minute run). Standard
    IVF-on-the-centroids construction: k-means the centroids into
    ``n_super ~ sqrt(n_cells)`` super-cells (driver-side — the
    quantizer is parameters), score the ``n_super`` super-centroids per
    row, then score only the centroids owned by the ``n_probe_super``
    nearest super-cells. Cost per row falls to
    ``(n_super + n_probe_super x n_cells/n_super) x dim`` —
    ~``2 sqrt(n_cells)/n_cells`` of the flat scan (4096 cells, 2
    probes: ~32x fewer dot products).

    APPROXIMATE: a vector whose true nearest centroid lives outside its
    probed super-cells is assigned to the best PROBED centroid. The
    assignment remains a pure deterministic function of the vector —
    identical (or positively scaled) vectors co-assign, which is the
    property exact-duplicate suppression in ``semdedup`` relies on;
    raise ``n_probe_super`` toward ``n_super`` to converge on the exact
    argmax (equality at ``n_probe_super = n_super``, pytest-pinned).
    Output matches :func:`ivf_assign`: input columns + ``cell``, one
    row per probed cell (``n_probe`` nearest among the candidates).
    """
    k = len(centroids)
    if n_super is None:
        n_super = max(1, int(math.isqrt(k)))
    n_super = min(n_super, k)
    if n_probe_super < 1:
        raise ValueError(f"n_probe_super must be >= 1: {n_probe_super}")
    # probing more super-cells than exist is just the exact argmax —
    # clamp (a tiny quantizer, e.g. 3 cells -> n_super=1, must accept
    # the default n_probe_super=2; the fully-probed == flat pytest
    # pins the equality this clamp relies on)
    n_probe_super = min(n_probe_super, n_super)
    sup, groups = _supercell_groups(centroids, n_super)
    # Stage 1 — super-cell scoring: n_super ~ sqrt(k) centroids as a
    # SMALL literal matrix (the only quantizer content that lives in
    # the expression tree).
    sup_matrix = "array(" + ", ".join(_sql_vec(s) for s in sup) + ")"
    scored_super = (
        f"transform({sup_matrix}, (c, i) -> struct("
        f"-aggregate(zip_with({vec_col}, c, (x, y) -> x * y), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS neg_sim, i AS sc))"
    )
    probes = f"slice(array_sort({scored_super}), 1, {int(n_probe_super)})"
    # Stage 2 — candidate fetch: the owned centroids reach each row by
    # n_probe_super BROADCAST JOINS against a (super-cell -> members)
    # table, NOT the former element_at(<k x (dim+1) literal>, sc + 1):
    # past ~1-2k cells that giant literal leaves whole-stage codegen
    # and is re-evaluated interpreted per row (the semantic_dedup
    # centroid_sim wall, measured 13x at 2048 x 256 —
    # docs/BENCH_NOTES_r12.md). The joins stay shuffle-free (the build
    # side is k parameter rows, broadcast once) and each input row
    # keeps exactly one output row per probe slot, so the plan shape
    # downstream is unchanged.
    cent_rows = [
        (s, [(ci, [float(x) for x in centroids[ci]]) for ci in members])
        for s, members in enumerate(groups)
    ]
    cdf = emb.sparkSession.createDataFrame(
        cent_rows, "sc: int, members: array<struct<cid: int, cv: array<double>>>"
    )
    orig_cols = list(emb.columns)
    out = emb.select("*", F.expr(probes).alias("__ivf_probes"))
    member_cols = []
    for j in range(int(n_probe_super)):
        mcol = f"__ivf_m{j}"
        side = cdf.select(
            F.col("sc").alias(f"__ivf_sc{j}"), F.col("members").alias(mcol)
        )
        out = out.join(
            F.broadcast(side),
            F.expr(f"element_at(__ivf_probes, {j + 1}).sc") == F.col(f"__ivf_sc{j}"),
        )
        member_cols.append(mcol)
    cands = (
        member_cols[0]
        if len(member_cols) == 1
        else "concat(" + ", ".join(member_cols) + ")"
    )
    scored = (
        f"transform({cands}, x -> struct("
        f"-aggregate(zip_with({vec_col}, x.cv, (x0, y0) -> x0 * y0), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS neg_sim, "
        f"x.cid AS cell))"
    )
    ranked = (
        f"transform(slice(array_sort({scored}), 1, {int(n_probe)}),"
        f" s -> s.cell)"
    )
    return out.select(*orig_cols, F.expr(f"explode({ranked}) AS cell"))


def ivf_centroids_indexed(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    refine_iters: int = 0,
    n_probe_super: int | None = 2,
) -> list[list[float]]:
    """Train the IVF quantizer with INDEXED Lloyd iterations.

    Same init, same element-wise-mean update, and same spherical
    normalization as :func:`ivf_centroids` (deliberately a separate
    function — the flat trainer is in several attested entries' code
    closures and stays byte-stable), but each iteration's assignment
    step routes through :func:`ivf_assign_indexed` instead of the flat
    ``n x n_cells x dim`` scan. That scan is the measured training wall
    at scale (400k x 4096: 563.8 s of a ~700 s run,
    ``docs/BENCH_NOTES_r11.md``); the two-stage index cuts the per-row
    assignment cost ~``2 sqrt(k)/k``-fold, measured 13.3x on the
    assignment stage at the same shape.

    This is APPROXIMATE Lloyd — the standard regime for IVF training
    at scale (FAISS trains million-centroid quantizers exactly this
    way): a point routed to a near-equidistant neighbor cell pulls that
    cell's mean instead, and the objective still descends because every
    reassignment is to a centroid at least as close among the probed
    set. ``n_probe_super=None`` (or ``= n_super``) recovers the exact
    flat iteration — pytest pins equality with :func:`ivf_centroids`
    there. The super-quantizer is rebuilt from the moving centroids
    every iteration (driver-side k-means over k vectors — parameters,
    not data).
    """

    def _unit(v: list[float]) -> list[float]:
        s = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / s for x in v]

    rows = (
        emb.orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents = [_unit([float(x) for x in r[0]]) for r in rows]
    # A corpus shorter than n_cells hands back fewer init vectors; the
    # trained quantizer IS that smaller cell set (every row already has
    # its own centroid). Without the clamp the refine loop's
    # ``range(n_cells)`` rebuild indexes cells that never existed.
    n_cells = min(n_cells, len(cents))
    n_super = max(1, int(math.isqrt(len(cents))))
    nps = n_super if n_probe_super is None else min(n_probe_super, n_super)
    for _ in range(refine_iters):
        assigned = ivf_assign_indexed(
            emb, cents, vec_col=vec_col, n_super=n_super,
            n_probe_super=nps, n_probe=1,
        )
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = {c: list(v) for c, v in enumerate(cents)}  # keep empty cells
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.pos] = r.m
        for cell, dims in by_cell.items():
            new[cell] = _unit([dims[i] for i in range(len(dims))])
        cents = [new[c] for c in range(n_cells)]
    return cents


def ivf_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    refine_iters: int = 0,
    assign_via_index: bool | str = "auto",
) -> DataFrame:
    """Approximate top-k via IVF: corpus vectors live in 1 cell each,
    queries probe their ``n_probe`` nearest cells; exact cosine ranks the
    candidates. Candidate generation is an equi-join on ``cell`` — the
    scale path when the corpus is too large for per-query full scans.

    ``assign_via_index``: same measured-auto rule as
    ``semdedup.semantic_dedup`` — ``"auto"`` (default) trains and
    assigns through the two-stage index past the
    ``ASSIGN_INDEX_AUTO_CELLS`` wall (the flat ``n x n_cells x dim``
    scan turns superlinear there — docs/BENCH_NOTES_r12.md), exact
    flat below it; ``True``/``False`` pin. Indexed assignment is a
    pure function of the vector, so corpus/query cells stay comparable
    — only cluster boundaries for outlying vectors are approximate.

    The ``"auto"`` decision is resolved in two steps, mirroring
    ``semantic_dedup``: the TRAINER is picked on the requested
    ``n_cells`` (training cost scales with the request), but the
    ASSIGNMENT route is re-resolved on ``len(cents)`` AFTER training —
    a corpus shorter than ``n_cells`` trains fewer centroids (both
    trainers clamp), and the measured rule prescribes the exact flat
    scan for a small trained cell set even when the request was large.
    """
    auto = assign_via_index == "auto"
    if auto:
        assign_via_index = n_cells > ASSIGN_INDEX_AUTO_CELLS
    elif isinstance(assign_via_index, str):
        raise ValueError(
            f"assign_via_index must be 'auto' or bool: {assign_via_index!r}"
        )
    # One quantizer, trained on the corpus, shared by both sides — cells
    # are only comparable within a single centroid set.
    emb = rebalance_for_compute(emb)  # parallel assignment + scoring
    train = ivf_centroids_indexed if assign_via_index else ivf_centroids
    cents = train(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        seed=seed,
        refine_iters=refine_iters,
    )
    if auto:  # re-check on the TRAINED count (may be clamped below n_cells)
        assign_via_index = len(cents) > ASSIGN_INDEX_AUTO_CELLS
    assign = (
        (lambda df, c, **kw: ivf_assign_indexed(df, c, **kw))
        if assign_via_index
        else (lambda df, c, **kw: ivf_assign(df, c, **kw))
    )
    corpus_cells = assign(emb, cents, vec_col=vec_col, n_probe=1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cell"
    )
    query_cells = assign(
        emb.filter(query_filter), cents, vec_col=vec_col, n_probe=n_probe
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "cell")

    cands = (
        query_cells.join(corpus_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cos", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _pq_cb_sql(codebooks: list[list[list[float]]]) -> str:
    """Nested literal: array(sub -> array(code -> array(dim -> float)))."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(_sql_vec(c) for c in book) + ")"
            for book in codebooks
        )
        + ")"
    )


def pq_train(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    refine_iters: int = 2,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al. 2011): the
    vector is split into ``m`` contiguous subvectors and each subspace
    gets its own ``n_codes``-entry k-means codebook (L2 metric).

    Deterministic init (hash-ordered corpus sample, sliced per
    subspace), refined with distributed Lloyd iterations over the
    EXPLODED subvector frame — all m subspaces train in one pass per
    iteration: assignment is a narrow HOF projection against the nested
    codebook literal (constant-size expression tree regardless of
    m × n_codes), means are one (sub, code, pos)-keyed aggregate. Only
    the m × n_codes × d_sub codebook matrix reaches the driver.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq_train requires a non-empty corpus")
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m

    rows = (
        emb.orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_codes)
        .select(vec_col)
        .collect()
    )
    books = [
        [[float(x) for x in r[0][s * d_sub : (s + 1) * d_sub]] for r in rows]
        for s in range(m)
    ]
    if len(rows) < n_codes:
        raise ValueError(f"corpus smaller than n_codes={n_codes}")

    subs = emb.select(
        F.expr(
            f"explode(transform(sequence(0, {m - 1}), s -> "
            f"struct(s AS sub, slice({vec_col}, s * {d_sub} + 1, {d_sub}) "
            f"AS sv)))"
        ).alias("e")
    ).select("e.sub", "e.sv")
    for _ in range(refine_iters):
        cb = _pq_cb_sql(books)
        assigned = subs.select(
            "sub",
            "sv",
            F.expr(
                f"array_sort(transform(element_at({cb}, sub + 1), (c, i) -> "
                f"struct(aggregate(zip_with(sv, c, (x, y) -> (x - y) * (x - y)), "
                f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS dist, i AS code)"
                f"))[0].code"
            ).alias("code"),
        )
        means = (
            assigned.select(
                "sub", "code", F.posexplode(F.col("sv")).alias("pos", "x")
            )
            .groupBy("sub", "code", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("mval"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            upd.setdefault((r.sub, r.code), {})[r.pos] = r.mval
        for (s, c), dims in upd.items():
            books[s][c] = [dims[i] for i in range(d_sub)]  # empty codes keep
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices (array<int> —
    m × log2(n_codes) bits of payload instead of dim × 4 bytes). Narrow
    projection, constant-size HOF expression, no shuffle."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    cb = _pq_cb_sql(codebooks)
    codes = (
        f"transform(sequence(0, {m - 1}), s -> "
        f"array_sort(transform(element_at({cb}, s + 1), (c, i) -> "
        f"struct(aggregate(zip_with(slice({vec_col}, s * {d_sub} + 1, "
        f"{d_sub}), c, (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), "
        f"(acc, v) -> acc + v) AS dist, i AS code)))[0].code)"
    )
    return emb.select("*", F.expr(codes).alias("codes"))


def pq_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 20,
    seed: int = 42,
    refine_iters: int = 2,
) -> DataFrame:
    """Approximate top-k via PQ asymmetric-distance search: the corpus is
    scanned as compact codes, each query scores a code row by summing
    per-subspace L2 distances between its OWN full-precision subvector
    and the centroid the code names (ADC — the query side is never
    quantized), the best ``shortlist`` candidates per query are re-ranked
    with exact cosine, and the top ``k`` survive.

    Scale shape: the ADC scan reads m small ints per corpus row (the
    codes column — at dim=64/m=8 that is ~16× less than the float
    vector), the codebook rides along as a constant-size nested literal,
    and only shortlist × n_queries rows reach the exact re-rank — which
    fetches its full-precision vectors by an id equi-join against the
    vector store, so the wide embedding column never rides the ADC scan
    or the shortlist shuffle. (With an in-memory corpus the codes are
    still derived from the vectors in the same lineage; see
    :func:`pq_topk_indexed` for the materialized form whose ADC scan is
    physically codes-only.)
    """
    emb = rebalance_for_compute(emb)
    books = pq_train(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        n_codes=n_codes,
        seed=seed,
        refine_iters=refine_iters,
    )
    codes = pq_encode(emb, books, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    qs = emb.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    vectors = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    return _pq_adc_search(
        codes, vectors, qs, books, k=k, shortlist=shortlist
    )


def _pq_adc_search(
    codes: DataFrame,
    vectors: DataFrame,
    qs: DataFrame,
    books: list[list[list[float]]],
    *,
    k: int,
    shortlist: int,
) -> DataFrame:
    """Shared ADC search core: score ``codes`` (neighbor_id, codes)
    against the broadcast query batch, keep the best ``shortlist`` per
    query, then fetch ONLY the shortlisted ids' vectors from ``vectors``
    (neighbor_id, cv) for the exact cosine re-rank. The shortlist side
    of the fetch join is shortlist × n_queries rows — broadcast it, so
    the vector store is one scan with zero shuffle."""
    m = len(books)
    d_sub = len(books[0][0])
    cb = _pq_cb_sql(books)
    adc = (
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE), (acc, s) -> "
        f"acc + aggregate(zip_with(slice(qv, s * {d_sub} + 1, {d_sub}), "
        f"element_at(element_at({cb}, s + 1), element_at(codes, s + 1) + 1), "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (a, v) -> a + v))"
    )
    scored = codes.join(
        F.broadcast(qs), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("adc", F.round(F.expr(adc), 9))
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    cands = (
        scored.withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "qv", "neighbor_id")
    )
    fetched = vectors.join(F.broadcast(cands), "neighbor_id")
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        fetched.withColumn("cos", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def pq_write_index(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    refine_iters: int = 2,
    target_files: int | None = None,
) -> None:
    """Materialize a PQ index (the PQ twin of :func:`write_ann_index`):
    train codebooks once, then write three parquet artifacts —

    - ``codes``: (id, codes array<int>) — the ADC-scan side, m small
      ints per vector, NO vector payload (at dim=64/m=8 ~16× narrower
      than the float vectors);
    - ``vectors``: (id, vec) — fetched by id only for the shortlist
      re-rank;
    - ``codebooks``: the (sub, code, centroid) rows plus baked-in
      params, so probes with mismatched (m, n_codes, seed) fail fast.
    """

    def _w(df: DataFrame, sub: str) -> None:
        if target_files is not None:
            df = df.coalesce(target_files)
        df.write.mode("overwrite").parquet(f"{path}/{sub}")

    emb = rebalance_for_compute(emb)
    books = pq_train(
        emb, id_col=id_col, vec_col=vec_col,
        m=m, n_codes=n_codes, seed=seed, refine_iters=refine_iters,
    )
    _w(
        pq_encode(emb, books, vec_col=vec_col).select(
            F.col(id_col), "codes"
        ),
        "codes",
    )
    _w(emb.select(F.col(id_col), F.col(vec_col)), "vectors")
    spark = emb.sparkSession
    cb_rows = [
        (s, c, books[s][c]) for s in range(m) for c in range(len(books[s]))
    ]
    spark.createDataFrame(
        cb_rows, "sub int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    spark.createDataFrame(
        [(m, n_codes, seed, id_col, vec_col)],
        "m int, n_codes int, seed int, id_col string, vec_col string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def pq_topk_indexed(
    queries: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    shortlist: int = 100,
) -> DataFrame:
    """:func:`pq_topk` against a pre-built index: the ADC scan reads the
    stored ``codes`` artifact — physically codes-only, no embedding
    column in its ReadSchema (plan-guarded in ``tests/test_plans.py``) —
    and the exact re-rank fetches only shortlisted ids from the stored
    ``vectors`` artifact. This is the standing-retrieval layout at
    100 TB: per query batch, the wide vector column is read for
    shortlist × n_queries rows instead of the whole corpus."""
    spark = queries.sparkSession
    p = spark.read.parquet(f"{index_path}/params").collect()[0]
    got = (m, n_codes, seed)
    want = (p["m"], p["n_codes"], p["seed"])
    if got != want:
        raise ValueError(
            f"pq index at {index_path} was built with (m, n_codes, "
            f"seed)={want}; probe requested {got}"
        )
    cb_rows = spark.read.parquet(f"{index_path}/codebooks").collect()
    books_map: dict[int, dict[int, list[float]]] = {}
    for r in cb_rows:
        books_map.setdefault(r["sub"], {})[r["code"]] = list(r["centroid"])
    books = [
        [books_map[s][c] for c in sorted(books_map[s])]
        for s in sorted(books_map)
    ]
    codes = spark.read.parquet(f"{index_path}/codes").select(
        F.col(p["id_col"]).alias("neighbor_id"), "codes"
    )
    vectors = spark.read.parquet(f"{index_path}/vectors").select(
        F.col(p["id_col"]).alias("neighbor_id"),
        F.col(p["vec_col"]).alias("cv"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    return _pq_adc_search(
        codes, vectors, qs, books, k=k, shortlist=shortlist
    )


def _query_band_probes(
    bands: int, bits_per_band: int, n_probe_bits: int
) -> "F.Column":
    """Query-side probe set over a ``lsh_sig`` column: the exact band
    value plus (optionally) every value one bit-flip away. Perturbation
    happens BEFORE the explode so it is one array literal per band, and
    only on the (tiny) query side."""
    if n_probe_bits not in (0, 1):
        raise ValueError(
            f"n_probe_bits supports 0 (exact buckets) or 1 (distance-1 "
            f"probes); got {n_probe_bits}"
        )
    mask = (1 << bits_per_band) - 1
    probes = [0]
    if n_probe_bits == 1:
        probes += [1 << b for b in range(bits_per_band)]
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.expr(
                    f"((lsh_sig >> {i * bits_per_band}) & {mask}) ^ {m}"
                ).alias("band_val"),
            )
            for i in range(bands)
            for m in probes
        ]
    )


def lsh_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: str | None = None,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    n_probe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share at least one LSH signature band.

    The 16-bit signature splits into 4 × 4-bit bands; query-corpus
    candidate generation is an equi-join on (band_id, band_value) instead
    of a cross join, then exact cosine ranks candidates. Queries with
    fewer than k candidates return fewer rows (the recall/efficiency
    trade — measured against :func:`cosine_topk` in tests).

    ``n_probe_bits=1`` enables MULTI-PROBE: the query side also probes
    every band value within Hamming distance 1 (a near-miss on one
    hyperplane sign is the common way a true neighbor lands one bucket
    over). Probing expands ONLY the query side of the join — the corpus
    index is built and shuffled once, unchanged — so the extra recall
    costs query-side fan-out (bands × (1 + bits_per_band) keys per
    query), not a second corpus pass or more index memory; the classic
    multi-probe-vs-more-tables trade, and the right side of it at 100 TB
    where the corpus dominates. Measured at sf0.01: mean recall@5 0.35 →
    0.74 for +probe-side work only. ``n_probe_bits=0`` restores exact
    bucket probes.
    """
    sigs = lsh_signature(
        rebalance_for_compute(emb),
        vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed,
    )
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.expr(f"(lsh_sig >> {i * bits_per_band}) & {mask}").alias("band_val"),
            )
            for i in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.col(vec_col), F.explode(band_arr).alias("b")
    ).select(id_col, vec_col, "b.band_id", "b.band_val")

    q_band_arr = _query_band_probes(bands, bits_per_band, n_probe_bits)
    q_sigs = sigs.filter(query_filter) if query_filter else sigs
    qs = q_sigs.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(q_band_arr).alias("b"),
    ).select("query_id", "qv", "b.band_id", "b.band_val")
    corpus = banded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        "band_id",
        "band_val",
    )
    cands = (
        qs.join(corpus, ["band_id", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cands.withColumn("cos", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def write_ann_index(
    emb: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    target_files: int | None = None,
) -> None:
    """Materialize the corpus side of LSH ANN search once (the vector
    twin of :func:`..dedup.write_minhash_index`).

    A standing retrieval service answers query batches against a mostly
    static corpus; re-signing 100 TB of vectors per batch is the
    dominant cost of one-shot :func:`lsh_topk`. Two parquet artifacts:

    - ``banded``: (id, band_id, band_val) — the candidate-join index,
      4 small ints per vector per band, NO vector payload;
    - ``vectors``: (id, vec) — fetched by id only for the shortlist
      re-rank, so the wide column never rides the candidate shuffle.

    Hyperplane parameters are baked into a ``params`` artifact; probes
    with different (dim, n_planes, bands, seed) fail fast instead of
    silently probing the wrong buckets.
    """

    def _w(df: DataFrame, sub: str) -> None:
        if target_files is not None:
            df = df.coalesce(target_files)
        df.write.mode("overwrite").parquet(f"{path}/{sub}")

    sigs = lsh_signature(
        rebalance_for_compute(emb),
        vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed,
    )
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.expr(
                    f"(lsh_sig >> {i * bits_per_band}) & {mask}"
                ).alias("band_val"),
            )
            for i in range(bands)
        ]
    )
    _w(
        sigs.select(F.col(id_col), F.explode(band_arr).alias("b")).select(
            id_col, "b.band_id", "b.band_val"
        ),
        "banded",
    )
    _w(emb.select(F.col(id_col), F.col(vec_col)), "vectors")
    emb.sparkSession.createDataFrame(
        [(dim, n_planes, bands, seed, id_col, vec_col)],
        "dim int, n_planes int, bands int, seed int, "
        "id_col string, vec_col string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def lsh_topk_indexed(
    queries: DataFrame,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    n_probe_bits: int = 1,
) -> DataFrame:
    """:func:`lsh_topk` against a pre-built corpus index: only the query
    batch is signed per run; candidates come from the probe-exploded
    query side equi-joined to the stored ``banded`` artifact, and ONLY
    shortlisted neighbor ids fetch their vectors from the ``vectors``
    artifact for exact re-ranking — the wide embedding column never
    rides the candidate shuffle. Validates the baked-in hyperplane
    parameters and fails fast on mismatch.
    """
    spark = queries.sparkSession
    p = spark.read.parquet(f"{index_path}/params").collect()[0]
    got = (dim, n_planes, bands, seed)
    want = (p["dim"], p["n_planes"], p["bands"], p["seed"])
    if got != want:
        raise ValueError(
            f"ann index at {index_path} was built with (dim, n_planes, "
            f"bands, seed)={want}; probe requested {got}"
        )
    banded = spark.read.parquet(f"{index_path}/banded").select(
        F.col(p["id_col"]).alias("neighbor_id"), "band_id", "band_val"
    )
    vectors = spark.read.parquet(f"{index_path}/vectors").select(
        F.col(p["id_col"]).alias("neighbor_id"),
        F.col(p["vec_col"]).alias("cv"),
    )
    q_sigs = lsh_signature(
        queries, vec_col=vec_col, dim=dim, n_planes=n_planes, seed=seed
    )
    q_band_arr = _query_band_probes(bands, n_planes // bands, n_probe_bits)
    qs = q_sigs.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(q_band_arr).alias("b"),
    ).select("query_id", "qv", "b.band_id", "b.band_val")
    cands = (
        qs.join(banded, ["band_id", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id")
        .distinct()
    )
    scored = cands.join(vectors, "neighbor_id")
    cos = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("cos", F.round(cos, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization of an embedding column.

    The standard ANN memory trade: an int8 vector is 4× smaller than
    float32 (16× smaller than float64), which at 100 TB of embeddings is
    the difference between an index that fits executor memory and one
    that spills. Per-vector max-abs scaling: ``q = round(x / scale * Q)``
    with ``Q = 2^(bits-1) - 1``; dequantize as ``q * scale / Q``.

    Pure expression chain (``aggregate`` for the max-abs fold,
    ``transform`` for the element map) — no UDFs, replayable in ANSI SQL.
    Output: (id, scale, q_embedding array<int>). Zero vectors get
    scale 0 and all-zero codes.
    """
    q = (1 << (bits - 1)) - 1
    scale = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )
    out = df.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        scale.alias("__s"),
        F.col(vec_col).alias("__v"),
    )
    codes = F.transform(
        F.col("__v"),
        lambda x: F.when(F.col("__s") == 0, F.lit(0))
        .otherwise(F.round(x / F.col("__s") * q))
        .cast("int"),
    )
    return out.select(F.col(id_col), "scale", codes.alias("q_embedding"))


def linear_score(
    df: DataFrame,
    weights: list[float],
    *,
    bias: float = 0.0,
    vec_col: str = "embedding",
    out_col: str = "score",
) -> DataFrame:
    """Model inference at scan time: ``w . x + b`` over an embedding
    column as a pure expression chain — the fasttext-style linear-probe
    quality classifier a curation pipeline runs over every document, with
    no UDF and no shuffle, so the score filter pushes down like any other
    scan predicate.

    The dot product uses the same sequential ``aggregate`` fold as the
    similarity operators (``_sql_dot``), so an external engine folding in
    the same order reproduces the doubles; weights are embedded as one
    parsed array literal (no per-element py4j traffic).
    """
    dot = F.expr(_sql_dot(vec_col, _sql_vec(weights)))
    return df.withColumn(
        out_col, dot + F.lit(float(bias)).cast("double")
    )


def embedding_outliers(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    micro: int = 10**6,
    out_scale: int = 10**4,
    threshold_e4: int = 0,
) -> DataFrame:
    """Embedding-space curation gate: cosine of every vector against its
    LABEL's centroid, flagged as an outlier below ``threshold_e4`` (in
    ``1/out_scale`` units). Mislabeled / corrupted / off-distribution
    embeddings sit far from their group's mean direction.

    Engine-portable by construction: coordinates are integer-ized to
    micro-units first (``floor(x * micro + 0.5)`` — cosine is scale
    invariant), so the per-label per-dimension centroid sums are INTEGER
    sums (order-free), and every double op downstream is the same
    deterministic expression in Spark and the oracle.

    Plan: posexplode -> (label, pos) integer-sum aggregate (map-side
    combinable, one shuffle of label x dim rows), centroid arrays
    rebuilt with sort_array(collect_list) per label, broadcast back onto
    the corpus, cosine via zip_with/aggregate — the corpus itself never
    shuffles. Output: (id, label, cos_e4, is_outlier).
    """
    v_micro = F.expr(
        f"transform({vec_col}, x -> CAST(floor(x * {micro} + 0.5) AS DOUBLE))"
    )
    rows = emb.select(
        F.col(id_col), F.col(label_col), v_micro.alias("__v")
    )
    sums = (
        rows.select(
            label_col, F.posexplode(F.col("__v")).alias("__pos", "__x")
        )
        .groupBy(label_col, "__pos")
        .agg(
            F.sum(F.col("__x").cast("long")).alias("__s"),
        )
    )
    cents = sums.groupBy(label_col).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__pos, __s))), "
            "p -> CAST(p.__s AS DOUBLE))"
        ).alias("__c")
    )
    dot = "aggregate(zip_with(__v, __c, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    n1 = "sqrt(aggregate(transform(__v, x -> x * x), CAST(0 AS DOUBLE), (a, v) -> a + v))"
    n2 = "sqrt(aggregate(transform(__c, x -> x * x), CAST(0 AS DOUBLE), (a, v) -> a + v))"
    cos_e4 = F.expr(
        f"CAST(floor(({dot}) / (({n1}) * ({n2})) * {out_scale} + 0.5) AS BIGINT)"
    )
    return (
        rows.join(F.broadcast(cents), label_col)
        .select(
            F.col(id_col),
            F.col(label_col),
            cos_e4.alias("cos_e4"),
            (cos_e4 < F.lit(int(threshold_e4))).alias("is_outlier"),
        )
    )


def random_projection(
    df: DataFrame,
    out_dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "jl",
    micro: int = 10**6,
) -> DataFrame:
    """Johnson-Lindenstrauss random sign projection (Achlioptas 2001):
    reduce an embedding column to ``out_dim`` dimensions with a
    DETERMINISTIC pseudo-random ±1 matrix — the cheap pre-ANN
    dimensionality reduction (shrink vectors before LSH/IVF indexing)
    that preserves pairwise distances within the JL bound.

    Engine-portable by construction (the ``embedding_outliers``
    idiom): coordinates are integer-ized to micro-units first
    (``floor(x * micro + 0.5)`` — the projection is linear, so scaling
    commutes), and the sign matrix entry ``R[i][j] = ±1`` derives from
    the md5 parity of ``'<seed>|i|j'`` — a closed form any engine
    replays. Each output coordinate ``sum_i xm_i * R[i][j]`` is then
    an EXACT integer (order-free, no float fold anywhere). Consumers
    apply the JL scale ``1/sqrt(out_dim)`` (and ``1/micro``) when they
    need calibrated distances; cosine consumers need neither (scale
    invariance).

    Plan: one pure projection — a nested ``transform/aggregate``
    expression chain per row, zero UDF, zero shuffle, zero driver
    state; the matrix never materializes anywhere. Output:
    ``(id_col, dim, val_micro)`` via ``posexplode`` — row-per-
    coordinate keeps the frame canonicalizer-friendly and lets
    downstream pivot or re-assemble as needed.
    """
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1: {out_dim}")
    xm = (
        f"transform({vec_col}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {int(micro)} + 0.5) AS BIGINT))"
    )
    sign = (
        f"(CASE WHEN CAST(conv(substr(md5(concat('{seed}', '|', "
        f"CAST(i AS STRING), '|', CAST(j AS STRING))), 1, 15), 16, 10) "
        f"AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END)"
    )
    # integerize ONCE per row, then fold from the materialized array
    keyed = df.select(F.col(id_col), F.expr(xm).alias("__xm"))
    proj = (
        f"transform(sequence(0, {int(out_dim) - 1}), j -> "
        f"aggregate(sequence(0, size(__xm) - 1), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + element_at(__xm, i + 1) * {sign}))"
    )
    return keyed.select(
        F.col(id_col),
        F.posexplode(F.expr(proj)).alias("dim", "val_micro"),
    )
