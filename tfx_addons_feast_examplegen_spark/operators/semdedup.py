"""Semantic deduplication over an embedding column (SemDeDup-style).

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — public paper) removes
*semantic* duplicates — re-encodings, translations-of-boilerplate,
near-paraphrases — that no lexical dedup (exact / MinHash / SimHash —
``dedup.py``) can see, by thresholding cosine similarity in embedding
space. The published algorithm: k-means-cluster all embeddings, compute
pairwise cosine similarity WITHIN each cluster only, and for every
group of mutual near-duplicates keep the member with the LOWEST cosine
similarity to its cluster centroid (the least-"typical" exemplar,
preserving diversity).

Suppression rule (matching the paper's released triangular-matrix
implementation, which is parallel rather than sequential): order each
cluster by ``(centroid_sim ASC, id ASC)``; a row is SUPPRESSED iff some
row EARLIER in that order — kept or not — is within ``threshold``
cosine similarity. This is a pure join + aggregate, no iteration: the
earlier-than relation is exactly the ``doc_a < doc_b`` struct order of
the shared candidate-pair machinery.

Spark shape, chosen for the 100 TB case:
- clustering is the existing IVF coarse quantizer
  (``similarity.ivf_centroids`` — spherical k-means, only the
  ``n_clusters x dim`` matrix ever reaches the driver) and assignment
  is the constant-size-expression dot-product argmax
  (``similarity.ivf_assign`` — narrow projection, no shuffle);
- within-cluster pairs come from ``dedup._bucket_pairs`` on the
  cluster id — the same capped single-shuffle self-equi-join every
  pair-producer in this repo uses, so a degenerate giant cluster is
  bounded by ``max_cluster`` and observable/fail-fast instead of
  quadratic (k-means offers no size guarantee; the paper's 50k-cluster
  config exists precisely to keep clusters small);
- SIZING LAW: candidate pairs total ~``n²/n_clusters`` (uniform
  occupancy), so ``n_clusters`` must grow LINEARLY with the corpus to
  hold the pair stage flat — that is the paper's 50k-clusters-for-100M
  choice, measured in ``scripts/scale_probe_semdedup.py``. The
  counter-pressure is the assignment scan (``n * n_clusters * dim``
  inside one constant-size HOF expression): past the measured ~1-2k
  cluster wall, assignment auto-routes through the two-stage index
  (``similarity.ivf_assign_indexed`` — coarse-quantize the centroids
  themselves, probe a few super-cells; 13.3× measured at 4096 cells,
  see ``assign_via_index`` below);
- the pair payload carries ``(centroid_sim, id, vector)`` so the
  cosine test runs directly on the exploded candidates — no join back.
  At very high dim the vector dominates the one bucket shuffle; the
  ids-only + re-join alternative (PassJoin's shape, ``editdist.py``)
  trades that for two extra shuffles and wins only when
  ``dim * 8 >> row overhead`` — switch there if profiling says so.

Reference scope: the reference delegates all execution to BigQuery and
has no dedup surface (feast_component/executor.py:128-163); this
operator extends the Spark-native training-data inventory
(SURVEY.md §2.9) alongside the lexical dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _bucket_pairs

# ASSIGN_INDEX_AUTO_CELLS: the measured ~1-2k-cell wall past which
# "auto" routes assignment through the two-stage index — defined with
# the index machinery in .similarity, bound here as a module global so
# tests (and callers) can pin this operator's rule independently.
from .similarity import (
    ASSIGN_INDEX_AUTO_CELLS,
    _dot,
    _norm,
    ivf_assign,
    ivf_centroids,
)


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float,
    n_clusters: int = 16,
    seed: int = 42,
    refine_iters: int = 2,
    centroids: list[list[float]] | None = None,
    max_cluster: int = 10_000,
    observation=None,
    on_over_cap: str = "error",
    assign_via_index: bool | int | str = "auto",
) -> DataFrame:
    """Semantic near-duplicate suppression: one row per input row with
    ``cluster`` (assigned k-means cell), ``centroid_sim`` (cosine to
    that cell's centroid) and ``kept`` (false iff an earlier row in the
    cluster's ``(centroid_sim ASC, id ASC)`` order is within
    ``threshold`` cosine similarity).

    ``centroids`` short-circuits training (reuse a trained quantizer
    across corpus shards — the merge path a 100 TB run needs; cluster
    ids are then comparable across shards). ``threshold`` must be in
    (0, 1]: exact duplicates have cosine 1.0, so a threshold above 1
    would keep everything and silently disable the operator.

    Determinism: assignment and ``centroid_sim`` are pure functions of
    the vector (identical — or positively scaled — vectors land in the
    same cluster with the same centroid_sim), and the order tie-break
    is the unique id, so the kept set is deterministic — and, when the
    same ``centroids`` are passed back in, idempotent (re-running on
    the kept rows suppresses nothing: every survivor's earlier-
    neighbour set only shrinks; retraining the quantizer on the kept
    subset would instead re-draw the cluster boundaries).

    ``assign_via_index``: route assignment through
    ``similarity.ivf_assign_indexed`` (``True`` = on; an int sets
    ``n_probe_super``; ``False`` pins the flat scan). The default
    ``"auto"`` applies the measured rule (the ``pit_join`` auto-
    strategy precedent): the flat scan's ``n x n_clusters x dim`` cost
    is the wall past ~1-2k clusters (``docs/BENCH_NOTES_r11.md``
    probes: 4096 cells, 400k x 4096 -> assign 280 s flat vs 21 s
    indexed), so auto routes through the index once ``n_clusters``
    exceeds :data:`ASSIGN_INDEX_AUTO_CELLS` and keeps the exact flat
    argmax below it (where the index's two-stage overhead cannot pay
    for itself). The indexed assignment is still a pure function of
    the vector, so exact/scaled duplicate groups still co-cluster and
    their suppression is unchanged; only the cluster BOUNDARIES for
    non-duplicate vectors are approximate.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1: {n_clusters}")
    cents = centroids if centroids is not None else ivf_centroids(
        emb,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_clusters,
        seed=seed,
        refine_iters=refine_iters,
    )
    if any(len(c) == 0 for c in cents):
        raise ValueError("empty centroid in quantizer")

    if assign_via_index == "auto":
        # Measured rule (docs/BENCH_NOTES_r11.md): the flat scan wins
        # below the wall (no two-stage overhead), the index wins past
        # it (13.3x at 4096 cells). Resolve on the TRAINED cell count —
        # a short corpus can hand back fewer centroids than requested.
        assign_via_index = len(cents) > ASSIGN_INDEX_AUTO_CELLS
    elif isinstance(assign_via_index, str):
        raise ValueError(
            f"assign_via_index must be 'auto', bool, or int: {assign_via_index!r}"
        )
    if assign_via_index:
        from .similarity import ivf_assign_indexed

        nps = assign_via_index if isinstance(assign_via_index, int) and not isinstance(assign_via_index, bool) else 2
        assigned = ivf_assign_indexed(
            emb, cents, vec_col=vec_col, n_probe_super=nps, n_probe=1
        )
    else:
        assigned = ivf_assign(emb, cents, vec_col=vec_col, n_probe=1)
    # cosine to the assigned (unit-norm) centroid; zero vectors get
    # centroid_sim 0 rather than NULL/NaN so the order stays total.
    # The centroid reaches each row via a BROADCAST JOIN on the cell id
    # — NOT the element_at(<k x dim literal array>, cell + 1) spelling:
    # that embeds the whole quantizer in the expression tree, and past
    # ~1-2k cells the giant literal falls out of whole-stage codegen
    # into per-row interpreted evaluation (measured at 2048 x 256:
    # 72 s vs 5.6 s for this join on 60k rows — 13x, identical sums;
    # docs/BENCH_NOTES_r12.md). At the paper's 50k-cluster config the
    # literal would be 10^7-scale plan nodes — a driver wall, while
    # the centroid TABLE stays exactly what it is: k parameter rows,
    # broadcast once. (ivf_assign's argmax legitimately keeps the HOF
    # matrix — every cell is scored per row there, and the two-stage
    # index is its scale rung.)
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    cdf = emb.sparkSession.createDataFrame(
        cent_rows, "cell: int, __cent: array<double>"
    )
    norm = _norm(F.col(vec_col))
    c_sim = F.when(
        norm > 0, _dot(F.col(vec_col), F.col("__cent")) / norm
    ).otherwise(F.lit(0.0))
    # The vector's L2 norm is also materialized per ROW (``__vnorm``):
    # the pair verify below needs each endpoint's norm, and evaluating
    # it once per vector instead of once per PAIR side removes two of
    # the three interpreted-HOF array folds from every candidate pair
    # (measured 4.5 s -> 2.0 s on the sf0.1 pair stage; the same
    # double to the bit — the norm is a per-vector value, so hoisting
    # it cannot change the cosine).
    # scored has TWO consumers (the pair-candidate side and the final
    # verdict join-back), each of which would re-run the corpus scan +
    # assignment + centroid join — the decode-pin audit's defect class
    # (dedup._pin, FIFO-bounded; docs/BENCH_NOTES_r12.md).
    from .dedup import _pin

    scored = _pin(
        assigned.join(F.broadcast(cdf), "cell")
        .select("*", c_sim.alias("centroid_sim"), norm.alias("__vnorm"))
        .drop("__cent")
        .withColumnRenamed("cell", "cluster")
    )

    # candidate pairs within a cluster, earlier-order side first:
    # struct (centroid_sim, id, vec) compares lexicographically, so
    # doc_a < doc_b IS the paper's ordering (ties impossible past the
    # unique id; the vector field never participates in the compare)
    payload = F.struct(
        F.col("centroid_sim").alias("cs"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.col("__vnorm").alias("vn"),
    ).alias("__sd")
    banded = scored.select(F.col("cluster"), payload)
    # Guard the pair stage's PARALLELISM: AQE sizes the banded exchange
    # by its input bytes (a few MB of vectors), blind to the quadratic
    # within-cluster pair explode and the per-pair cosine that run in
    # the join's OUTPUT stage — measured at sf0.1 it coalesced the
    # whole verdict pipeline to ONE task and serialized ~2 s of cosine
    # CPU on one core of 32. An explicit partition count (the session's
    # shuffle-partitions scale knob, never a constant) is not
    # AQE-coalescible, and the single exchange is still shared by both
    # join sides (ReusedExchange), so no extra bytes move; parallelism
    # is bounded by the distinct cluster count either way.
    n_pair = int(
        scored.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    banded = banded.repartition(n_pair, "cluster")
    cand = _bucket_pairs(
        banded,
        ["cluster"],
        "__sd",
        max_size=max_cluster,
        observation=observation,
        on_over_cap=on_over_cap,
    )
    na, nb = F.col("doc_a.vn"), F.col("doc_b.vn")
    cos = F.when(
        (na > 0) & (nb > 0),
        _dot(F.col("doc_a.vec"), F.col("doc_b.vec")) / (na * nb),
    ).otherwise(F.lit(0.0))
    suppressed = (
        cand.filter(cos >= threshold)
        .select(F.col("doc_b.id").alias(id_col))
        .distinct()
    )
    return (
        scored.drop("__vnorm")
        .join(
            suppressed.select(
                F.col(id_col), F.lit(False).alias("kept")
            ),
            id_col,
            "left",
        )
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(True)))
    )


def _resolve_assign(assign_via_index, n_cells: int):
    """Shared "auto" resolution for the gate functions below (the
    semantic_dedup body keeps its own inline spelling — attested)."""
    if assign_via_index == "auto":
        return n_cells > ASSIGN_INDEX_AUTO_CELLS
    if isinstance(assign_via_index, str):
        raise ValueError(
            f"assign_via_index must be 'auto', bool, or int: {assign_via_index!r}"
        )
    return bool(assign_via_index)


def semantic_cell_index(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    assign_via_index: bool | str = "auto",
    max_cell: int | None = None,
    observation=None,
    on_over_cap: str = "drop",
) -> DataFrame:
    """Standing-corpus cell index for the streaming semantic gate:
    ``(corpus_id, corpus_vec, cell)`` — one row per corpus vector,
    assigned to its nearest cell of the shared quantizer. Built in
    BATCH; persist it beside the corpus and merge-append new keepers
    per ingest cycle (the ``simhash_band_index`` lifecycle, embedding
    edition). Cells are only comparable within one centroid set, so
    the SAME ``centroids`` must feed index build and stream probe.

    ``assign_via_index="auto"``: the measured routing rule
    (:data:`similarity.ASSIGN_INDEX_AUTO_CELLS`) — two-stage indexed
    assignment past the ~1k-cell wall, exact flat argmax below it.
    The RESOLVED route (flat vs indexed) is recorded in the ``cell``
    column's metadata (``{"assign_via_index": bool}``, which survives
    a parquet round-trip of the persisted index) because the gate's
    duplicate-never-missed guarantee requires build and probe to
    assign identically — flat and indexed assignment can place the
    same vector in different cells near cluster boundaries.
    :func:`semantic_gate_stream` validates it at probe time and fails
    loud on a mismatch, exactly as it already must share
    ``centroids``.

    Hot-cell cap (``max_cell``): k-means offers no cell-size
    guarantee, and a degenerate cell (an embedding-collapsed
    boilerplate cluster) fans out against EVERY matching stream row on
    the probe side, where no occupancy check can run — so, exactly as
    ``dedup.simhash_band_index`` does for hot bands, the cap is
    enforced HERE at build/merge time with the same no-silent-caps
    machinery: ``on_over_cap="drop"`` prunes over-cap cells via a
    broadcast anti-join on the per-cell count aggregate (recall
    degrades only for members of the dropped cell — retrain with more
    cells to recover them); ``"error"`` fails the build loudly on the
    first over-cap cell via a lazy in-plan ``assert_true`` conjunct;
    ``observation`` (a ``pyspark.sql.Observation``) records
    ``dropped_cells`` / ``max_cell_size`` through an eager metrics job
    (an in-plan CollectMetrics node rides a join subtree AQE can prune
    in exactly the readings that matter). ``max_cell=None`` (default)
    preserves the uncapped plan byte-for-byte.
    """
    if on_over_cap not in ("drop", "error"):
        raise ValueError(
            f"on_over_cap must be 'drop' or 'error': {on_over_cap!r}"
        )
    from .similarity import ivf_assign_indexed

    routed = _resolve_assign(assign_via_index, len(centroids))
    if routed:
        assigned = ivf_assign_indexed(emb, centroids, vec_col=vec_col, n_probe=1)
    else:
        assigned = ivf_assign(emb, centroids, vec_col=vec_col, n_probe=1)
    index = assigned.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("corpus_vec"),
        # resolved routing travels WITH the index (parquet-persistent
        # field metadata) so the probe can enforce the must-match rule
        F.col("cell").alias("cell", metadata={"assign_via_index": routed}),
    )
    if max_cell is None:
        return index
    sizes = index.groupBy("cell").agg(F.count(F.lit(1)).alias("__n"))
    if observation is not None:
        sizes.observe(
            observation,
            F.sum((F.col("__n") > max_cell).cast("long")).alias(
                "dropped_cells"
            ),
            F.max("__n").alias("max_cell_size"),
        ).count()
    over_cond = F.col("__n") > max_cell
    if on_over_cap == "error":
        over_cond = over_cond & F.assert_true(
            F.col("__n") <= max_cell,
            F.concat(
                F.lit(
                    f"semantic_cell_index: cell over cap ({max_cell}); size="
                ),
                F.col("__n").cast("string"),
            ),
        ).isNull()
    over = sizes.filter(over_cond).select("cell")
    return index.join(F.broadcast(over), "cell", "left_anti")


def semantic_gate_stream(
    stream_df: DataFrame,
    index_df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float,
    n_probe: int = 2,
    assign_via_index: bool | str = "auto",
) -> DataFrame:
    """Streaming ingest SEMANTIC near-dup gate: for each arriving
    embedding, the standing-corpus vectors with cosine similarity >=
    ``threshold`` — the embedding-space edition of
    ``dedup.neardup_gate_stream`` (re-encodings and near-paraphrases
    no lexical gate can see), completing the semdedup ingest loop:
    batch :func:`semantic_dedup` curates the corpus, this gate holds
    the live ingest against it.

    Everything is STATELESS per micro-batch: the arriving vector is
    assigned to its ``n_probe`` nearest cells (a narrow projection +
    explode — no aggregation, so Structured Streaming accepts it; the
    "auto" rule routes through the two-stage index past the measured
    cell wall, whose broadcast joins are stream-static and equally
    stateless), then a stream-static equi-join on ``cell`` against the
    index and the EXACT cosine predicate. Candidate recall follows
    IVF probing: a borderline neighbor in an unprobed cell can be
    missed, but exact and positively-scaled duplicates CO-ASSIGN
    (assignment is a pure function of direction), so a true duplicate
    of an indexed vector is never missed at any ``n_probe >= 1`` —
    the gate's pigeonhole-style guarantee. Degenerate hot cells are
    the index build's concern (re-train with more cells; k-means has
    no size guarantee), observable from the index frame itself.

    Build/probe routing must MATCH: the never-missed guarantee rests
    on the index build and the stream probe resolving cell assignment
    identically — flat vs indexed assignment can place the same vector
    in different cells near cluster boundaries, silently voiding
    co-assignment. :func:`semantic_cell_index` records its resolved
    route in the ``cell`` column's metadata; when present, this probe
    validates its own resolved route against it and raises on a
    mismatch (pin ``assign_via_index`` on one side to fix). An index
    built by hand without the metadata is accepted — the constraint
    then holds by documentation, as it already does for ``centroids``.

    Output: ``(id_col, corpus_id, cos)`` per match; a zero-norm
    vector matches nothing (cosine undefined -> no row).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1: {n_probe}")
    from .similarity import ivf_assign_indexed

    routed = _resolve_assign(assign_via_index, len(centroids))
    if "cell" in index_df.columns:
        built = index_df.schema["cell"].metadata.get("assign_via_index")
        if built is not None and bool(built) != routed:
            raise ValueError(
                "semantic_gate_stream: index was built with "
                f"assign_via_index={bool(built)} but the probe resolved "
                f"{routed}; flat and indexed assignment can disagree near "
                "cluster boundaries, voiding the co-assignment guarantee — "
                "pin assign_via_index identically on build and probe"
            )
    if routed:
        probed = ivf_assign_indexed(
            stream_df, centroids, vec_col=vec_col, n_probe=n_probe
        )
    else:
        probed = ivf_assign(stream_df, centroids, vec_col=vec_col, n_probe=n_probe)
    nq, nc = _norm(F.col(vec_col)), _norm(F.col("corpus_vec"))
    cos = _dot(F.col(vec_col), F.col("corpus_vec")) / (nq * nc)
    return (
        probed.join(index_df, "cell")
        .where((nq > 0) & (nc > 0) & (cos >= threshold))
        .select(
            F.col(id_col),
            F.col("corpus_id"),
            F.round(cos, 4).alias("cos"),
        )
    )
