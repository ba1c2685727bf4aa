"""Iterative graph algorithms over edge DataFrames: PageRank.

The engine's first *iterative* operator class: a driver-side loop of
declarative join/aggregate rounds (the classic Pregel-as-joins shape).
The per-iteration plan is one shuffle (contributions grouped by dst) +
one broadcast attachment (the dangling-mass scalar); ranks are
re-materialized each round via ``localCheckpoint`` so the lineage stays
O(1) deep instead of O(iterations) — without the pin, iteration k's
plan embeds k copies of the full join tree and both planning time and
recovery cost grow without bound. At cluster scale the same loop holds:
the rank frame is ~|V| rows (small next to edges), the edge frame is
scanned once per iteration with its partitioning reused, and nothing
ever funnels through the driver except two O(1) aggregates per round
(node count once, dangling mass per iteration) — parameters, not data.

Semantics: the standard damped PageRank with uniform dangling-mass
redistribution, so ``sum(rank) == 1`` is invariant every iteration::

    rank'(v) = (1-d)/N + d * ( sum_{u->v} rank(u)/outdeg(u)
                               + dangling_mass/N )

Reference scope: the reference has no graph surface (it composes
Feast/BigQuery exports, feast_component/executor.py:87-163); this
module is part of the Spark-native extension inventoried in
SURVEY.md §2.9 alongside graph_triangle_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string ("10485760b", "10MB", "-1")
    to bytes; bare numbers are bytes (Spark's own convention for these
    confs)."""
    s = str(v).strip().lower().removesuffix("b")
    if s and s[-1] in _SIZE_SUFFIX:
        return int(float(s[:-1]) * _SIZE_SUFFIX[s[-1]])
    return int(s)


def _pin_aqe(df: DataFrame, n_parts: int) -> DataFrame:
    """Eagerly pin ``df`` (localCheckpoint) with its physical layout
    VISIBLE to downstream plans, at the loop's common partition count.

    ``localCheckpoint`` records the executed plan's partitioning/
    ordering in its ``LogicalRDD`` — but an ``AdaptiveSparkPlan``
    reports them as unknown, so under AQE every checkpointed loop frame
    silently re-exchanges at each consumer (measured on the graph
    loops: the FULL edge frame re-shuffled once per round, and every
    O(|V|) state frame once per consumer). The checkpoint is EAGER, so
    disabling AQE for just this one materialization job is bounded and
    local; with it off, the pinned frame keeps the hash layout its own
    aggregates/joins already established, and each loop round's
    equi-joins become exchange-free co-partitioned merges.

    ``n_parts`` is the loop's shared partition count, derived ONCE per
    operator call from the edge frame's own AQE-sized materialization
    (see :func:`_pin_part`) — data-adaptive (a couple of partitions at
    test scale, thousands at corpus scale), never a constant. It is
    applied as ``spark.sql.shuffle.partitions`` for the pin job so that
    every frame in the loop lands on the SAME modulus and co-partitioning
    holds. What the loop gives up is AQE's runtime skew-splitting INSIDE
    the pinned jobs — which it could not apply against a fixed RDD
    layout on the other join side anyway.
    """
    spark = df.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def _pin_part(
    df: DataFrame, key: str, *, compute_dense: bool = False
) -> tuple[DataFrame, int]:
    """Pin a loop's EDGE frame hash-clustered + sorted on ``key`` and
    derive the loop's shared partition count from its actual size.

    ``compute_dense=True`` additionally floors the count at the
    session's shuffle-partitions scale knob, for loops whose per-round
    jobs re-PROCESS the whole pinned O(|E|) frame (kcore's semi-join
    peels: every round filters and re-aggregates the full edge frame,
    so a bytes-sized narrow layout serializes that compute — measured
    at sf0.1, counterbalanced: kcore 2.91 s narrow vs 2.57 s floored).
    Loops that move only O(|V|)/frontier state per round (sssp,
    pagerank, hits) keep the default narrow layout — for them the
    floor only multiplies per-stage task overhead (sssp measured
    2.48 s narrow vs 3.19 s floored). At corpus scale the AQE-derived
    count is far above the knob either way, so the flag is inert
    there.

    Two-step: first a plain AQE-on checkpoint — AQE's partition
    coalescing sizes the materialization to the data, so its partition
    count IS the data-adaptive answer ("how many ~advisory-sized
    partitions does this frame occupy") — then a keyed repartition to
    that count + in-partition sort + :func:`_pin_aqe`. Downstream
    sort-merge joins on ``key`` then skip both the exchange AND the
    sort on this side, every round. Returns ``(pinned, n_parts)``.

    The pre-checkpoint job scopes the session's
    ``coalescePartitions.minPartitionSize`` back up to the ADVISORY
    partition size: the session lowers that floor to 64k so that
    small-bytes/compute-DENSE SQL stages (the dedup pair explodes)
    keep their cores, but deriving a loop's layout count from a
    floor-inflated materialization hands every pinned round tens of
    near-empty partitions — measured on graph_hits at sf0.1 the loop
    ran 4.5 s with the floored count vs 2.6 s with the advisory-sized
    one (the ~20 loop stages pay per-task scheduling, and with AQE off
    inside the pin jobs nothing re-coalesces them). Loop rounds are
    shuffle-dominated, not per-row-compute-dominated, so the advisory
    target is the right sizing; at corpus scale both derivations give
    thousands of partitions and the scoping is inert.
    """
    spark = df.sparkSession
    floor_key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    advisory = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"
    )
    prev_floor = spark.conf.get(floor_key)
    spark.conf.set(floor_key, advisory)
    try:
        pre = df.localCheckpoint()
    finally:
        spark.conf.set(floor_key, prev_floor)
    n_parts = max(1, pre.rdd.getNumPartitions())
    if compute_dense:
        n_parts = max(
            n_parts, int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    pinned = _pin_aqe(
        pre.repartition(n_parts, F.col(key)).sortWithinPartitions(key),
        n_parts,
    )
    return pinned, n_parts


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    node_col: str = "node",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank every node of the directed graph ``edges[(src, dst)]``.

    Duplicate edges are collapsed (each distinct edge carries one unit
    of its source's outflow); NULL endpoints are dropped; dangling
    nodes (no out-edges) redistribute their mass uniformly. Returns
    ``(node_col, rank_col)`` with one row per distinct node.

    ``weight_col`` selects the weighted variant (the link-count /
    trust-score edition crawl graphs need): a source's outflow splits
    PROPORTIONALLY to edge weight — ``rank(u) * w(u,v) /
    sum_w(u)`` — instead of uniformly, parallel ``(src, dst)`` edges
    ACCUMULATE their weights, and NULL/non-positive weights drop with
    NULL endpoints (a zero-weight edge carries no outflow and must not
    count toward the split). With all-1 weights the arithmetic is
    bit-identical to the unweighted path (multiply by 1.0, divide by
    the same count), so the two variants are one code path.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0: {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1]: {damping}")

    if weight_col is None:
        e = (
            edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
            .where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
            .distinct()
            .withColumn("__w", F.lit(1.0))
        )
    else:
        e = (
            edges.select(
                F.col(src).alias("__s"),
                F.col(dst).alias("__d"),
                F.col(weight_col).cast("double").alias("__w"),
            )
            .where(
                F.col("__s").isNotNull()
                & F.col("__d").isNotNull()
                & (F.col("__w") > 0.0)
            )
            .groupBy("__s", "__d")
            .agg(F.sum("__w").alias("__w"))
        )
    deg = e.groupBy("__s").agg(F.sum("__w").alias("__deg"))
    # (src, dst, w, out-weight-sum) pinned once, hash-clustered + sorted
    # on the per-iteration join key (see _pin_part); every iteration
    # re-reads this materialized frame instead of re-running the
    # distinct+degree jobs, and never re-exchanges it.
    edges_deg, n_parts = _pin_part(e.join(deg, "__s"), "__s")
    # Node universe derived from the PINNED frame (the edge pipeline
    # used to run twice more just to list nodes), co-partitioned with
    # the loop's rank frames.
    nodes = _pin_aqe(
        edges_deg.select(F.col("__s").alias(node_col))
        .union(edges_deg.select(F.col("__d").alias(node_col)))
        .distinct(),
        n_parts,
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn(rank_col, F.lit(0.0))

    # The DANGLING-NODE SET is static (nodes with no out-edges don't
    # change as ranks do), so pin it once off the already-materialized
    # frames. The previous spelling anti-joined ranks against `deg`
    # inside the loop, and since neither `deg` nor `e` is pinned, every
    # iteration re-ran the full edge pipeline (scan + distinct +
    # aggregate) just to rebuild the same set — at corpus scale, one
    # full input scan per iteration for a constant.
    dang = _pin_aqe(
        nodes.join(
            edges_deg.select("__s"),
            nodes[node_col] == F.col("__s"),
            "left_anti",
        ),
        n_parts,
    )

    ranks = _pin_aqe(nodes.withColumn(rank_col, F.lit(1.0 / n)), n_parts)
    for _ in range(iterations):
        contribs = (
            edges_deg.join(ranks, edges_deg["__s"] == ranks[node_col])
            .groupBy("__d")
            .agg(
                F.sum(
                    F.col(rank_col) * F.col("__w") / F.col("__deg")
                ).alias("__contrib")
            )
        )
        # mass parked on dangling nodes (rank rows with no out-edges);
        # a 1-row aggregate attached by broadcast — never a collect.
        # Same row set as the old anti-join spelling, via the pinned set.
        dangling = (
            ranks.join(dang, node_col, "left_semi")
            .agg(F.coalesce(F.sum(rank_col), F.lit(0.0)).alias("__dmass"))
        )
        ranks = _pin_aqe(
            nodes.join(contribs, nodes[node_col] == contribs["__d"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                nodes[node_col],
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__contrib"), F.lit(0.0))
                        + F.col("__dmass") / F.lit(float(n))
                    )
                ).alias(rank_col),
            ),
            n_parts,
        )
    return ranks


def hits(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    node_col: str = "node",
    hub_col: str = "hub",
    auth_col: str = "authority",
    normalize: str = "end",
) -> DataFrame:
    """Kleinberg's HITS (1999): mutually-reinforcing hub and authority
    scores over the directed graph ``edges[(src, dst)]`` — the link-
    quality signal web-corpus curation uses beside PageRank (a good hub
    points at good authorities; a good authority is pointed at by good
    hubs).

    Update rule per iteration: ``auth(v) = sum_{u->v} hub(u)`` then
    ``hub(u) = sum_{u->v} auth(v)`` (authorities first, from the
    just-updated hubs — the standard ordering). Output is one row per
    distinct node with BOTH scores, each L2-normalized.

    ``normalize="end"`` (default): scores accumulate un-normalized —
    with the all-ones init every intermediate value is an exact
    integer (sums of products of integers), so the arithmetic is
    bit-reproducible across engines — and each vector is divided by
    its L2 norm once at the end. ``normalize="per_iteration"``
    re-scales after every half-step instead. The two are the SAME
    function of the graph: the updates are linear, so per-iteration
    normalization only multiplies by scalars, and the final L2
    normalization cancels any scalar — use per-iteration for graphs
    deep/dense enough that un-normalized integer growth (~lambda_max
    per round) would leave double's exact-integer range (2**53).

    Shape, per half-step: one equi-join of the O(|V|) score frame
    against the edge frame + one sum keyed on the receiving endpoint —
    the Pregel-as-joins shape shared with :func:`pagerank`, edges
    scanned once per half-step, scores re-materialized via
    ``localCheckpoint`` (O(1)-deep lineage). Norms are 1-row
    aggregates attached by broadcast, never a collect. Duplicate
    edges are collapsed; NULL endpoints are dropped.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    if normalize not in ("end", "per_iteration"):
        raise ValueError(
            f"normalize must be 'end' or 'per_iteration': {normalize!r}"
        )
    base = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .distinct()
    )
    # The edge frame is pinned ONCE, hash-clustered + sorted on __s
    # (see _pin_part) — every half-step re-reads this materialization.
    e_s, n_parts = _pin_part(base, "__s")
    nodes = _pin_aqe(
        e_s.select(F.col("__s").alias(node_col))
        .union(e_s.select(F.col("__d").alias(node_col)))
        .distinct(),
        n_parts,
    )
    # Measured auto-strategy for the half-step join (the pit_join
    # precedent; guide §3 "broadcast the side that fits"): the score
    # frame is O(|V|) rows of (id, double). When that provably fits
    # the session's broadcast threshold, each half-step joins the edge
    # frame against a BROADCAST of the scores — no sort, no exchange
    # on either side, and the second directional edge copy is never
    # built (its only purpose is giving the __d-keyed sort-merge join
    # a pinned layout). Past the threshold — the 100 TB regime, where
    # an O(|V|) broadcast would OOM the executors — the loop uses the
    # co-partitioned SMJ shape: a second pinned copy sorted on __d, so
    # the O(|E|) frame is never re-exchanged OR re-sorted inside the
    # loop and every half-step moves only the score frame. Strategy
    # changes the physical join only; the summed scores are identical.
    # 64 bytes/row is a deliberate over-estimate of (id + double +
    # row overhead), and the count is a 1-row scalar off the pinned
    # frame (parameters, not data).
    n_nodes = nodes.count()
    bcast_thresh = _size_bytes(
        edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    )
    bcast_scores = bcast_thresh > 0 and n_nodes * 64 <= bcast_thresh
    e_d = (
        e_s
        if bcast_scores
        else _pin_aqe(
            e_s.repartition(n_parts, F.col("__d")).sortWithinPartitions(
                "__d"
            ),
            n_parts,
        )
    )

    def _rescale(scores: DataFrame, col: str) -> DataFrame:
        norm = scores.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__norm")
        )
        return scores.crossJoin(F.broadcast(norm)).select(
            node_col,
            F.when(F.col("__norm") > 0, F.col(col) / F.col("__norm"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    def _push(scores: DataFrame, col: str, ef: DataFrame, edge_from: str,
              edge_to: str, out: str, pin: bool) -> DataFrame:
        # Sum the sending endpoint's score onto the receiving endpoint.
        # SPARSE frames throughout the loop: a node receiving nothing
        # is simply ABSENT instead of carrying an explicit 0 — absent
        # rows contribute exactly nothing to the next half-step's sums
        # (inner join drops them) and to any L2 norm, so every score
        # that IS computed is bit-identical to the dense spelling; the
        # zeros are reattached once at the end. This removes the
        # per-half-step left join back onto the node frame (one join +
        # its exchange per half-step, 2x iterations of them).
        #
        # ``pin`` checkpoints the half-step result. Mid-loop frames
        # with a SINGLE consumer (the next half-step, in "end" mode)
        # stay lazy: the loop has NO driver-side decisions (fixed
        # iteration count, unlike sssp/kcore's early-exit counts), so
        # in "end" mode every mid-loop half-step is single-consumer
        # and the whole 2x`iterations` join chain materializes in the
        # two END pins — one job each, no per-iteration checkpoint
        # writes of the O(|V|) score frame. Lineage stays bounded by
        # the iteration parameter, and the per-half-step exchanges are
        # unchanged (each groupBy still shuffles once; only the
        # materializations between them are gone).
        # "per_iteration" mode pins every half-step as before — its
        # rescale reads the frame twice (norm + values), and an
        # unpinned frame would recompute the push per consumer.
        s = F.broadcast(scores) if bcast_scores else scores
        summed = (
            ef.join(s, ef[edge_from] == s[node_col])
            .groupBy(edge_to)
            .agg(F.sum(col).alias(out))
            .withColumnRenamed(edge_to, node_col)
        )
        return _pin_aqe(summed, n_parts) if pin else summed

    # The all-ones init is a pure projection over the pinned node
    # frame: it has ONE consumer (the first push) and Project passes
    # the hash(node) layout through, so pinning it was a wasted
    # materialization job — stay lazy.
    hubs = nodes.withColumn(hub_col, F.lit(1.0))
    auths = None
    every = normalize == "per_iteration"
    for i in range(iterations):
        last = i == iterations - 1
        auths = _push(hubs, hub_col, e_s, "__s", "__d", auth_col,
                      pin=every or last)
        if normalize == "per_iteration":
            auths = _rescale(auths, auth_col)
        hubs = _push(auths, auth_col, e_d, "__d", "__s", hub_col,
                     pin=every or last)
        if normalize == "per_iteration":
            hubs = _rescale(hubs, hub_col)
    # reattach the implicit zeros (nodes never reached by a push) and
    # L2-normalize once — same arithmetic as the dense loop: absent
    # rows never contributed to sums or norms there either.
    out_h = _rescale(hubs, hub_col)
    out_a = _rescale(auths, auth_col)
    return (
        nodes.join(out_h, node_col, "left")
        .join(out_a, node_col, "left")
        .select(
            node_col,
            F.coalesce(F.col(hub_col), F.lit(0.0)).alias(hub_col),
            F.coalesce(F.col(auth_col), F.lit(0.0)).alias(auth_col),
        )
    )


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iterations: int = 2,
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """SYNCHRONOUS label propagation communities (Raghavan, Albert &
    Kumara 2007): every node starts with its own id as label; each
    round every node adopts the most frequent label among its
    in-neighbors' PREVIOUS labels, smallest label on ties, keeping its
    previous label when it has no in-neighbors. Pass a symmetrized
    edge list for the paper's undirected semantics.

    ``weight_col`` selects the weighted variant (Barber & Clark 2009's
    natural generalization): a vote counts its edge weight instead of
    1, so communities from a dedup-cluster graph can honor evidence
    strength (e.g. shared-shingle counts). Parallel ``(src, dst)``
    edges ACCUMULATE — their weights sum into one vote — and the
    tie-break stays (max total weight, then smallest label). Exact
    determinism holds for integral weights (long sums); float weights
    are deterministic given exact inputs but carry the usual
    summation-order caveat, so prefer counts.

    Deliberately the synchronous variant with a total tie-break: the
    asynchronous one (and random tie-breaks) are order-dependent, and
    a nondeterministic answer can neither be oracle-checked nor
    reproduced across retries — the same determinism rule every other
    operator here follows. Label oscillation on bipartite structure —
    the known cost of synchronous updates — is bounded by running a
    fixed iteration count rather than to convergence.

    Shape, per round: one score-frame × edge-frame equi-join, one
    (node, label) count aggregate, one row_number pick — the
    Pregel-as-joins shape shared with :func:`pagerank`/:func:`hits`;
    labels re-materialize via ``localCheckpoint`` (O(1) lineage),
    nothing reaches the driver. State is O(|V|) rows per round.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    from pyspark.sql import Window

    if weight_col is None:
        e = (
            edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
            .where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
            .distinct()
            .withColumn("__w", F.lit(1).cast("long"))
            .localCheckpoint()
        )
    else:
        # parallel edges accumulate; NULL weights drop with NULL ends
        e = (
            edges.select(
                F.col(src).alias("__s"),
                F.col(dst).alias("__d"),
                F.col(weight_col).alias("__w"),
            )
            .where(
                F.col("__s").isNotNull()
                & F.col("__d").isNotNull()
                & F.col("__w").isNotNull()
            )
            .groupBy("__s", "__d")
            .agg(F.sum("__w").alias("__w"))
            .localCheckpoint()
        )
    nodes = (
        e.select(F.col("__s").alias(node_col))
        .union(e.select(F.col("__d").alias(node_col)))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.withColumn(label_col, F.col(node_col)).localCheckpoint()
    w = Window.partitionBy("__d").orderBy(
        F.desc("__c"), F.asc(label_col)
    )
    for _ in range(iterations):
        votes = (
            e.join(labels, e["__s"] == labels[node_col])
            .groupBy("__d", label_col)
            .agg(F.sum("__w").alias("__c"))
        )
        picked = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("__d"), F.col(label_col).alias("__new"))
        )
        labels = (
            labels.join(picked, labels[node_col] == picked["__d"], "left")
            .select(
                labels[node_col],
                F.coalesce(F.col("__new"), labels[label_col]).alias(
                    label_col
                ),
            )
            .localCheckpoint()
        )
    return labels


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 10,
    node_col: str = "node",
    level_col: str = "level",
) -> DataFrame:
    """Minimum hop count from any seed, by frontier expansion — the
    reachability half of the graph family (PageRank weighs, BFS
    measures distance; crawl pipelines use the level as a quality
    signal: depth-from-seed-domains).

    Semantics: ``level(v) = min`` number of directed ``src -> dst``
    edges on any path from a seed; seeds are level 0 (whether or not
    they appear in the edge list); nodes unreachable within
    ``max_hops`` are absent from the output. NULL endpoints and NULL
    seeds are dropped; duplicate edges and seeds are collapsed.

    Shape, per round: one equi-join of the CURRENT FRONTIER against
    the edge frame (the frontier is the small side — broadcastable
    when narrow), one distinct, one left-anti join against the visited
    set to keep the frontier monotonically shrinking toward the
    unreached region. Frontier and visited frames re-materialize via
    ``localCheckpoint`` each round (O(1)-deep lineage, same rationale
    as :func:`pagerank`); the only driver-side value per round is the
    frontier count used for early termination — a parameter, not data.
    Rounds are bounded by ``max_hops``, state by ``O(|V|)`` rows.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0: {max_hops}")
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    visited = (
        seeds.select(F.col(seed_col).alias(node_col))
        .where(F.col(seed_col).isNotNull())
        .distinct()
        .withColumn(level_col, F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select(node_col)
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[node_col] == e["__s"])
            .select(F.col("__d").alias(node_col))
            .distinct()
            .join(visited.select(node_col), node_col, "left_anti")
            .withColumn(level_col, F.lit(hop))
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt.select(node_col)
    return visited


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "weight",
    seed_col: str = "node",
    max_rounds: int = 10,
    node_col: str = "node",
    dist_col: str = "dist",
    pre_collapsed: bool = False,
) -> DataFrame:
    """Weighted single-source (multi-seed) shortest paths by
    bounded-round Bellman-Ford — the weighted half of the distance leg
    (:func:`bfs_levels` counts hops; crawl/curation graphs carry edge
    weights: link counts, similarity, latency).

    Semantics: ``dist(v) = min`` total weight over directed paths from
    any seed using at most ``max_rounds`` edges; seeds are distance 0;
    nodes unreachable within the bound are absent. NULL endpoints,
    NULL weights and NULL seeds are dropped; parallel edges collapse
    to their MINIMUM weight (the only one a shortest path can use).
    Weights are taken as given — with non-negative weights and
    ``max_rounds >= |V|-1`` this is exact Bellman-Ford; smaller bounds
    give the standard hop-limited relaxation (deterministic either
    way, which is what makes the answer oracle-checkable).

    Shape, per round: one equi-join of the CURRENT improvement
    frontier against the edge frame, one ``min`` aggregate keyed on
    the destination (map-side combinable — the round's candidate
    relaxations pre-combine before the shuffle), one join against the
    running best to keep only STRICT improvements — so the frontier
    shrinks toward convergence and a settled region costs nothing.
    Best/frontier re-materialize via ``localCheckpoint`` (O(1)
    lineage, the :func:`pagerank` rationale); the only driver-side
    value per round is the improvement count used for early
    termination. State is ``O(|V|)`` rows; rounds ≤ ``max_rounds``.
    """
    if max_rounds < 0:
        raise ValueError(f"max_rounds must be >= 0: {max_rounds}")
    e = edges.select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__d"),
        F.col(weight_col).cast("double").alias("__w"),
    ).where(
        F.col("__s").isNotNull()
        & F.col("__d").isNotNull()
        & F.col("__w").isNotNull()
    )
    if not pre_collapsed:
        # ``pre_collapsed=True`` is the caller's certificate that
        # parallel (src, dst) edges are already collapsed to their
        # minimum weight (e.g. the feeding query just ran the same
        # groupBy) — min over singleton groups is the identity, so
        # skipping the re-aggregation removes one full exchange of the
        # edge frame without changing a single distance.
        e = e.groupBy("__s", "__d").agg(F.min("__w").alias("__w"))
    # Pin the edge frame hash-clustered + sorted on the frontier join
    # key (see _pin_part): the O(|E|) frame is exchanged once here
    # instead of once per round, and every loop frame shares n_parts so
    # the frontier join and the best/cand merge are co-partitioned,
    # exchange-free merges — each round's only exchange is the small
    # candidate min-aggregate.
    e, n_parts = _pin_part(e, "__s")
    best = _pin_aqe(
        seeds.select(F.col(seed_col).alias(node_col))
        .where(F.col(seed_col).isNotNull())
        .distinct()
        .withColumn(dist_col, F.lit(0.0)),
        n_parts,
    )
    frontier = best
    # Measured broadcast rule for the frontier side (the hits phase-4
    # auto-strategy): the previous round's Observation improvement
    # count IS the next frontier's exact row count, so the size test
    # is free — a frontier provably under the session broadcast
    # threshold is broadcast (the edge frame then streams in place:
    # no exchange, no sorts on either side), anything bigger keeps the
    # co-partitioned merge. Round 1's frontier (the seed set) has no
    # prior count and uses the merge path. Physical strategy only —
    # the relaxed distances are identical.
    bcast_thresh = _size_bytes(
        edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    )
    frontier_rows = None
    for _ in range(max_rounds):
        f = (
            F.broadcast(frontier)
            if (
                frontier_rows is not None
                and bcast_thresh > 0
                and frontier_rows * 64 <= bcast_thresh
            )
            else frontier
        )
        cand = (
            f.join(e, f[node_col] == e["__s"])
            .select(
                F.col("__d").alias(node_col),
                (F.col(dist_col) + F.col("__w")).alias("__nd"),
            )
            .groupBy(node_col)
            .agg(F.min("__nd").alias("__nd"))
        )
        # ONE checkpoint per round (was two: improved, then the best
        # merge): the full-outer merge carries an __imp flag marking
        # strict improvements, so the merged frame serves all three
        # per-round consumers — the early-exit count, the next round's
        # frontier (filter on the flag), and the running best (drop
        # the flag). Values are identical to the two-step spelling:
        # the least/coalesce merge of a non-improving candidate keeps
        # the old dist, exactly what excluding it from `improved`
        # produced. The early-exit count rides the checkpoint job
        # itself as an Observation metric (one map-side sum collected
        # by the materialization's listener) instead of a second
        # per-round count job over the materialized blocks — with AQE
        # off inside the pin job the CollectMetrics node cannot be
        # pruned, and it passes partitioning through, so the loop's
        # co-partitioned merges are unchanged.
        merged = (
            best.join(cand, node_col, "full_outer")
            .select(
                F.col(node_col),
                F.least(
                    F.coalesce(F.col(dist_col), F.col("__nd")),
                    F.coalesce(F.col("__nd"), F.col(dist_col)),
                ).alias(dist_col),
                (
                    F.col("__nd").isNotNull()
                    & (
                        F.col(dist_col).isNull()
                        | (F.col("__nd") < F.col(dist_col))
                    )
                ).alias("__imp"),
            )
        )
        obs = Observation()
        merged = _pin_aqe(
            merged.observe(
                obs,
                F.coalesce(
                    F.sum(F.col("__imp").cast("long")), F.lit(0)
                ).alias("__n_imp"),
            ),
            n_parts,
        )
        n_imp = obs.get["__n_imp"]
        if n_imp == 0:
            best = merged.drop("__imp")
            break
        best = merged.drop("__imp")
        frontier = merged.where(F.col("__imp")).select(node_col, dist_col)
        frontier_rows = n_imp  # exact: the flag filter keeps n_imp rows
    return best


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 6,
    damping: float = 0.85,
    node_col: str = "node",
    rank_col: str = "rank",
) -> DataFrame:
    """Personalized PageRank (Page et al. 1999 §6's personalized
    teleport; the crawl-seeding / topic-affinity workhorse): identical
    recurrence to :func:`pagerank` except the teleport vector — and
    the dangling-mass redistribution — concentrate on the SEED set
    instead of spreading uniformly::

        rank'(v) = (1-d) * p(v) + d * ( sum_{u->v} rank(u)/outdeg(u)
                                        + dangling_mass * p(v) )

    with ``p(v) = 1/|S|`` for seeds, else 0, and ``rank0 = p`` — so
    ``sum(rank) == 1`` stays invariant and rank mass decays with
    distance from the seeds (the "relevance to these trusted domains"
    signal a curation pipeline ranks crawl hosts by).

    Same physical shape as :func:`pagerank`: the per-iteration plan is
    one contributions shuffle keyed on the receiving node plus a 1-row
    dangling-mass broadcast; the seed indicator rides the pinned node
    frame as one extra column, so personalization costs NOTHING over
    the uniform operator. Nodes mentioned only in ``seeds`` (isolated
    from the edge list) still hold their teleport share — they join
    the node universe rather than silently dropping.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0: {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1]: {damping}")
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .distinct()
    )
    s = (
        seeds.select(F.col(seed_col).alias(node_col))
        .where(F.col(seed_col).isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("__s").alias(node_col))
        .union(e.select(F.col("__d").alias(node_col)))
        .union(s.select(node_col))
        .distinct()
        .join(s.withColumn("__is_seed", F.lit(True)), node_col, "left")
        .select(
            F.col(node_col), F.coalesce("__is_seed", F.lit(False)).alias("__seed")
        )
        .localCheckpoint()
    )
    ns = nodes.where(F.col("__seed")).count()
    if ns == 0:
        raise ValueError("personalized_pagerank requires >= 1 seed")
    p = F.when(F.col("__seed"), F.lit(1.0 / ns)).otherwise(F.lit(0.0))

    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    edges_deg = e.join(deg, "__s").localCheckpoint()

    ranks = nodes.select(
        node_col, "__seed", p.alias(rank_col)
    ).localCheckpoint()
    for _ in range(iterations):
        contribs = (
            edges_deg.join(ranks, edges_deg["__s"] == ranks[node_col])
            .groupBy("__d")
            .agg(F.sum(F.col(rank_col) / F.col("__deg")).alias("__contrib"))
        )
        dangling = (
            ranks.join(deg, ranks[node_col] == deg["__s"], "left_anti")
            .agg(F.coalesce(F.sum(rank_col), F.lit(0.0)).alias("__dmass"))
        )
        ranks = (
            nodes.join(contribs, nodes[node_col] == contribs["__d"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                nodes[node_col],
                nodes["__seed"],
                (
                    F.lit(1.0 - damping) * p
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__contrib"), F.lit(0.0))
                        + F.col("__dmass") * p
                    )
                ).alias(rank_col),
            )
            .localCheckpoint()
        )
    return ranks.select(node_col, rank_col)


def kcore(
    edges: DataFrame,
    *,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 10,
    node_col: str = "node",
    degree_col: str = "degree",
    pre_distinct: bool = False,
) -> DataFrame:
    """K-core decomposition by iterative peeling (Seidman 1983; the
    link-graph quality filter: the k-core is the maximal subgraph
    where every node keeps >= k neighbors AFTER all weaker nodes are
    removed — spam farms and orphan pages peel away, densely
    interlinked hubs survive). Pass a symmetrized edge list for the
    standard undirected semantics; out-degree then equals degree.

    Returns ``(node_col, degree_col)``: the nodes surviving
    ``max_rounds`` peels with their degree in the surviving subgraph.
    With enough rounds this is the exact k-core (peeling is monotone:
    once no node falls below k the subgraph is a fixed point, so extra
    rounds are no-ops and the early exit below is semantics-free).

    Shape, per round: one map-side-combinable degree aggregate + two
    semi-joins filtering edges to surviving endpoints; the edge frame
    re-materializes via ``localCheckpoint`` (O(1) lineage) and SHRINKS
    monotonically, so later rounds cost less, not more. The only
    driver-side value per round is the dropped-node count used for
    early exit. NULL endpoints drop; duplicate and self edges are
    discarded (a self-loop would let a node certify itself into the
    core).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1: {max_rounds}")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).where(
        F.col("__s").isNotNull()
        & F.col("__d").isNotNull()
        & (F.col("__s") != F.col("__d"))
    )
    if not pre_distinct:
        # ``pre_distinct=True``: the caller certifies the (src, dst)
        # pairs are already distinct (e.g. the feeding query just ran
        # DISTINCT before symmetrizing with disjoint key spaces), so
        # the re-dedup exchange is a provable no-op and is skipped.
        # Degrees and the peeling fixpoint are unchanged.
        e = e.distinct()
    # Pin the edge frame hash-clustered + sorted on __s (see _pin_part):
    # the initial degree aggregate and the first peel's __s semi-join
    # cluster on it with no exchange of their own, and every loop frame
    # shares n_parts so the alive semi-joins stay co-partitioned.
    # compute_dense: every peel round re-filters and re-aggregates the
    # FULL pinned edge frame, so the loop keeps the session's
    # parallelism floor (see _pin_part; measured 2.91 -> 2.57 s).
    e, n_parts = _pin_part(e, "__s", compute_dense=True)
    bcast_thresh = _size_bytes(
        edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
    )
    deg = e.groupBy(F.col("__s").alias(node_col)).agg(
        F.count(F.lit(1)).alias(degree_col)
    )
    for _ in range(max_rounds):
        # Pin the O(|V|) degree frame once per round: it feeds the
        # early-exit count, the alive filter AND (on the last peel)
        # the returned frame — unpinned, the count job and the
        # semi-join job each re-ran the full degree aggregate over the
        # edge frame (two identical shuffles per round for one
        # result). The dropped count rides the pin job itself as an
        # Observation metric (the sssp pattern: AQE is off inside the
        # pin, so the CollectMetrics node cannot be pruned, and it
        # passes partitioning through) — no separate count job.
        obs = Observation()
        deg = _pin_aqe(
            deg.observe(
                obs,
                F.coalesce(
                    F.sum((F.col(degree_col) < k).cast("long")), F.lit(0)
                ).alias("__n_dropped"),
                F.count(F.lit(1)).alias("__n_total"),
            ),
            n_parts,
        )
        metrics = obs.get
        dropped = metrics["__n_dropped"]
        if dropped == 0:
            break
        alive = deg.where(F.col(degree_col) >= k).select(node_col)
        # The alive set's exact row count is free off the same
        # Observation (total - dropped), so the semi-joins take the
        # measured broadcast rule (the hits phase-4 auto-strategy): an
        # alive set provably under the session broadcast threshold is
        # broadcast into BOTH semi-joins — the edge frame then streams
        # in place with no exchange on either side (the __d semi would
        # otherwise re-key it every peel). Past the threshold the
        # merge path stands. Survivors are identical either way.
        alive_rows = metrics["__n_total"] - dropped
        a = (
            F.broadcast(alive)
            if bcast_thresh > 0 and alive_rows * 64 <= bcast_thresh
            else alive
        )
        # __d semi first, __s semi last: the surviving frame then pins
        # hash-clustered on __s, so the rebuilt degree aggregate below
        # needs no exchange at all (and the alive side is already
        # clustered on node from the pinned deg frame).
        e = _pin_aqe(
            e.join(a, e["__d"] == a[node_col], "left_semi")
            .join(a, F.col("__s") == a[node_col], "left_semi"),
            n_parts,
        )
        deg = e.groupBy(F.col("__s").alias(node_col)).agg(
            F.count(F.lit(1)).alias(degree_col)
        )
    return deg.where(F.col(degree_col) >= k)


def degree_assortativity(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002, the
    networkx-convention Pearson correlation of the degrees at either
    end of each directed edge) — the one-number structural QA a crawl
    graph gets before link-based curation: strongly negative values
    flag hub-and-spoke (bipartite/spammy) structure, positive values
    social-network-like degree mixing. The input CONTRACT is a
    symmetrized edge list (undirected semantics; degree is then
    out-degree): a destination node with no out-edges — impossible
    after symmetrization — fails LOUD in-plan rather than skewing the
    statistic with a fabricated degree (ADVICE r14).

    Returns ONE row ``(n_nodes, n_edges, assortativity)``;
    ``assortativity`` is NULL when a degree side is constant (the
    correlation is undefined — e.g. a perfect cycle). Duplicate edges
    collapse; NULL endpoints and self-loops drop.

    Plan shape: one distinct + one map-side-combinable degree
    aggregate, then the edge frame re-joins the degree frame on each
    endpoint (two shuffle equi-joins — both sides keyed on a node id,
    AQE-balanced) feeding a single ``corr`` aggregate: corpus-sized
    work is two joins and one pass, nothing iterative, nothing on the
    driver.
    """
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .where(
            F.col("__s").isNotNull()
            & F.col("__d").isNotNull()
            & (F.col("__s") != F.col("__d"))
        )
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy(F.col("__s").alias("__n")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    joined = (
        e.join(deg.withColumnRenamed("__n", "__s"), "__s")
        .withColumnRenamed("__deg", "__ds")
        .join(
            deg.withColumnRenamed("__n", "__d").withColumnRenamed(
                "__deg", "__dd"
            ),
            "__d",
            "left",
        )
        .select(
            F.col("__ds").cast("double").alias("__x"),
            # symmetrized-input contract, enforced LOUD (ADVICE r14): a
            # destination with no out-edges only exists on DIRECTED
            # input, where correlating against a fabricated 0 (or
            # silently dropping the edge) yields a plausible-looking
            # but wrong coefficient — networkx's directed default is
            # out-in, a different statistic. Fail in-plan instead.
            F.when(F.col("__dd").isNotNull(), F.col("__dd"))
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "degree_assortativity: destination node %s has no"
                        " out-edges — the input is directed, but this"
                        " operator's contract is a SYMMETRIZED"
                        " (undirected) edge list; symmetrize first or"
                        " use a directed out-in variant",
                        F.col("__d").cast("string"),
                    )
                ).cast("long")
            )
            .cast("double")
            .alias("__y"),
        )
    )
    nodes = e.select(F.col("__s").alias("n")).union(
        e.select(F.col("__d").alias("n"))
    )
    n_nodes = nodes.distinct().count()
    # guarded co-moment spelling, not corr(): under ANSI mode corr()
    # raises DIVIDE_BY_ZERO on a constant side (e.g. a perfect cycle,
    # where every degree is equal); the contract is NULL there. The
    # (n-1) sample factors cancel in the ratio, so this equals corr().
    cov = F.covar_pop("__x", "__y")
    sx = F.stddev_pop("__x")
    sy = F.stddev_pop("__y")
    return joined.agg(
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.count(F.lit(1)).alias("n_edges"),
        F.round(
            F.when((sx > 0) & (sy > 0), cov / (sx * sy)), 6
        ).alias("assortativity"),
    )
