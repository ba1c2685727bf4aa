"""Composed corpus-preparation pipeline for training data.

The north-star use case end-to-end: documents -> quality gate -> exact
dedup -> near-duplicate removal -> surviving corpus (+ survivorship
report). Pure composition of the engine's operators, so the whole
pipeline is one Catalyst plan — filters push into the scan, each dedup
stage shuffles on its own key, nothing materializes in between.

Near-duplicate policy options:

- :func:`prepare_corpus` (default): greedy id-based — drop any document
  that pairs (Jaccard >= threshold) with ANY lower-id document. Simple,
  deterministic, single anti-join; the rule an external SQL oracle can
  replicate exactly.
- :func:`duplicate_clusters`: principled connected components over the
  near-dup pair graph via distributed min-label propagation (iterative;
  converges in O(log n) rounds on real dup clusters, which are tiny).
  Keep one representative (min id) per cluster.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import jaccard_pairs, minhash_lsh_pairs
from .text import quality_score


def prepare_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    ngram: int = 3,
    use_lsh: bool = True,
) -> DataFrame:
    """Filter + dedup a documents table; returns surviving rows with
    quality columns attached.

    Stages: (1) quality gate (pure-expression scoring at scan time);
    (2) exact dedup — keep min id per md5(text); (3) near-dup removal —
    drop ids that pair with any smaller id at ``jaccard_threshold``
    (LSH-accelerated candidate generation by default; exact shingle
    self-join when ``use_lsh=False``).
    """
    scored = quality_score(docs, text_col)
    quality_ok = scored.filter(F.col("quality_score") >= min_quality)

    # exact dedup: survivors are the min-id representative per content
    canon = (
        quality_ok.groupBy(F.md5(F.col(text_col)).alias("__fp"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    exact_kept = quality_ok.join(canon, id_col)

    pair_fn = minhash_lsh_pairs if use_lsh else jaccard_pairs
    pairs = pair_fn(
        exact_kept, id_col, text_col, n=ngram, threshold=jaccard_threshold
    )
    # greedy near-dup rule: doc_b of every pair dies (doc_a < doc_b)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return exact_kept.join(losers, id_col, "left_anti")


def survivorship_report(
    docs: DataFrame, kept: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One-row report: input/kept/dropped counts."""
    n_in = docs.select(F.count(F.lit(1)).alias("n_input"))
    n_kept = kept.select(F.count(F.lit(1)).alias("n_kept"))
    return n_in.crossJoin(n_kept).select(
        "n_input",
        "n_kept",
        (F.col("n_input") - F.col("n_kept")).alias("n_dropped"),
    )


def duplicate_clusters(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    ngram: int = 3,
    max_iters: int = 22,
) -> DataFrame:
    """Connected components of the near-duplicate graph.

    Distributed min-label propagation: every node starts labeled with its
    own id; each round, every node adopts the minimum label in its
    neighborhood (including itself); converged when no label changes.
    Real duplicate clusters have tiny diameters, so this terminates in a
    few rounds; ``max_iters`` bounds pathological chains.

    Output: (id, cluster) for every document that appears in at least
    one near-dup pair; cluster = min doc id of its component.
    """
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, n=ngram, threshold=jaccard_threshold
    ).select("doc_a", "doc_b")
    return connected_components(pairs, id_col=id_col, max_iters=max_iters)


def connected_components(
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_iters: int = 22,
    telemetry: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair frame
    (doc_a, doc_b) — the propagation loop of :func:`duplicate_clusters`,
    reusable for ANY near-dup edge source (text LSH pairs, embedding
    cosine pairs, URL-equality pairs). Output: (id_col, cluster) for
    every node appearing in at least one pair.

    Pass a ``telemetry`` dict to receive ``{"rounds": n, "converged":
    bool}`` (also logged at INFO): on a pathological 100 TB graph the
    iteration count is the early-warning signal — a rounds count
    creeping toward ``max_iters`` means component diameter is growing
    toward the 2^max_iters pointer-doubling bound, observable here
    instead of as a sudden convergence failure (the no-silent-caps
    doctrine applied to the iterative loop).
    """
    pairs = pairs.select("doc_a", "doc_b")

    # undirected edge list, both directions
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).cache()

    # Per-iteration localCheckpoint, NOT cache: each round's plan embeds
    # the previous round's TWICE (the pointer-doubling hop self-join), so
    # without lineage truncation the logical plan — and analyzer time —
    # doubles per round. The checkpoint flattens each round to a
    # LogicalRDD scan; storage is freed by the ContextCleaner when the
    # superseded round's frame is garbage-collected.
    labels = (
        edges.select(F.col("doc_a").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.id)
            .groupBy(F.col("doc_a").alias("id"))
            .agg(F.min("cluster").alias("nbr_min"))
        )
        propagated = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("cluster"), F.coalesce(F.col("nbr_min"), F.col("cluster"))
            ).alias("cluster"),
        )
        # Pointer doubling: every label is itself a node id, and labels
        # only ever decrease (min-propagation from an identity init), so
        # hopping once through the label table (cluster -> label(cluster))
        # compresses chains and convergence needs O(log diameter) rounds
        # instead of O(diameter) — max_iters=22 covers diameter ~4M,
        # and convergence breaks the loop early, so a generous cap
        # costs nothing on healthy graphs. Measured on the embedding
        # near-dup graph (cosine >= 0.4 edges): 3 rounds at sf0.01 but
        # 11 at sf0.1 — long near-dup chains overflowed the old cap of
        # 10 at just 10x the driver scale, turning a healthy graph into
        # a convergence failure. Verified by the full-registry sf0.1
        # oracle sweep (round 6).
        hop = propagated.select(
            F.col("id").alias("__hop_id"), F.col("cluster").alias("__hop_cluster")
        )
        new_labels = (
            propagated.join(hop, propagated.cluster == hop.__hop_id, "left")
            .select(
                "id",
                F.coalesce(F.col("__hop_cluster"), F.col("cluster")).alias(
                    "cluster"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if telemetry is not None:
        telemetry["rounds"] = rounds
        telemetry["converged"] = converged
    logging.getLogger(__name__).info(
        "connected_components: %d/%d rounds, converged=%s",
        rounds, max_iters, converged,
    )
    if not converged:
        # Unconverged labels are WRONG (nodes may carry a non-minimal
        # cluster id) — fail loudly rather than ship a silently split
        # component. With pointer doubling this needs diameter > 2^max_iters.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "raise max_iters (convergence needs O(log diameter) rounds)"
        )
    return labels.select(F.col("id").alias(id_col), "cluster")


def connected_components_incremental(
    labels: DataFrame,
    new_pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_iters: int = 22,
    telemetry: dict | None = None,
) -> DataFrame:
    """Absorb a batch of NEW edges into an existing component labeling
    without re-running connected components over the full graph — the
    IVM companion to :func:`connected_components` for the incremental-
    dedup regime (yesterday's clusters + today's arrivals).

    ``labels`` must be CANONICAL min-id labels — the output of
    :func:`connected_components` (or this function): every cluster id
    is the minimum member id. ``new_pairs`` is (doc_a, doc_b) edges
    whose endpoints may be labeled nodes, brand-new nodes, or both.

    Algorithm (pure composition): map each new edge's endpoints through
    the labeling (unlabeled nodes keep their own id), drop edges that
    land inside one cluster, and run the SAME propagation loop over the
    resulting SUPER-GRAPH — whose nodes are cluster representatives and
    new ids, i.e. its size scales with the batch and the components it
    touches, never with the corpus. Contracting a connected component
    to its min-id representative preserves both connectivity and the
    min label, so relabeling old nodes through the super-graph's output
    is exactly the full recompute's answer (the registry entry's oracle
    proves this equality against the from-scratch recursive closure).

    Output: (id_col, cluster) for every node in ``labels`` plus every
    node appearing in ``new_pairs``. One broadcast-or-shuffle join per
    edge endpoint, the O(log diameter) loop over the contracted graph,
    and one relabeling join at the end; the full corpus frame is
    touched exactly once (the relabel), with no iteration over it.
    """
    lab_a = labels.select(
        F.col(id_col).alias("doc_a"), F.col("cluster").alias("__la")
    )
    lab_b = labels.select(
        F.col(id_col).alias("doc_b"), F.col("cluster").alias("__lb")
    )
    mapped = (
        new_pairs.select("doc_a", "doc_b")
        .join(lab_a, "doc_a", "left")
        .join(lab_b, "doc_b", "left")
        .select(
            F.coalesce(F.col("__la"), F.col("doc_a")).alias("sa"),
            F.coalesce(F.col("__lb"), F.col("doc_b")).alias("sb"),
        )
    )
    super_edges = mapped.filter(F.col("sa") != F.col("sb")).select(
        F.col("sa").alias("doc_a"), F.col("sb").alias("doc_b")
    )
    merged = connected_components(
        super_edges, id_col="__rep", max_iters=max_iters,
        telemetry=telemetry,
    ).select(F.col("__rep"), F.col("cluster").alias("__merged"))

    relabeled_old = (
        labels.join(
            merged, labels["cluster"] == merged["__rep"], "left"
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("__merged"), F.col("cluster")).alias("cluster"),
        )
    )
    new_nodes = (
        new_pairs.select(F.col("doc_a").alias(id_col))
        .union(new_pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
        .join(labels.select(id_col), id_col, "left_anti")
    )
    relabeled_new = new_nodes.join(
        merged, new_nodes[id_col] == merged["__rep"], "left"
    ).select(
        F.col(id_col),
        # a new node outside the super-graph only had self-edges: it is
        # its own singleton cluster
        F.coalesce(F.col("__merged"), F.col(id_col)).alias("cluster"),
    )
    return relabeled_old.unionByName(relabeled_new)


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    lang_col: str = "lang",
    source_col: str = "source",
    scale: int = 10**6,
) -> DataFrame:
    """Corpus data card: one (metric, value) row per headline statistic —
    the summary block a dataset release ships with (size, vocabulary,
    provenance spread, duplication, language balance).

    All values are BIGINT with explicit fixed-point scaling so the card
    is bit-portable across engines: mean length in centi-tokens,
    language entropy in micro-nats with the floor applied PER LANGUAGE
    before the sum (integer summation — order-free). Three distributed
    passes: one multi-aggregate scan (counts + distincts), one token
    explode for vocabulary, one lang groupBy for entropy.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    base = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
        F.countDistinct(text_col).alias("n_distinct_texts"),
        F.countDistinct(lang_col).alias("n_langs"),
        F.countDistinct(source_col).alias("n_sources"),
    )
    vocab = df.select(
        F.explode(toks).alias("token")
    ).agg(F.countDistinct("token").alias("vocab_size"))
    # per-language floor BEFORE the integer sum: order-free entropy
    lang_counts = df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n_l"))
    entropy = (
        lang_counts.crossJoin(
            F.broadcast(base.select(F.col("n_docs").alias("__n")))
        )
        .select(
            F.floor(
                -F.log(F.col("n_l").cast("double") / F.col("__n").cast("double"))
                * F.lit(int(scale))
                * F.col("n_l").cast("double")
                / F.col("__n").cast("double")
            )
            .cast("long")
            .alias("term")
        )
        .agg(F.sum("term").alias("lang_entropy_micro_nats"))
    )
    metric = lambda name, col: F.struct(  # noqa: E731
        F.lit(name).alias("metric"), col.cast("long").alias("value")
    )
    wide = base.crossJoin(F.broadcast(vocab)).crossJoin(F.broadcast(entropy))
    rows = wide.select(
        F.explode(
            F.array(
                metric("n_docs", F.col("n_docs")),
                metric("n_tokens", F.col("n_tokens")),
                metric("vocab_size", F.col("vocab_size")),
                metric("n_langs", F.col("n_langs")),
                metric("n_sources", F.col("n_sources")),
                metric(
                    "exact_dup_docs",
                    F.col("n_docs") - F.col("n_distinct_texts"),
                ),
                metric(
                    "mean_doc_len_centitokens",
                    F.floor(F.col("n_tokens") * 100 / F.col("n_docs")),
                ),
                metric(
                    "lang_entropy_micro_nats",
                    F.col("lang_entropy_micro_nats"),
                ),
            )
        ).alias("m")
    )
    return rows.select("m.metric", "m.value")
