"""Duplicate-cluster resolution: connected components over candidate
pairs, and canonical-document selection.

Near-dup candidate generators (MinHash-LSH, SimHash blocks, embedding
LSH — operators/dedup.py) emit PAIRS; a training-data pipeline needs
CLUSTERS: "these 7 urls are the same article, keep one". The bridge is
connected components over the pair graph. The reference has no analog
(its dedup is ReplacingMergeTree per exact key); this is the standard
web-corpus step (CCNet/Gopher dedup pipelines).

Scale notes (10^9 nodes): the implementation is min-label propagation
with pointer jumping — per round, every node takes the min label over
itself and its neighbors (one equi-join + map-side-combinable min agg),
then labels compose through themselves (label <- label(label), one more
equi-join). Labels are monotone non-increasing and bounded below by the
component minimum, so the loop terminates; pointer jumping contracts
label chains so rounds grow ~O(log diameter) rather than O(diameter)
(the alternating large-star/small-star scheme of Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14, has the same
round bound; hash-to-min-with-jumping is simpler and equally join-only).
Near-dup graphs are overwhelmingly tiny dense cliques with diameter
2-3, so in practice 3-4 rounds converge. Every round materializes via
checkpoint.materialize() — iterative Catalyst plans otherwise double in
depth per round and re-execute the whole history each action. On a real
cluster set W3R_CHECKPOINT_DIR (or conf w3r.checkpoint.dir) at durable
storage: every round then cuts lineage with a reliable checkpoint(), so
an executor loss mid-iteration recomputes from the round's files
instead of killing the job (localCheckpoint's truncated lineage is
unrecoverable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web3research_etl_spark.checkpoint import materialize


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = the minimum node id reachable through the (undirected)
    pair graph — a stable, order-independent cluster id."""
    # materialize the pair list FIRST: the symmetric-closure union reads
    # it twice, and upstream candidate generators (LSH) are expensive
    e = materialize(pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")))
    edges = materialize(
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    )
    labels = materialize(
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # 1) neighbor-min: min label over incident edges (map-side
        #    combinable — the shuffle carries one (u, min) pair per map
        #    task, not the edge list)
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("v"), "label"), "v"
            )
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.join(nbr, labels["node"] == nbr["u"], "left")
            .select(
                labels["node"].alias("node"),
                F.least(
                    labels["label"],
                    F.coalesce(nbr["nbr_label"], labels["label"]),
                ).alias("label"),
            )
        )
        # 2) pointer jump: label <- label(label) (path compression)
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        jumped = materialize(
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                stepped["node"].alias("node"),
                F.coalesce(parent["p_label"], stepped["label"]).alias("label"),
            ),
            # lazy: the convergence agg below is the round's one action
            # and materializes the checkpoint as it runs — eager=True
            # would spend a second action per round just to materialize
            eager=False,
        )
        # convergence: labels are monotone non-increasing per node, so
        # the label SUM strictly decreases until the fixpoint — one
        # map-side-combinable agg instead of a join+count per round
        # (decimal accumulator: 10^9 bigint node ids would overflow a
        # bigint sum)
        cur_sum = jumped.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels = jumped
        if cur_sum is None or (prev_sum is not None and cur_sum == prev_sum):
            converged = True
            break  # empty node set, or no label moved
        prev_sum = cur_sum
    if not converged:
        # silent non-convergence would hand wrong cluster ids downstream
        # (multiple "canonicals" per true cluster → under-deletion)
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds; raise max_rounds (rounds grow ~O(log diameter) — "
            "hitting 50 means the pair graph is pathological)"
        )
    return labels.select("node", F.col("label").alias("component"))


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    canonical_by: str | None = None,
) -> DataFrame:
    """Assign EVERY document a cluster id (singletons cluster with
    themselves) and mark the canonical keeper. Downstream dedup =
    `filter(is_canonical = 1)`.

    Keeper policy: min id per cluster by default (cheap — no second
    shuffle; the cluster id IS the keeper id). With ``canonical_by``,
    the keeper is the cluster's best row by that column (quality score,
    token count, …) — the CCNet-style "keep the best copy" policy —
    via one row_number window over cluster_id, ties broken by id for
    determinism."""
    from pyspark.sql import Window

    cc = connected_components(pairs, src=src, dst=dst)
    keep_cols = [id_col] + ([canonical_by] if canonical_by else [])
    out = (
        docs.select(*keep_cols)
        .join(cc, docs[id_col] == cc["node"], "left")
        .select(
            *keep_cols,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    if canonical_by is None:
        return out.withColumn(
            "is_canonical", (F.col(id_col) == F.col("cluster_id")).cast("int")
        )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(canonical_by).desc(), F.col(id_col).asc()
    )
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .withColumn("is_canonical", (F.col("__rk") == 1).cast("int"))
        .drop("__rk")
    )
