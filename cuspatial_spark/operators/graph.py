"""Distributed connected components + clustering wrappers.

Near-dup dedup emits candidate PAIRS (LSH bands, cosine near-dup) but
the deliverable is duplicate CLUSTERS — pick one canonical document
per component.  Likewise the reference's Hausdorff matrix exists to
feed trajectory clustering.  Both reduce to connected components over
an edge list.

``connected_components`` is the hash-min label-propagation algorithm
as pure DataFrame ops: every vertex starts as its own label; each
round joins labels across edges (both directions), keeps the min, and
then SHORTCUTS each label to its label's label (pointer doubling) so
hop distance squares per round — rounds = O(log diameter), and a
chain of 1M vertices converges in ~21 rounds.  Near-dup clusters are
shallow anyway (stars from canonical-mode LSH have diameter 2), so
3-5 rounds in practice; each round is two shuffles on the vertex id.
If the loop exhausts max_iter without converging it RAISES rather
than returning silently-split components.  Results are persisted per
round so the lineage stays flat (no exponential plan growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable via
    undirected edges.  Isolated vertices only appear if present as a
    self-edge or an endpoint."""
    # undirected: propagate both ways.  localCheckpoint materializes
    # the edge list ONCE, cutting the (possibly very expensive)
    # upstream derivation — e.g. LSH shingling — out of every
    # iteration's lineage; per-round labels likewise, so the plan
    # stays flat across rounds.
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.distinct().localCheckpoint()

    labels = (
        e.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        # min neighbor label per vertex
        neigh = (
            e.join(labels, e.b == labels.vertex)
            .groupBy(e.a.alias("vertex"))
            .agg(F.min("component").alias("n_comp"))
        )
        stepped = labels.join(neigh, "vertex", "left").select(
            "vertex",
            F.least(
                F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
            ).alias("component"),
        )
        # pointer doubling: follow my component's own component, so a
        # label travels 2^round hops instead of one per round
        parents = stepped.select(
            F.col("vertex").alias("component"), F.col("component").alias("__parent")
        )
        new_labels = (
            stepped.join(parents, "component", "left")
            .select(
                "vertex",
                F.coalesce(F.col("__parent"), F.col("component")).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "component diameter exceeds 2^max_iter — raise max_iter"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(doc_id, canonical_id) from near-dup candidate pairs: canonical
    = min doc id of the connected component.  Compose with
    textops.lsh_candidate_pairs(mode='canonical') — star-shaped pair
    sets converge in 2 rounds."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("canonical_id")
    )


def hausdorff_clusters(
    matrix: DataFrame,
    threshold: float,
    space_a: str = "space_a",
    space_b: str = "space_b",
    distance: str = "distance",
) -> DataFrame:
    """(space, cluster) — single-linkage clustering of trajectory
    spaces under symmetric Hausdorff distance: link a~b when BOTH
    directed distances <= threshold, then take connected components
    (the clustering use the reference's Hausdorff operator exists to
    serve; symmetric max is the standard Hausdorff metric)."""
    m = matrix.select(space_a, space_b, distance)
    sym = (
        m.alias("f")
        .join(
            m.alias("r"),
            (F.col(f"f.{space_a}") == F.col(f"r.{space_b}"))
            & (F.col(f"f.{space_b}") == F.col(f"r.{space_a}")),
        )
        .select(
            F.col(f"f.{space_a}").alias("src"),
            F.col(f"f.{space_b}").alias("dst"),
            F.greatest(F.col(f"f.{distance}"), F.col(f"r.{distance}")).alias("h"),
        )
    )
    edges = sym.where(F.col("h") <= threshold)
    cc = connected_components(edges)
    return cc.select(F.col("vertex").alias("space"), F.col("component").alias("cluster"))
