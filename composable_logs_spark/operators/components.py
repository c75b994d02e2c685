"""Connected components over an edge list — the clustering step of a
near-duplicate pipeline.

Pair-finding (MinHash/SimHash/SRP LSH) yields duplicate EDGES; what a
training-data pipeline actually acts on is duplicate CLUSTERS: every
document gets a cluster id, one canonical document per cluster is kept,
the rest are dropped. This operator closes that gap.

Algorithm: iterative min-label propagation ("hash-to-min"). Every node
starts labelled with its own id; each round every node takes the min of
its own label and its neighbours' labels; fixpoint = every node carries
its component's minimum id. Each round is one equi-join + one hash
aggregation — both shuffle on uniformly-distributed id keys, so the
per-round cost is O(|E|) with no skew hot-spot, and the round count is
the component DIAMETER, not the component size.

Scale reasoning: near-duplicate graphs are star/clique-shaped (a cluster
of variants all pairwise-linked by LSH), so diameters are tiny (2-3) and
the loop exits after ~3 rounds regardless of corpus size. For adversarial
long-chain graphs the known fix is pointer-doubling (large-star/small-star
rounds, cf. the public "Connected Components in MapReduce" literature),
which this module intentionally skips: dedup graphs never need it, and
the simple form is one shuffle per round cheaper.

Convergence detection is FREE of an extra comparison join: labels only
ever decrease, so the global sum of labels is strictly decreasing until
fixpoint — one cheap scalar agg per round (reusing the localCheckpoint
the round already pays for) detects convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_ITERS = 12


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = DEFAULT_MAX_ITERS,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    Parameters
    ----------
    nodes: one column ``id`` (must include every endpoint; isolated nodes
        allowed — they come back as their own singleton component).
    edges: columns ``src``, ``dst`` (undirected; either orientation, or
        both — symmetrised internally and self-loops dropped).

    Returns ``(id, component)`` with one row per input node.
    """
    sym = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(
                F.col("dst").cast("long").alias("src"),
                F.col("src").cast("long").alias("dst"),
            )
        )
        .distinct()
    )
    # symmetrised adjacency is reused every round — materialise once and
    # cut its (potentially expensive, e.g. full LSH pipeline) lineage
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select(F.col("id").cast("long")).distinct().select(
        "id", F.col("id").alias("component")
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0] or 0

    for _ in range(max_iters):
        nbr = sym.join(labels, sym.dst == labels.id).select(
            F.col("src").alias("id"), F.col("component")
        )
        labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # eager checkpoint: truncates lineage (round N's plan would
        # otherwise nest round N-1's), and the convergence agg below runs
        # on the materialised result instead of recomputing the round
        labels = labels.localCheckpoint(eager=True)
        # labels only decrease → sum strictly decreases until fixpoint
        cur_sum = labels.agg(F.sum("component")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
