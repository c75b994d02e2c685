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
rounds, cf. the public "Connected Components in MapReduce" literature);
``connected_components_doubling`` below implements that O(log diameter)
path for graphs whose chains ARE long — identity stitching, session
linkage, order chains — where hash-to-min's round count (= diameter)
would be the scale killer. Dedup callers keep the simple form: one
shuffle per round cheaper, and their diameters never grow.

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
    # symmetrised adjacency is reused every round — materialise once and
    # cut its (potentially expensive, e.g. full LSH pipeline) lineage
    sym = _symmetrise(edges).localCheckpoint(eager=True)

    labels = nodes.select(F.col("id").cast("long")).distinct().select(
        "id", F.col("id").alias("component")
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0] or 0

    for _ in range(max_iters):
        # shuffle_hash hint: labels is NODE-sized, and Spark's 64 MB
        # broadcast threshold happily driver-collects a few million
        # labels (measured 30 s/round at the 16x replica vs 2 s hashed)
        # — a plan that cannot exist at corpus scale; the hint pins the
        # scale-correct shuffled hash join at every size
        nbr = sym.join(labels.hint("shuffle_hash"), sym.dst == labels.id).select(
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
    else:
        # partially-converged labels are plausible-looking but WRONG and
        # the returned frame gives callers no way to tell — fail loud.
        # Hash-to-min's round count is the component diameter, so this
        # fires exactly when the graph needs the doubling variant.
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            f"(label sum still moving: {prev_sum}) — component diameter "
            "exceeds the budget; use connected_components_doubling"
        )
    return labels


def _symmetrise(edges: DataFrame) -> DataFrame:
    return (
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


def connected_components_doubling(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 24,
    return_rounds: bool = False,
):
    """Connected components in O(log diameter) rounds: min-label
    propagation fused with POINTER JUMPING (the shortcutting step of the
    public large-star/small-star "Connected Components in MapReduce and
    Beyond" family).

    Each round is (1) the same neighbour-min as ``connected_components``,
    then (2) one label-table self-join ``component <- component(component)``
    that halves every pointer chain. A length-d chain therefore resolves
    in ~log2(d) rounds instead of d — the difference between 5 rounds and
    5 000 on an identity-stitching graph with million-node chains. Cost
    per round: one O(|E|) equi-join + agg plus one O(|V|) self-join, all
    on uniformly-hashed id keys.

    Correctness invariants (why the same scalar-sum convergence test is
    sound): ``component(v) <= v`` always, both steps are elementwise
    monotone non-increasing, so the global label sum strictly decreases
    until fixpoint; a fixpoint of the fused round is in particular a
    fixpoint of neighbour-min, which labels every node with its
    component's minimum id.

    Same contract as ``connected_components``; ``return_rounds=True``
    additionally returns the executed round count (used by tests to pin
    the logarithmic behaviour, and by scale notes to report it).
    """
    sym = _symmetrise(edges).localCheckpoint(eager=True)
    labels = (
        nodes.select(F.col("id").cast("long"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0] or 0
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # shuffle_hash on both node-sized join sides: see the
        # broadcast-threshold note in ``connected_components`` — a
        # driver-broadcast of millions of labels measured 30 s/round
        # here and is impossible at corpus scale
        nbr = sym.join(labels.hint("shuffle_hash"), sym.dst == labels.id).select(
            F.col("src").alias("id"), F.col("component")
        )
        # materialise the neighbour-min result BEFORE the pointer jump:
        # the jump consumes `stepped` on BOTH join sides, and without a
        # checkpoint Spark recomputes the union+agg once per side — the
        # measured cost of that (plus the re-shuffles it drags in) grew
        # round-over-round at the 16x replica (10.8 -> 92.7 s/round);
        # with the checkpoint each round is two bounded jobs over
        # materialised 16-byte rows
        stepped = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        # pointer jump: component <- component(component). Every label is
        # a node id (labels start as ids and only ever take mins of ids),
        # so the lookup always hits; coalesce guards the invariant anyway.
        ptr = stepped.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        labels = (
            stepped.join(
                ptr.hint("shuffle_hash"), stepped.component == ptr.p_id, "left"
            )
            .select("id", F.coalesce("p_comp", "component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # exhausting max_iters without hitting the sum fixpoint means the
        # labels are PARTIALLY converged — plausible-looking but wrong.
        # Callers can't detect that from the returned frame, so fail loud:
        # at 24 doubling rounds a non-converged graph has chains past
        # 2^24 hops, which is a data/parameter problem, not a normal exit.
        raise RuntimeError(
            f"connected_components_doubling: no fixpoint after {max_iters} "
            f"rounds (label sum still moving: {prev_sum}) — labels would be "
            "partially converged; raise max_iters"
        )
    if return_rounds:
        return labels, rounds
    return labels
