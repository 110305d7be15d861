"""Connected components with pointer-doubling (logarithmic rounds).

``operators/dedup.py:duplicate_clusters`` propagates min labels one
hop per round — the right tool for near-duplicate clusters, whose
diameter is small by construction (a dup cluster is near-clique), and
its ``max_iters`` certificate makes the bounded-diameter assumption
loud. A general graph breaks that assumption: the support-thresholded
co-purchase graph's giant component has THOUSANDS of nodes (1,875 at
sf0.01) and a diameter far beyond any sane linear round budget.

This module implements the scale-correct form: min-label propagation
PLUS pointer jumping (``label(v) <- label(label(v))``), the shortcut
step of the Shiloach–Vishkin / large-star–small-star family
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014 — public literature, algorithm shape only). Label chains
halve every round, so convergence needs O(log diameter) rounds — a
path graph of 2^k nodes converges in ~k rounds where one-hop
propagation needs 2^k. At 100 TB this is the difference between ~40
shuffles and ~10^12.

Each round is three keyed equi-joins (propagate over edges, jump via
the label table itself, compare for the zero-change certificate) on
(node, label) pairs — no driver-side graph, no collect; the labels
frame is localCheckpointed per round so plan lineage stays flat
instead of doubling. Convergence is CERTIFIED by a zero-change round;
exhausting ``max_rounds`` with labels still moving raises
``ComponentsNotConverged`` loudly rather than returning split
components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from incubyte_vaccination_data_pipeline_spark.plans.checkpoints import (
    durable_checkpoint,
)


class ComponentsNotConverged(RuntimeError):
    """max_rounds exhausted with labels still changing."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 10,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with its
    component's minimum node id. ``edges`` is consumed as given plus
    reversed (symmetrized internally); self-loops are harmless.

    Returns (node, component_id). ``max_rounds`` bounds DOUBLING
    rounds: 10 covers any diameter up to ~2^10 hops after the first
    propagation — raise it for adversarial graphs; the zero-change
    certificate stops early as soon as labels are stable.
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionAll(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    labels = durable_checkpoint(
        sym.select(F.col("s").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl")),
        eager=False,
    )
    for round_i in range(max_rounds):
        # 1) propagate: each node offers its label to every neighbor
        prop = sym.join(labels, sym.s == labels.node).select(
            F.col("d").alias("node"), F.col("lbl")
        )
        stepped = (
            labels.select("node", "lbl")
            .unionAll(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        # 2) pointer jump: follow the label one more level (labels are
        # node ids, so the label table doubles as the pointer table);
        # min() keeps monotonicity when the jump target improved first
        jump = stepped.select(
            F.col("node").alias("__jn"), F.col("lbl").alias("__jl")
        )
        jumped = (
            stepped.join(jump, stepped.lbl == jump.__jn, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("__jl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        jumped = durable_checkpoint(jumped, eager=False)
        # 3) zero-change certificate (bounded: one count over the
        # label table, which has one row per node). The first two
        # rounds are never stable on a graph with any edge spanning
        # >2 hops, so their compare jobs are skipped — extra rounds
        # are label-stable no-ops, the certificate is unaffected.
        if round_i >= 2:
            changed = (
                jumped.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .count()
            )
        else:
            changed = -1
        labels = jumped
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("component_id"))
    raise ComponentsNotConverged(
        f"labels still moving after {max_rounds} doubling rounds"
    )
