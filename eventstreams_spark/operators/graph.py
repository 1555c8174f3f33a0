"""Distributed connected components (min-label propagation).

The missing last stage of large-scale near-dup dedup: candidate
generation (MinHash-LSH / SimHash) yields PAIRS, but dedup policy
("keep one doc per duplicate group") needs transitive CLUSTERS —
a pair list where A~B and B~C must put A,B,C in one group.

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min label among
itself and its neighbors; converged when no label changes. Rounds
needed = graph diameter (near-dup clusters are shallow — a handful of
rounds). Each round is one join + one groupBy on the edge list — all
distributed, nothing driver-side except the loop counter and a
single-scalar convergence probe; `localCheckpoint` truncates the
growing lineage every round so plan size stays O(1).

For web-scale graphs with long chains, the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) halves rounds; plain propagation is kept here for
its simplicity and because dedup graphs are diameter-bounded.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def truncate_lineage(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Materialize ``df`` and TRUNCATE its logical lineage with an
    eager ``localCheckpoint`` — the per-round boundary for iterative
    graph algorithms. Without it, round k's plan embeds round k-1's
    whole subtree, so plan strings (and analyzer/optimizer time) grow
    multiplicatively with rounds even though the data materializes
    once (VERDICT r5: louvain_coarsened_two_level's plan printed 796
    parquet scans for what executes as one).

    ``parallelism`` narrows the frame first (the coalesce-before-
    persist rule, SCALE.md §3b) so the checkpointed blocks don't pin
    a vanilla session's 200 shuffle partitions onto every downstream
    round.

    Scale note: localCheckpoint stores blocks on the executors
    (MEMORY_AND_DISK) WITHOUT lineage, so an executor loss forces a
    job retry instead of a partition recompute — the right trade for
    bounded-round algorithms on many-round chains; a production
    pipeline running tens of rounds on a flaky fleet should swap in
    reliable ``checkpoint()`` to the cluster FS (one config line in
    ``SparkContext.setCheckpointDir``), same truncation semantics.
    """
    if parallelism:
        df = df.coalesce(parallelism)
    return df.localCheckpoint(eager=True)


def interaction_edges(events: DataFrame, *, undirected: bool = False) -> DataFrame:
    """The user interaction graph shared by the graph-analytics
    queries (PageRank, triangles, k-core): edge u→v when v's event
    immediately follows u's within an event_type stream; self-loops
    dropped, duplicates collapsed.

    ``undirected=True`` returns canonical (a, b) with a < b. ONE
    definition for all three queries (and one matching CTE prefix on
    the oracle side, queries/_shared.py) — the graph must mean the
    same thing everywhere.
    """
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
    )
    if undirected:
        return pairs.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        ).distinct()
    return pairs.distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) for every node appearing in ``edges``.

    ``component`` is the minimum node id in the node's connected
    component — deterministic regardless of iteration order or
    partitioning. Edges are treated as undirected; self-loops and
    duplicate edges are harmless.
    """
    # materialize the symmetric edge list ONCE: without this, every
    # iteration's join AND every convergence probe re-executes the
    # whole upstream plan (for neardup e2e that is the shingle +
    # Jaccard-verify pipeline — measured 36 s -> ~8 s at sf0.1)
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionAll(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
    ).localCheckpoint()
    labels = (
        sym.select(F.col("s").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()

    # labels only ever decrease, so sum(label) strictly decreases while
    # any node still changes: an O(1)-result convergence probe with no
    # row-level diff join.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.s == labels.id)
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        stepped = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least("label", F.coalesce("nbr", "label")).alias("label"),
        )
        # POINTER JUMP (r10): additionally take the label OF the label
        # from the previous round's checkpointed map — label values are
        # always node ids, so the lookup join always matches. One-hop
        # propagation alone needs diameter rounds; the jump compounds
        # each round's reach with the previous round's (Fibonacci-style
        # growth, O(log d) rounds instead of O(d)) for one extra equi
        # join of two label-sized frames per round — no recompute, the
        # jump target is the already-materialized previous frame.
        # Labels still only decrease, so the sum-stall probe still
        # certifies the fixpoint (at stall: every node's label matches
        # its neighborhood min AND its label's label — converged).
        # Measured on the semantic-dedup graph (diameter ~12): 13
        # rounds -> 10; output verified identical.
        prev_map = labels.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        labels = (
            stepped.join(prev_map, stepped.label == prev_map.pid, "left")
            .select(
                "id",
                F.least(
                    "label", F.coalesce("plabel", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the web-scale alternative to plain min-label
    propagation (``connected_components`` above): rounds scale with
    log(diameter) instead of diameter, because each round rewires
    whole neighborhoods to their local minimum rather than moving
    labels one hop.

    State is the edge list itself, kept canonical (hi > lo):
    - large-star: every edge (hi, lo) is rewired to (hi, m(lo)) where
      m(u) = min(Γ(u) ∪ {u}) — big endpoints jump to their smaller
      endpoint's best-known minimum.
    - small-star: per hi, all its smaller neighbors (and hi itself)
      rewire to min(Γ⁻(hi)) — collapsing local stars.
    Both steps are one groupBy-min + one equi join over the edge
    list; at the fixed point the edge set IS the star (node → root,
    root = component minimum, same deterministic labeling as plain
    propagation). Convergence is probed with an O(1) (count, Σhi,
    Σlo) signature — the multiset only contracts toward the star, so
    signature equality means fixpoint. ``localCheckpoint`` per round
    truncates lineage exactly like the propagation variant.
    """
    a, b = F.col(src), F.col(dst)
    e = (
        edges.select(a.alias("x"), b.alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("hi"), F.least("x", "y").alias("lo")
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("hi").alias("id"))
        .unionAll(e.select(F.col("lo").alias("id")))
        .distinct()
        .localCheckpoint()
    )

    def signature(df):
        # collision-resistant fixpoint check: a multiset-sensitive
        # 64-bit hash-sum over (hi, lo) pairs alongside count and
        # linear sums — (count, Σhi, Σlo) alone can collide when one
        # edge's hi gains what another's loses, breaking early with
        # wrong components
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hi").alias("sh"),
            F.sum("lo").alias("sl"),
            # decimal sum: a long sum of 64-bit hashes overflows ANSI
            F.sum(F.xxhash64("hi", "lo").cast("decimal(20,0)")).alias("hh"),
        ).collect()[0]
        return (r.n, r.sh, r.sl, r.hh)

    prev = signature(e)
    converged = False
    for _ in range(max_iter):
        # large-star: m(u) over the full symmetric neighborhood
        adj = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionAll(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = (
            adj.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        e = (
            adj.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # small-star: per hi, collapse all smaller neighbors onto min
        mins2 = e.groupBy("hi").agg(F.min("lo").alias("m"))
        e = (
            mins2.select("hi", F.col("m").alias("lo"))
            .unionAll(
                e.join(mins2, "hi")
                .filter(F.col("lo") != F.col("m"))
                .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            )
            .distinct()
            .localCheckpoint()
        )
        cur = signature(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        warnings.warn(
            f"connected_components_star: hit max_iter={max_iter} without "
            "a fixpoint; labels may be unconverged",
            RuntimeWarning,
            stacklevel=2,
        )
    star = e.groupBy(F.col("hi").alias("id")).agg(F.min("lo").alias("comp"))
    return nodes.join(star, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("component")
    )
