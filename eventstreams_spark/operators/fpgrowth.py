"""Local FP-growth miner — the per-shard mining kernel for the PFP
(Parallel FP-Growth, Li et al. 2008 "PFP: Parallel FP-Growth for Query
Recommendation") query. The distributed layer (F-list, group-dependent
transaction projection, shard-local mining, result union) lives in
queries/warehouse_extra.fpgrowth_parallel_itemsets; this module is the
classic in-memory algorithm (Han, Pei, Yin 2000 "Mining Frequent
Patterns without Candidate Generation"): build an FP-tree over
rank-sorted transactions, then mine recursively over conditional
pattern bases. All counts are exact integers.

Items are represented as integer GLOBAL ranks (0 = most frequent), so
"sorted ascending" is exactly the descending-frequency insertion order
the FP-tree wants, and an itemset's responsible item (PFP's group key)
is simply max(itemset).
"""

from __future__ import annotations


class _Node:
    __slots__ = ("item", "count", "parent", "children")

    def __init__(self, item, parent):
        self.item = item
        self.count = 0
        self.parent = parent
        self.children = {}


def _build_tree(transactions, minsup):
    """transactions: iterable of (item_list_sorted_ascending, count).
    Returns (header, counts): header maps item -> list of tree nodes,
    counts maps item -> total support; items below minsup are pruned
    before insertion (the F-list prune at every recursion level)."""
    counts: dict[int, int] = {}
    for items, c in transactions:
        for i in items:
            counts[i] = counts.get(i, 0) + c
    keep = {i for i, c in counts.items() if c >= minsup}
    root = _Node(None, None)
    header: dict[int, list[_Node]] = {}
    for items, c in transactions:
        node = root
        for i in items:
            if i not in keep:
                continue  # input is rank-sorted; pruning preserves order
            child = node.children.get(i)
            if child is None:
                child = _Node(i, node)
                node.children[i] = child
                header.setdefault(i, []).append(child)
            child.count += c
            node = child
    return header, {i: counts[i] for i in keep}


def fp_growth_local(transactions, minsup: int) -> dict[tuple, int]:
    """Mine ALL itemsets with support >= minsup from ``transactions``
    (lists of integer items, each sorted ascending = descending global
    frequency). Returns {itemset_tuple_sorted_ascending: support}.

    Canonical recursion: for each frequent item, emit (suffix + item),
    gather the item's conditional pattern base (root-to-parent paths
    with the item's node counts), and recurse on that base.
    """
    out: dict[tuple, int] = {}

    def mine(txs, suffix):
        header, counts = _build_tree(txs, minsup)
        for item, nodes in header.items():
            newset = tuple(sorted(suffix + (item,)))
            out[newset] = counts[item]
            base = []
            for n in nodes:
                path = []
                p = n.parent
                while p is not None and p.item is not None:
                    path.append(p.item)
                    p = p.parent
                if path:
                    path.reverse()
                    base.append((path, n.count))
            if base:
                mine(base, newset)

    mine([(list(t), 1) for t in transactions], ())
    return out
