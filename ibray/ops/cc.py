"""Distributed connected components over an edge Dataset.

The dedup operators (MinHash-LSH, n-gram Jaccard, embedding-cosine) all end
with "verified near-dup pairs -> groups (label = smallest member)".  Round 2
resolved that with a driver-side union-find over a collected pair table; at
web scale the verified-pair set is O(duplicate docs) and must stay
distributed.  This module is the groupby-based replacement: iterative
min-label propagation over the edge Dataset — labels only ever decrease, one
hash-shuffle round per propagation step, convergence detected with a tiny
Sum aggregate (monotone, so equal sum == fixpoint).

Rounds needed = graph diameter.  The capped pair generators in ops/dedup.py
emit star-around-min pairs for oversized buckets, so real dup clusters have
diameter ~2 and the loop converges in a handful of rounds; ``max_rounds``
guards pathological inputs.

Reference analog: the reference resolves cross-partition merge groups with a
sequential Dissolve over the merged layer (IB-Tool2.py:2641-2649); this is
the same transitive closure expressed as a Ray Data fixpoint.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ray.data.aggregate import Min, Sum

_EDGE_PARTITIONS = 16
_SMALL_EDGE_ROWS = 200_000  # below this, a driver union-find wins outright

_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _driver_components(und: rd.Dataset) -> rd.Dataset:
    """Union-find over a SMALL materialized (node, nbr) edge table; labels
    equal the smallest node id per component (union by smaller root index
    over ascending-sorted unique ids ⇒ root index = smallest member)."""
    import numpy as np
    import ray

    t = pa.concat_tables([x for x in ray.get(und.to_arrow_refs())
                          if x.num_rows])
    node = np.asarray(t.column("node"), dtype=np.int64)
    nbr = np.asarray(t.column("nbr"), dtype=np.int64)
    uniq, inv = np.unique(np.concatenate([node, nbr]), return_inverse=True)
    pi, qi = inv[: len(node)], inv[len(node):]
    parent = np.arange(len(uniq), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(pi.tolist(), qi.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    roots = np.array([find(x) for x in range(len(uniq))], dtype=np.int64)
    return rd.from_arrow(pa.table({
        "node": pa.array(uniq, type=pa.int64()),
        "label": pa.array(uniq[roots], type=pa.int64()),
    }))

# Ray's hash-shuffle groupby emits ZERO-COLUMN empty blocks for empty
# partitions, and map_batches skips empty blocks entirely (a conform UDF is
# never called on them), so they survive any map-based repair and poison the
# next join's per-partition concat ("No match ... FieldRef.Name(node)").
# The only reliable scrub is repartition(): it physically merges blocks,
# dropping the schemaless empties, and also coalesces the groupby's 1-row
# output blocks into join-friendly chunks.


def components_from_edges(edges: rd.Dataset, a: str = "a", b: str = "b",
                          max_rounds: int = 30) -> rd.Dataset:
    """Edge Dataset (int64 endpoints) -> (node, label) Dataset.

    ``label`` is the smallest node id in the node's connected component.
    Every endpoint of every edge appears exactly once in the output (dedup
    callers emit only verified-duplicate edges, so every output node belongs
    to a group of >= 2 members by construction).
    """

    def _undir(t: pa.Table) -> pa.Table:
        av = t.column(a)
        bv = t.column(b)
        return pa.table({
            "node": pa.concat_arrays([pa.concat_arrays(av.chunks) if isinstance(av, pa.ChunkedArray) else av,
                                      pa.concat_arrays(bv.chunks) if isinstance(bv, pa.ChunkedArray) else bv]).cast(pa.int64()),
            "nbr": pa.concat_arrays([pa.concat_arrays(bv.chunks) if isinstance(bv, pa.ChunkedArray) else bv,
                                     pa.concat_arrays(av.chunks) if isinstance(av, pa.ChunkedArray) else av]).cast(pa.int64()),
        })

    # repartition scrubs pass-through empty blocks (map_batches never calls
    # the UDF on empty blocks, so upstream join/groupby empties keep foreign
    # schemas) before they can poison the propagation join below
    und = edges.map_batches(_undir, batch_format="pyarrow").repartition(
        _EDGE_PARTITIONS).materialize()
    n_rows = und.count()
    if n_rows == 0:
        return rd.from_arrow(_LABEL_SCHEMA.empty_table())
    if n_rows <= _SMALL_EDGE_ROWS:
        # small-graph fast path: every propagation round below costs a hash
        # join + groupby + repartition + aggregate (4+ shuffle latencies);
        # for a verified-pair set that fits trivially in one process a
        # driver union-find returns the identical (node, min-id label)
        # contract in milliseconds.  The distributed fixpoint remains the
        # scale path above this cap.
        return _driver_components(und)
    # round 0: label(v) = min(v, min neighbor)
    labels = und.map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "label": pa.compute.min_element_wise(t.column("node"), t.column("nbr")),
        }), batch_format="pyarrow",
    ).groupby("node").aggregate(Min("label", alias_name="label")).repartition(
        _EDGE_PARTITIONS).materialize()
    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
    converged = False
    for _ in range(max_rounds):
        # propagate: each node offers its label to every neighbor, plus keeps
        # its own; min per node.  One hash join + one groupby per round.
        nbr_labels = und.join(
            labels, join_type="inner", num_partitions=_EDGE_PARTITIONS,
            on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t.column("nbr"),
                                "label": t.column("label")}),
            batch_format="pyarrow")
        labels = labels.union(nbr_labels).groupby("node").aggregate(
            Min("label", alias_name="label")).repartition(
            _EDGE_PARTITIONS).materialize()
        # pointer jumping: label(v) <- label(label(v)).  Every label value is
        # itself a node (the component min seen so far), labels are monotone
        # (label(v) <= v), so composing can only shrink — and it doubles the
        # reach per round, giving log-diameter convergence instead of
        # diameter (a settlement chained across k coarse partitions would
        # otherwise need ~k plain propagation rounds).
        labels = labels.map_batches(
            lambda t: pa.table({"node": t.column("label"),
                                "orig": t.column("node")}),
            batch_format="pyarrow",
        ).join(
            labels, join_type="inner", num_partitions=_EDGE_PARTITIONS,
            on=("node",),
        ).map_batches(
            lambda t: pa.table({"node": t.column("orig").cast(pa.int64()),
                                "label": t.column("label").cast(pa.int64())}),
            batch_format="pyarrow",
        ).repartition(_EDGE_PARTITIONS).materialize()
        cur_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if cur_sum == prev_sum:  # labels are monotone non-increasing
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # With pointer jumping 30 rounds cover diameter 2^30; reaching here
        # means something is wrong — returning possibly-stale labels would
        # silently split components, so fail loudly.
        raise RuntimeError(
            "components_from_edges: min-label fixpoint did not converge "
            f"within max_rounds={max_rounds}")
    return labels
