"""Round-11 OPTIMIZATION invariants: the rewrites that changed operator
internals this round keep their contracts.

Covered here (results themselves are pinned by the oracle-parity sweep;
these tests pin the *mechanisms* the optimizations introduced):

- the ER match-pair index and LP-label index are materialized once per
  (session, corpus) and every consumer reads the SAME artifact;
- the fused min-label round (one grouped MIN over lbl ∪ incoming)
  equals a pure-Python reference on an adversarial small graph —
  including isolated-source nodes and multi-component shapes;
- graph_bfs_3hop's int-keyed iteration decodes to exactly the string
  node ids + minimal hop distances of a pure-Python BFS over the same
  parquet-derived edges;
- doc_bm25_topk's one-pass plan has no per-term hash join left (the
  only join is the single broadcast scalar row).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_er_pair_and_label_indexes_materialize_once(spark, sf_smoke):
    from the_hive_spark.operators.entity_resolution import (
        _er_labels,
        cust_fuzzy_match_pairs,
    )

    p1 = cust_fuzzy_match_pairs(spark, sf_smoke)
    p2 = cust_fuzzy_match_pairs(spark, sf_smoke)
    assert p1 is p2, "pair index must come from the matstore on reuse"
    l1 = _er_labels(spark, sf_smoke)
    l2 = _er_labels(spark, sf_smoke)
    assert l1 is l2, "LP label index must come from the matstore on reuse"


def test_min_label_propagation_matches_naive(spark):
    from the_hive_spark.operators.graph import min_label_propagation

    # two components, a chain (tests multi-round propagation), a node
    # with only outgoing edges (1 -> 9: 9 receives, 1 keeps its own)
    edges = [(5, 6), (6, 7), (7, 8), (1, 9), (20, 21), (21, 20)]
    adj_rows = [(u, v) for u, v in edges] + [(v, u) for u, v in edges]
    adj = spark.createDataFrame(adj_rows, "u long, v long")

    rounds = 3
    nodes = {u for u, _ in adj_rows}
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        nxt = dict(lbl)
        for u, v in adj_rows:
            if lbl[v] < nxt[u]:
                nxt[u] = min(nxt[u], lbl[v])
        lbl = nxt

    got = {
        r["node"]: r["lbl"]
        for r in min_label_propagation(adj, rounds).collect()
    }
    assert got == lbl


def test_bfs_intkeys_match_python_reference(spark, sf_smoke):
    from collections import deque

    from the_hive_spark import registry

    registry.load_all()
    from the_hive_spark.operators.graph import (
        BFS_MAX_HOPS,
        BFS_SEED,
        derived_edges,
    )

    und: dict[str, set] = {}
    for r in derived_edges(spark, sf_smoke).collect():
        und.setdefault(r["src"], set()).add(r["dst"])
        und.setdefault(r["dst"], set()).add(r["src"])
    dist = {BFS_SEED: 0}
    q = deque([BFS_SEED])
    while q:
        n = q.popleft()
        if dist[n] >= BFS_MAX_HOPS:
            continue
        for m in und.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)

    got = {
        r["node_id"]: r["dist"]
        for r in registry.QUERIES["graph_bfs_3hop"](spark, sf_smoke).collect()
    }
    assert got == dist


def test_bm25_single_pass_plan(spark, sf_smoke):
    from the_hive_spark import registry
    from the_hive_spark.plans.inspect import plan_summary

    registry.load_all()
    s = plan_summary(registry.QUERIES["doc_bm25_topk"](spark, sf_smoke))
    # the per-term hash joins are gone; the only join left is the
    # broadcast of the single global-stats row
    assert s["broadcast_hash_joins"] == 0
    assert s["sort_merge_joins"] == 0 and s["shuffled_hash_joins"] == 0
    assert s["take_ordered"], "top-k must stay a TakeOrdered merge"
