"""Registration-order budget guard.

The driver's correctness gate hash-checks the FIRST 50 registered
queries only, so load_all()'s import order is a verification budget,
not a style choice. This test pins the current allocation — any
refactor that shuffles imports (or adds a module-level import that
transitively registers a family early, the bug this guards against)
fails here instead of silently costing driver-oracle rows.
"""

from __future__ import annotations

from the_hive_spark import registry

registry.load_all()

# Round-3 top-50 budget: registry._GATE_R3 is the single source of
# truth (explicit rotation list, no longer import-order-encoded). This
# test asserts load_all() actually imposes it in a fresh interpreter.
def test_top50_budget():
    # Must run in a FRESH interpreter: in the shared pytest process,
    # earlier test modules import operator modules directly and
    # pollute the global registration order. The driver imports
    # __spark_entry__ fresh, which is what this asserts.
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import json; from the_hive_spark import registry;"
            " registry.load_all();"
            " print(json.dumps(list(registry.QUERIES)))",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    names = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(names) >= 50
    assert names[: len(registry._GATE_R3)] == registry._GATE_R3
    # slots 47-50 are the re-attests of changed r1-green code
    assert names[46:50] == [
        "doc_minhash_lsh_pairs",
        "doc_dup_clusters",
        "graph_pagerank3",
        "emb_knn_topk",
    ]
    # every slot in 1-50 is hash-checkable (has a DuckDB oracle)
    import importlib

    reg = importlib.import_module("the_hive_spark.registry")
    missing_oracle = [n for n in names[:50] if n not in reg.ORACLES]
    assert not missing_oracle, missing_oracle


def test_gate_r3_covers_never_checked():
    """Slots 1-46 must be queries with no driver CORRECTNESS row in
    rounds 1-2 (the whole point of the rotation)."""
    import json
    import os

    checked: set[str] = set()
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(os.path.dirname(__file__), "..", f)
        if os.path.exists(path):
            with open(path) as fh:
                checked |= set(json.load(fh))
    stale = [n for n in registry._GATE_R3[:46] if n in checked]
    assert not stale, stale


def test_every_query_has_callable_and_unique_name():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    # oracle keys must be registered queries
    assert set(registry.ORACLES) <= set(registry.QUERIES)
