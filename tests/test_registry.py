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

# Round-4 top-50 budget: registry._GATE_R4 is the single source of
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
    assert names[: len(registry._GATE_R4)] == registry._GATE_R4
    # slots 39-50 are the re-attests of round-4-edited code (broadcast
    # hygiene fixes: chat path, analytics de-hinting, tfidf/modality)
    assert names[38:42] == [
        "hive_chat_citations",
        "hive_chat_answer",
        "dup_modality_agreement",
        "doc_tfidf_topk",
    ]
    # every ORACLED slot is hash-checkable; the 11 rows-only slots are
    # the ANN/sketch evals whose driver check is rows+schema by design
    rows_only = [n for n in names[:50] if n not in registry.ORACLES]
    assert set(rows_only) <= {
        "emb_ann_lsh_topk",
        "emb_ann_ivf_topk",
        "emb_ann_recall",
        "emb_pq_eval",
        "emb_ivfpq_recall",
        "emb_spectrum_diagnostics",
        "events_approx_value_percentiles",
        "events_approx_user_count",
        "emb_mmr_diverse_topk",
        "emb_kmeans_stats",
        "doc_bpe_train",
    }, rows_only


def test_gate_r4_covers_all_never_checked():
    """Slots 1-38 must be exactly the queries with no driver
    CORRECTNESS row in rounds 1-3 — a green round 4 then closes the
    loop: every registered query has had a driver row in some round."""
    import json
    import os

    checked: set[str] = set()
    for f in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
              "CORRECTNESS_r03.json"):
        path = os.path.join(os.path.dirname(__file__), "..", f)
        if os.path.exists(path):
            with open(path) as fh:
                checked |= set(json.load(fh))
    if not checked:
        return  # fresh clone without driver artifacts
    stale = [n for n in registry._GATE_R4[:38] if n in checked]
    assert not stale, stale
    never = [n for n in registry.QUERIES
             if n not in checked
             and n not in registry._GATE_R4[:38]
             and n not in registry._ADDED_R4]
    assert not never, (
        "queries with no driver row missing from the r4 gate (and not "
        "declared in _ADDED_R4 for the round-5 rotation): " + str(never)
    )
    # _ADDED_R4 must be exactly the post-freeze additions (a query
    # listed there but driver-checked means the list went stale)
    assert not [n for n in registry._ADDED_R4 if n in checked]
    assert set(registry._ADDED_R4) <= set(registry.QUERIES)


def test_every_query_has_callable_and_unique_name():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    # oracle keys must be registered queries
    assert set(registry.ORACLES) <= set(registry.QUERIES)
