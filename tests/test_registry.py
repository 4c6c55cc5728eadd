"""Registration-order budget guard.

The driver's correctness gate hash-checks the FIRST 50 registered
queries only, so load_all()'s import order is a verification budget,
not a style choice. This test pins the current allocation — any
refactor that shuffles imports (or adds a module-level import that
transitively registers a family early, the bug this guards against)
fails here instead of silently costing driver-oracle rows.
"""

from __future__ import annotations

import json
import os

from the_hive_spark import registry

registry.load_all()

_ROOT = os.path.join(os.path.dirname(__file__), "..")

# Queries whose PLANS changed since their latest driver row (the
# repo's _PLAN_CHANGED policy, r6). The round-11 band-mass guard in
# functions/lsh.py::lsh_near_dup_candidates adds a metered aggregate +
# persist to the executed plan of the embedding near-dup family —
# emb_near_dup_lsh and its three consumers re-attest at gate slots
# 3-6 (results unchanged; the guard refuses only past the cap).
# media_phash_near_dup gained the same guard but is rows-only by
# design, so it re-executes at slot 7 under the declared exemption.
_PLAN_CHANGED_R11: list[str] = [
    "emb_near_dup_lsh",
    "emb_semantic_dup_clusters",
    "emb_semantic_dup_rates",
    "dup_modality_agreement",
]

# Queries whose plans the r11 OPTIMIZATION pass rewrote (results
# hash-identical — re-verified against the DuckDB oracles at sf0.01 —
# but the executed plans are new: matstore-shared ER pair/label
# indexes, fused min-label rounds, int-keyed BFS, persisted CC edge
# lists, single-pass BM25/RAKE, in-plan scalar aggregates). Each must
# hold a gate slot this round per the _PLAN_CHANGED policy.
_PLAN_CHANGED_R11_OPT: list[str] = [
    "cust_fuzzy_match_pairs",
    "cust_linkage_fs_scores",
    "cust_er_clusters3",
    "cust_golden_record",
    "graph_label_propagation3",
    "graph_bfs_3hop",
    "doc_dup_clusters",
    "doc_near_dedup_corpus",
    "doc_dup_rates_by_source",
    "doc_bm25_topk",
    "doc_tfidf_topk",
    "doc_lm_bigram_score",
    "doc_rake_keyphrases",
    "q_basket_affinity_lift",
    "q21_waiting_suppliers",
]


def _driver_checked(
    rounds=("01", "02", "03", "04", "05", "06", "07", "08", "09", "10"),
) -> set[str]:
    """Names with a GREEN driver CORRECTNESS row in the given rounds
    (a ``no_oracle`` err row is not a verification — round 4's
    lesson)."""
    checked: set[str] = set()
    for r in rounds:
        path = os.path.join(_ROOT, f"CORRECTNESS_r{r}.json")
        if os.path.exists(path):
            with open(path) as fh:
                rows = json.load(fh)
            checked |= {n for n, v in rows.items() if v.get("hash_match")}
    return checked


def test_top50_budget():
    # Must run in a FRESH interpreter: in the shared pytest process,
    # earlier test modules import operator modules directly and
    # pollute the global registration order. The driver imports
    # __spark_entry__ fresh, which is what this asserts.
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
    assert names[: len(registry._GATE_R11)] == registry._GATE_R11


def test_gate_r11_oracles():
    """Every gate slot must have a DuckDB oracle UNLESS it is the one
    slot explicitly declared rows-only this round (media_phash_near_dup
    re-executing because its plan gained the band-mass guard — the
    driver records rows + err:no_oracle, execution evidence by
    declared intent, not a burned slot like round 4's accidental 11).
    An UNDECLARED oracle-less slot is still a hard failure, and a
    declared slot that ever GAINS an oracle must leave the allowlist
    (load_all enforces both at import)."""
    assert len(registry._GATE_R11) == 50
    unoracled = {
        n for n in registry._GATE_R11 if n not in registry.ORACLES
    }
    assert unoracled == registry._GATE_R11_ROWS_ONLY
    assert registry._GATE_R11_ROWS_ONLY <= set(registry._GATE_R11)


def test_gate_r11_slots():
    """Slots 1-2: round-11 additions. Slots 3-6: the SRP band-guard
    plan-change re-attests. Slot 7: the phash guard plan-change
    (rows-only by design). Slots 8-50: rows whose latest green driver
    row is round 6 — the oldest oracled evidence in the record, headed
    by the six rows the r10 widening re-attests displaced. The r11
    OPTIMIZATION pass inserts its own plan-change re-attests at slots
    8-22 (results hash-identical, plans new), displacing fourteen
    r6-only rows to the round-12 front."""
    checked = _driver_checked()
    if not checked:
        return  # fresh clone without driver artifacts
    assert registry._GATE_R11[:2] == registry._ADDED_R11
    assert registry._GATE_R11[2:6] == _PLAN_CHANGED_R11
    assert registry._GATE_R11[6] == "media_phash_near_dup"
    assert registry._GATE_R11[7:22] == _PLAN_CHANGED_R11_OPT
    r6_only = _driver_checked(("01", "02", "03", "04", "05", "06")) - \
        _driver_checked(("07", "08", "09", "10"))
    for n in registry._GATE_R11[22:]:
        assert n in r6_only, f"slot {n} is not an r6-only row"


def test_no_green_query_left_behind():
    """Every registered ORACLED query either has a green driver row
    already or is in the current gate / declared as a post-freeze
    addition (so next round's rotation picks it up)."""
    checked = _driver_checked()
    if not checked:
        return
    added_r11 = set(registry._ADDED_R11)
    never = [
        n
        for n in registry.ORACLES
        if n not in checked
        and n not in registry._GATE_R11
        and n not in added_r11
    ]
    assert not never, (
        "oracled queries with no driver row missing from the r11 gate "
        "(and not declared in _ADDED_R11 for the round-12 rotation): "
        + str(never)
    )


def test_plan_changed_queries_regated():
    """Any round-11 plan edit invalidates old driver rows; each such
    query must hold a gate slot this round (the four embedding-family
    re-attests at slots 3-6, plus the rows-only phash slot 7)."""
    for n in (
        _PLAN_CHANGED_R11 + _PLAN_CHANGED_R11_OPT + ["media_phash_near_dup"]
    ):
        assert n in registry._GATE_R11, n


def test_every_query_has_callable_and_unique_name():
    assert len(registry.QUERIES) == len(set(registry.QUERIES))
    for name, fn in registry.QUERIES.items():
        assert callable(fn), name
    # oracle keys must be registered queries
    assert set(registry.ORACLES) <= set(registry.QUERIES)
