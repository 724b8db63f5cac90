"""Driver-gate registry invariants + the builder-hash re-entry policy.

The external verify driver records correctness rows for at most 50
queries (sorted-name truncation, observed in round 1). These tests pin
the curation contract: the exposed set is exactly 50, every entry has
a hard DuckDB oracle, and the SURVEY-critical families — the streaming
ladder, the text/dedup/similarity surface, the composed pipelines —
are all inside the gate.

Rotation policy (VERDICT.md round 3, item 1): hard driver evidence
accumulates across rounds; any query whose builder source — transitive
over the cvemate_spark modules it imports — diffs since its last pin
must re-enter DRIVER_GATE. The pin is tests/gate_hashes.json,
refreshed once per round by tools/update_gate_hashes.py (which re-runs
the local oracle on changed-but-ungated queries before accepting).
"""

from __future__ import annotations

import sys
from pathlib import Path

from cvemate_spark.queries import DRIVER_GATE, REGISTRY, driver_specs

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CRITICAL = (
    # streaming ladder (s2_sliding rotated out in r03 — driver-green in
    # r02; the sliding-window class keeps local-oracle coverage)
    "s1_tumbling", "s3_merge_replay", "s4_session", "s5_stateful",
    "s9_outer_join",
    # text / curation (t_langid rotated out in r04 — driver-green r03)
    "t_quality", "t_tokens", "t_fingerprint", "t_perplexity", "t_dsir",
    "curate_pipeline", "curate_pipeline2",
    # dedup surface (r04 late rotation adds the round's own findings)
    "dedup_exact", "dedup_minhash", "dedup_minhash_highrecall",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_shingle",
    "dedup_simhash_wide",
    "dedup_components", "dedup_incremental", "dedup_paragraph",
    "dedup_substring",
    # similarity / ANN
    "q26", "ann_ivf_batch", "ann_lsh", "ann_ivf_trained",
    "emb_neardup", "emb_neardup_semdedup", "emb_semdedup",
    "emb_semdedup_gemm", "bm25_topk",
    # composed pipelines (cwe_enrich / mm_* rotated out late in r04 —
    # r03-driver-green, builders unchanged in r04, locally gated)
    "cve_pipeline",
    # engine surface
    "e_merge_delete", "e_scd2", "e_dq_audit", "e_cms", "e_rolling",
    "q31", "q32", "q34",
    # re-proving the round-3 rewrite (the q06 incident)
    "q06",
)

# src_* readers rotated out with accumulated driver-green evidence
# (round of last proof). They stay registered and locally gated.
SRC_ROTATED_OUT = {
    "src_delta_log": "r03",
    "src_redhat": "r03",
    "src_epss": "r03",
    "src_kev": "r03",
    "src_metasploit": "r03",
    "src_debian": "r03",
    # format-breadth / fallback readers, deliberately local-only:
    "src_orc": "local",
    "src_cwe_xml_udtf": "local",
}


def test_driver_gate_is_exactly_50_hard_oracled_queries():
    specs = driver_specs()
    assert len(specs) == 50
    no_oracle = [n for n, s in specs.items() if s.oracle is None]
    assert not no_oracle, f"driver-gated but rows-only: {no_oracle}"


def test_driver_gate_covers_critical_families():
    names = set(DRIVER_GATE)
    src_all = {n for n in REGISTRY.specs if n.startswith("src_")}
    # every src reader is either in the gate or has recorded
    # driver-green evidence from an earlier round (SRC_ROTATED_OUT)
    unaccounted = src_all - names - set(SRC_ROTATED_OUT)
    assert not unaccounted, unaccounted
    missing = [n for n in CRITICAL if n not in names]
    assert not missing, missing


def test_local_registry_is_a_superset():
    # everything driver-gated is also locally checkable; the extras
    # (redundant shapes) remain registered for tools/check.py
    assert set(DRIVER_GATE) <= set(REGISTRY.specs)
    assert len(REGISTRY.specs) > len(DRIVER_GATE)


def test_changed_builders_reenter_gate():
    """The re-entry policy pin: a query whose builder-source hash
    (transitive import closure — see tools/gate_hash.py) changed since
    its last pin MUST be in DRIVER_GATE this round. Remedy on failure:
    rotate the named queries into DRIVER_GATE, or — only if their
    semantics are provably untouched — refresh the pin with
    `python tools/update_gate_hashes.py --round N` (which re-proves
    them against the local oracle before accepting)."""
    from tools.gate_hash import current_hashes, recorded

    rec = recorded().get("hashes", {})
    assert rec, "tests/gate_hashes.json missing — run tools/update_gate_hashes.py"
    cur = current_hashes()
    gate = set(DRIVER_GATE)
    violating = sorted(
        n for n, h in cur.items() if n in rec and rec[n] != h and n not in gate
    )
    assert not violating, (
        f"builders changed since last driver-green pin but NOT re-gated: "
        f"{violating} — rotate them into DRIVER_GATE or refresh via "
        f"tools/update_gate_hashes.py after a green local oracle run"
    )


def test_gate_hash_closure_and_sensitivity():
    """The policy hash must (a) include operator/function modules the
    builder's module transitively imports — the round-3 q06 incident
    was an operator-layer rewrite invisible to the query module — and
    (b) change when the oracle text changes."""
    import dataclasses

    from tools.gate_hash import _closure, builder_hash

    deps = _closure("cvemate_spark.queries.dedup_ops")
    assert "cvemate_spark.operators.dedup" in deps
    assert "cvemate_spark.functions.text" in deps  # transitive (via dedup)

    spec = REGISTRY.specs["q11"]
    h = builder_hash(spec)
    assert h == builder_hash(spec)  # deterministic
    tweaked = dataclasses.replace(spec, oracle=spec.oracle + " ")
    assert builder_hash(tweaked) != h
