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
    # r02; s10_tws = the Spark 4 stateful-processor API running for
    # real through the protobuf bridge, round-5 headline)
    "s1_tumbling", "s3_merge_replay", "s4_session", "s5_stateful",
    "s9_outer_join", "s10_tws", "s11_recovery",
    # text / curation (r05: t_perplexity/t_dsir rotated out r4-green;
    # the never-proven winnow fingerprint + chunking enter)
    "t_quality", "t_tokens", "t_winnow", "t_chunk",
    "curate_pipeline", "curate_pipeline2",
    # dedup surface (r05: paragraph/substring/wide/highrecall rotated
    # out r4-green; the composed canonical pass at the contract
    # shingle layout enters)
    "dedup_exact", "dedup_minhash",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_shingle",
    "dedup_components", "dedup_incremental", "dedup_canonical_shingle",
    # similarity / ANN (r05: the PQ family enters)
    "q26", "ann_ivf_batch", "ann_lsh", "ann_ivf_trained",
    "emb_neardup", "emb_neardup_semdedup", "emb_semdedup",
    "emb_semdedup_gemm", "emb_pq", "ann_pq_batch", "bm25_topk",
    # composed pipelines (cwe_enrich / mm_features / mm_frames rotated
    # out r03-green; mm_png = the REAL PNG decode, new in r05)
    "cve_pipeline", "mm_png",
    # engine surface (r05: the subquery family q29/q30/q33 and the
    # never-proven pivot/gapfill/IVM/diff/HLL-merge/pagerank/layout
    # operators enter; q06/q31/q32/q34/e_dq_audit/e_cms/e_rolling
    # rotate out r4-green)
    "e_merge_delete", "e_scd2", "e_pivot", "e_unpivot", "e_gapfill",
    "e_ivm_join", "e_table_diff", "e_hll_merge", "g_pagerank",
    "e_zorder_part", "q29", "q30", "q33",
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
    # r05 rotation: the five r04-green readers cede their slots to the
    # two that never had driver evidence (src_orc, src_cwe_xml_udtf —
    # now IN the gate)
    "src_nvd": "r04",
    "src_cveorg_zip": "r04",
    "src_exploitdb": "r04",
    "src_cwe_xml": "r04",
    "src_pyds": "r04",
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
