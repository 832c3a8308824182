"""Gate-window registration order: the driver's correctness gate
evaluates the first 50 entries of contract.QUERIES in dict order, so the
never-gated round-2 queries and every round-3 addition must sit inside
that window (VERDICT r02 'Next round' item 1)."""

from optimizerasters_spark import contract

NEVER_GATED_R02 = [
    "til_finalize", "ledger_resolve", "encoder_matrix", "ivf_topk",
    "url_encode", "output_ext", "dir_depth", "proxy_paths",
    "rolling_fingerprint", "cell_histogram", "embedding_near_dup_lsh",
    "cell_encode", "free_space_scan_dist",
]

GATE_WINDOW = 50


def test_never_gated_queries_in_gate_window():
    window = list(contract.QUERIES)[:GATE_WINDOW]
    missing = [n for n in NEVER_GATED_R02 if n not in window]
    assert not missing, f"outside the 50-entry gate window: {missing}"


def test_round3_queries_in_gate_window():
    window = list(contract.QUERIES)[:GATE_WINDOW]
    added = [n for n in ("ivf_train", "kmeans_assign", "training_flagship",
                         "salted_topk", "pip_join_convex",
                         "pyramid_resample", "chunk_documents",
                         "html_extract", "sq_encode", "geoparse",
                         "url_parts", "domain_cap", "hash_sample", "asof_join", "media_resize")
             if n in contract.QUERIES]
    missing = [n for n in added if n not in window]
    assert not missing, f"round-3 additions outside gate window: {missing}"


def test_reorder_loses_no_queries():
    # every registered query survived the reorder and still has its oracle
    assert len(contract.QUERIES) >= 63
    assert len(set(contract.QUERIES)) == len(contract.QUERIES)
    no_oracle = [n for n in contract.QUERIES if n not in contract.ORACLES]
    assert not no_oracle, f"queries without oracle SQL: {no_oracle}"


def test_priority_list_names_exist():
    # a typo in GATE_PRIORITY would silently drop a query out of the
    # window — every listed name must be registered or a declared
    # round-3 placeholder
    placeholders: set[str] = set()  # every priority name must exist now
    unknown = [n for n in contract.GATE_PRIORITY
               if n not in contract.QUERIES and n not in placeholders]
    assert not unknown, f"GATE_PRIORITY names not registered: {unknown}"
