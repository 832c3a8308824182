"""Gate-window registration order: the driver's correctness gate
evaluates the first 50 entries of contract.QUERIES in dict order. The
round-4 invariant (VERDICT r03 'Next round' #5): every query whose last
hard-signal row is r02, plus every query added or changed in round 4,
sits inside the window — so CORRECTNESS_r04 ∪ r03 covers ALL registered
queries with rows at most one round old."""

from optimizerasters_spark import contract

# new or behavior-changed in round 4 — need a fresh r04 row
R04_NEW_OR_CHANGED = [
    "pip_join_ring", "pii_scrub", "repetition_quality", "decontaminate",
    "paragraph_dedup", "ring_stats", "pq_encode", "pq_adc_topk",
    "ivf_pq_topk", "dup_components", "blocklist_filter",
    "remove_boilerplate", "stratified_sample", "robots_filter",
    "geoparse", "media_resize", "encoder_matrix", "til_finalize",
]

# queries whose last gate row is r02 (rotated out of the r03 window)
R02_VETERANS = [
    "pages_synth", "tile_assign", "path_classify", "hashkey_path",
    "sniff_dispatch", "job_success", "timing_pivot", "pyramid_factors",
    "path_functions", "dedup_exact", "token_count", "quality_score",
    "lang_id", "fingerprint", "pricing_summary",
    "top_customers_per_nation", "media_decode", "frame_sample",
    "events_json", "sessionize", "lang_source_rollup", "set_ops",
    "tile_bin_counts", "rasterize_tiles", "vectorize_tiles",
    "distinct_users", "top_tokens", "value_percentiles",
]

# green rows in CORRECTNESS_r03.json (the driver's r03 gate window)
R03_GREEN = {
    "til_finalize", "ledger_resolve", "encoder_matrix", "ivf_topk",
    "url_encode", "output_ext", "dir_depth", "proxy_paths",
    "rolling_fingerprint", "cell_histogram", "embedding_near_dup_lsh",
    "cell_encode", "free_space_scan_dist", "ivf_train", "kmeans_assign",
    "training_flagship", "salted_topk", "pip_join_convex",
    "pyramid_resample", "chunk_documents", "html_extract", "sq_encode",
    "geoparse", "url_parts", "domain_cap", "hash_sample", "asof_join",
    "media_resize", "pip_join_left", "proxy_csv", "tile_manifest",
    "free_space_scan", "pip_join", "tile_counts_pyramid", "knn_per_cell",
    "dedup_latest", "minhash_lsh_pairs", "ngram_jaccard", "simhash_ann",
    "embedding_near_dup", "cosine_topk", "knn_kring", "knn_kring_df",
    "salted_join", "salted_cell_payloads", "til_barrier", "til_members",
    "stem_groups", "assoc_join", "resume_pending",
}

GATE_WINDOW = 50


def test_new_and_changed_queries_in_gate_window():
    window = list(contract.QUERIES)[:GATE_WINDOW]
    missing = [n for n in R04_NEW_OR_CHANGED if n not in window]
    assert not missing, f"r04 new/changed outside gate window: {missing}"


def test_r02_veterans_rotated_into_gate_window():
    window = list(contract.QUERIES)[:GATE_WINDOW]
    missing = [n for n in R02_VETERANS if n not in window]
    assert not missing, f"r02-row veterans outside gate window: {missing}"


def test_every_query_has_a_fresh_row_source():
    """Window ∪ r03-green must cover every registered query: anything
    outside the window must already hold a green r03 row."""
    window = set(list(contract.QUERIES)[:GATE_WINDOW])
    stale = [n for n in contract.QUERIES
             if n not in window and n not in R03_GREEN]
    assert not stale, f"queries with no fresh gate-row source: {stale}"


def test_reorder_loses_no_queries():
    # every registered query survived the reorder and still has its oracle
    assert len(contract.QUERIES) >= 84
    assert len(set(contract.QUERIES)) == len(contract.QUERIES)
    no_oracle = [n for n in contract.QUERIES if n not in contract.ORACLES]
    assert not no_oracle, f"queries without oracle SQL: {no_oracle}"


def test_gate_safe_output_schemas(spark, sf_dir):
    """The driver's canonicalizer sorts result columns with pandas
    before hashing; list/dict cells are unhashable and ERROR the gate
    row (r04's pq_encode). Every registered query must therefore emit
    scalar columns only — arrays/maps are exploded or joined into
    strings before return. Schema analysis only, no execution."""
    from pyspark.sql import types as T
    bad = {}
    for name, fn in contract.QUERIES.items():
        schema = fn(spark, sf_dir).schema
        offending = [f.name for f in schema.fields
                     if isinstance(f.dataType, (T.ArrayType, T.MapType))]
        if offending:
            bad[name] = offending
    assert not bad, f"array/map output columns break the gate: {bad}"


def test_priority_list_names_exist():
    # a typo in GATE_PRIORITY would silently drop a query out of the
    # window — every listed name must be registered
    unknown = [n for n in contract.GATE_PRIORITY
               if n not in contract.QUERIES]
    assert not unknown, f"GATE_PRIORITY names not registered: {unknown}"
    assert len(contract.GATE_PRIORITY) == len(set(contract.GATE_PRIORITY))
