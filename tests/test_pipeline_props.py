"""Property checks for the pipeline/analytics/DML extension operators
(SURVEY.md §2.M) — invariants that hold independently of the oracle and
guard the semantics the hash compare can't see (e.g. a 0-row result
vacuously hash-matching)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_cluster_labels_are_connected_components(spark, registry):
    """Every verified near-dup pair lands inside one cluster, every
    cluster_id is a real representative, and labels are minima."""
    qs, _ = registry
    cl = qs["llm_dedup_clusters"](spark, SF_DIR).toPandas()
    assert (cl.cluster_id <= cl.doc_id).all()
    reps = set(cl[cl.is_representative].doc_id)
    assert set(cl.cluster_id) <= reps
    pairs = qs["llm_minhash_det"](spark, SF_DIR).toPandas()
    lab = dict(zip(cl.doc_id, cl.cluster_id))
    assert all(lab[a] == lab[b] for a, b in zip(pairs.doc_a, pairs.doc_b))


def test_minhash_det_is_subset_of_exact_jaccard_pairs(spark, registry):
    """LSH-verified pairs (tau=0.9) must be a subset of the exact-Jaccard
    pair set at its lower threshold (0.5): candidate generation may miss
    pairs (recall<1) but verification must never admit a false positive."""
    qs, _ = registry
    lsh = qs["llm_minhash_det"](spark, SF_DIR).toPandas()
    exact = qs["llm_jaccard_exact"](spark, SF_DIR).toPandas()
    exact_pairs = set(zip(exact.doc_a, exact.doc_b))
    assert set(zip(lsh.doc_a, lsh.doc_b)) <= exact_pairs
    assert (lsh.jaccard >= 0.9).all()


def test_hash_sample_deterministic_and_stratified_rates(spark, registry):
    qs, _ = registry
    a = sorted(qs["llm_hash_sample"](spark, SF_DIR).toPandas().doc_id)
    b = sorted(qs["llm_hash_sample"](spark, SF_DIR).toPandas().doc_id)
    assert a == b and len(a) > 0
    strat = qs["llm_stratified_sample"](spark, SF_DIR).toPandas()
    # en downsampled 1/16 vs 1/2 for the rest: en share must drop far below
    # its ~majority share of the corpus
    n_en = (strat.lang == "en").sum()
    assert 0 < n_en < len(strat) / 2


def test_funnel_latency_bounds_and_retention_sanity(spark, registry):
    qs, _ = registry
    fu = qs["evt_funnel"](spark, SF_DIR).toPandas()
    assert len(fu) > 0, "funnel must be non-trivial on fixture data"
    assert ((fu.latency_us > 0) & (fu.latency_us <= 7 * 86400 * 1_000_000)).all()
    ret = qs["evt_retention"](spark, SF_DIR).toPandas()
    assert (ret.retained <= ret.n_active).all()


def test_merge_partitions_into_consistent_actions(spark, registry):
    """unchanged + updated = base rows; inserted keys are disjoint."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    m = qs["dml_merge_upsert"](spark, SF_DIR).toPandas()
    base = load_table(spark, SF_DIR, "orders")
    n_base = base.count()
    counts = m.merge_action.value_counts().to_dict()
    assert counts.get("unchanged", 0) + counts.get("updated", 0) == n_base
    base_max = base.agg(F.max("o_orderkey")).collect()[0][0]
    assert (m[m.merge_action == "inserted"].o_orderkey > base_max).all()


def test_chunks_reassemble_to_document(spark, registry):
    """Stride-80/width-100 chunks: stripping the 20-char overlap from every
    chunk after the first reconstitutes the original text exactly."""
    qs, _ = registry
    ch = qs["llm_chunk_split"](spark, SF_DIR).toPandas()
    from hive_test_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()
    by_doc = {
        doc_id: "".join(
            t if i == 0 else t[20:]
            for i, t in enumerate(
                g.sort_values("chunk_idx").chunk_text.tolist()
            )
        )
        for doc_id, g in ch.groupby("doc_id")
    }
    sample = docs.head(50)
    for doc_id, text in zip(sample.doc_id, sample.text):
        assert by_doc[doc_id] == text


def test_pii_redact_leaves_no_pii(spark, registry):
    qs, _ = registry
    r = qs["llm_pii_redact"](spark, SF_DIR).toPandas()
    assert (r.n_pii >= 2).all()
    assert r.redacted.str.contains("<email>").all()
    assert r.redacted.str.contains("<phone>").all()
    assert not r.redacted.str.contains("@example.com").any()


def test_stopword_strip_conserves_non_stop_tokens(spark, registry):
    qs, _ = registry
    s = qs["llm_stopword_strip"](spark, SF_DIR).toPandas()
    assert (s.n_kept <= s.n_orig).all()
    assert (s.n_kept == s.kept_text.map(lambda t: len(t.split()) if t else 0)).all()


def test_incremental_minhash_consistent_with_full_self_join(spark, registry):
    """Every verified (incoming, existing) pair the incremental probe
    reports must appear in llm_minhash_det's full self-join output (as
    (min, max) ordered pairs), and every full-join pair straddling the
    batch split must be found by the probe — the index probe loses
    nothing vs the bootstrap run."""
    from tests.conftest import SF_DIR

    qs, _ = registry
    inc = qs["llm_incremental_minhash"](spark, SF_DIR)
    full = qs["llm_minhash_det"](spark, SF_DIR)
    inc_rows = inc.collect()
    inc_pairs = {
        (min(r.doc_id, r.best_match_id), max(r.doc_id, r.best_match_id))
        for r in inc_rows
        if r.best_match_id is not None
    }
    full_pairs = {(r.doc_a, r.doc_b) for r in full.collect()}
    assert inc_pairs <= full_pairs, inc_pairs - full_pairs
    straddling_best = {
        (a, b)
        for a, b in full_pairs
        if (a % 5 == 0) != (b % 5 == 0)
    }
    # Each incoming doc reports only its BEST match; every incoming doc
    # with any straddling pair must be matched (is_new = False).
    incoming_with_dup = {
        (a if a % 5 == 0 else b) for a, b in straddling_best
    }
    matched = {r.doc_id for r in inc_rows if not r.is_new}
    assert incoming_with_dup == matched


def test_bpe_train_merge_table_invariants(spark, registry):
    """llm_bpe_train: the max adjacent-pair count is non-increasing
    across rounds (a merge only removes occurrences of existing pairs
    and creates pairs bounded by the merged pair's count), every round
    merges a distinct token, and each merged token is the concatenation
    of its parts."""
    from tests.conftest import SF_DIR

    qs, _ = registry
    rows = qs["llm_bpe_train"](spark, SF_DIR).collect()
    assert [r.round for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.pair_count for r in rows]
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))
    merged = [r.merged_tok for r in rows]
    assert len(set(merged)) == len(merged)
    for r in rows:
        assert r.merged_tok == r.left_tok + r.right_tok
