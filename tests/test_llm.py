"""LLM-operator behavior tests beyond the oracle (SURVEY.md §2.L):
LSH recall vs exact ground truth, SimHash locality, multimodal stub."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def test_minhash_lsh_recall_vs_exact(spark, registry):
    """The raw LSH candidate pairs must recover most true Jaccard>=0.5
    pairs and report symmetric, deduplicated (a<b) pairs; the registered
    property-oracle row must agree (its booleans are derived from the
    same candidate set in-query)."""
    from hive_test_spark.llm.dedup import minhash_candidate_pairs

    qs, _ = registry
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in qs["llm_jaccard_exact"](spark, SF_DIR).collect()
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(spark, SF_DIR).collect()
    }
    assert all(a < b for a, b in approx)
    if truth:
        recall = len(truth & approx) / len(truth)
        assert recall >= 0.8, f"LSH recall {recall:.2f} over {len(truth)} true pairs"
    [row] = qs["llm_near_dedup_minhash"](spark, SF_DIR).collect()
    assert row["candidates_all_true"] is True
    assert row["recall_ok"] is True
    assert row["n_true_pairs"] > 0


def test_simhash_locality(spark, registry):
    """Identical docs get identical simhash; fingerprints are 48-bit."""
    qs, _ = registry
    rows = qs["llm_simhash"](spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["simhash"] < (1 << 48)


def test_ann_ivf_is_subset_of_exact_topk_space(spark, registry):
    """IVF results are true neighbors (cos computed exactly) and at most
    TOP_K per probe."""
    import collections

    qs, _ = registry
    rows = qs["llm_ann_ivf"](spark, SF_DIR).collect()
    per_probe = collections.Counter(r["probe_id"] for r in rows)
    assert all(v <= 5 for v in per_probe.values())
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in rows)


def test_multimodal_decode_stub_raises():
    from hive_test_spark.llm.multimodal import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_multimodal_fake_decoder_deterministic(spark, registry):
    qs, _ = registry
    a = qs["llm_multimodal_binary"](spark, SF_DIR).toPandas().sort_values("doc_id")
    b = qs["llm_multimodal_binary"](spark, SF_DIR).toPandas().sort_values("doc_id")
    assert a.equals(b)
    assert (a["width"].between(64, 703)).all()
    assert (a["height"].between(64, 543)).all()


def test_exact_dedup_no_duplicate_hashes(spark, registry):
    qs, _ = registry
    pdf = qs["llm_exact_dedup"](spark, SF_DIR).toPandas()
    assert pdf["content_hash"].is_unique


def test_ann_lsh_candidate_reduction(spark, registry):
    """LSH must examine far fewer pairs than brute force and agree with the
    exact near-dup contract on every pair it does emit."""
    from hive_test_spark.io import load_table
    from hive_test_spark.llm.similarity import LSH_TAU

    qs, _ = registry
    from tests.conftest import SF_DIR

    n = load_table(spark, SF_DIR, "embeddings").count()
    out = qs["llm_ann_lsh"](spark, SF_DIR).collect()
    assert 0 < len(out) < n * (n - 1) / 2 / 10  # >10x below brute-force pairs
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert r["cos_sim"] >= LSH_TAU
