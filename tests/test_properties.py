"""Property-based spot checks (SURVEY.md §5.4): algebraic identities that
catch operator-wiring bugs independently of the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_semi_plus_anti_covers_left(spark):
    """semi ∪ anti partitions the left keyset (on the same join pred)."""
    from hive_test_spark.io import load_table

    c = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    assert semi + anti == c.count()


def test_cube_contains_rollup_contains_groupby(spark, registry):
    qs, _ = registry
    cube = qs["agg_cube"](spark, SF_DIR).count()
    rollup = qs["agg_rollup"](spark, SF_DIR).count()
    from hive_test_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    plain = li.groupBy("l_returnflag", "l_linestatus").count().count()
    n_flags = li.select("l_returnflag").distinct().count()
    assert rollup == plain + n_flags + 1
    assert cube >= rollup


def test_count_star_equals_sum_of_group_counts(spark, registry):
    from hive_test_spark.io import load_table

    qs, _ = registry
    basic = qs["agg_groupby_basic"](spark, SF_DIR)
    total = basic.agg(F.sum("num_orders")).collect()[0][0]
    assert total == load_table(spark, SF_DIR, "orders").count()


def test_approx_distinct_close_to_exact(spark, registry):
    """The op now emits the tolerance check itself (property oracle):
    every group must report the HLL estimate within 3×rsd of exact, and
    the exact counts must match an independent countDistinct."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["agg_approx_distinct"](spark, SF_DIR).collect()
    assert rows and all(r["approx_within_tol"] for r in rows)
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["exact_parts"] == exact[r["l_returnflag"]]


def test_sort_within_partitions_monotone(spark, registry):
    """Partition-local order: within every partition, keys are sorted
    (the rows-only check promised in SURVEY.md §2.F)."""
    from hive_test_spark.operators.sorts import sorted_partitions_frame

    qs, _ = registry
    pdf = sorted_partitions_frame(spark, SF_DIR).toPandas()
    for _, grp in pdf.groupby("part_id"):
        keys = list(zip(grp["l_suppkey"], grp["l_shipdate"]))
        assert keys == sorted(keys)
    # The registered property row must agree with the direct check.
    [row] = qs["sort_within_partitions"](spark, SF_DIR).collect()
    assert row["all_partitions_sorted"] is True
    assert row["keys_disjoint"] is True


def test_union_all_minus_distinct_counts(spark, registry):
    qs, _ = registry
    bag = qs["set_union_all"](spark, SF_DIR)
    st = qs["set_union_distinct"](spark, SF_DIR)
    assert bag.count() == st.count()  # one row per distinct key in both
    assert bag.agg(F.sum("n")).collect()[0][0] >= st.count()


def test_topk_bounded_per_group(spark, registry):
    qs, _ = registry
    pdf = qs["win_topk_per_group"](spark, SF_DIR).toPandas()
    assert pdf.groupby("c_nationkey").size().max() <= 3


def test_bare_limit_rowcount(spark):
    """Bare CollectLimit (nondeterministic row choice, exact row count)."""
    from hive_test_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    assert li.limit(100).count() == 100


def test_pagerank_mass_conserved(spark, registry):
    """Damped PageRank on a graph with no dangling nodes conserves rank
    mass: sum(pr) == 1 up to rounding."""
    qs, _ = registry
    pdf = qs["graph_pagerank"](spark, SF_DIR).toPandas()
    assert abs(pdf["pr"].sum() - 1.0) < 1e-5
    assert (pdf["pr"] > 0).all()


def test_triangle_counts_consistent(spark, registry):
    """Every triangle contributes exactly 3 corner credits."""
    qs, _ = registry
    pdf = qs["graph_triangles"](spark, SF_DIR).toPandas()
    assert pdf["n_triangles"].sum() % 3 == 0
    assert (pdf["n_triangles"] >= 1).all()


def test_ewma_bounded_by_series_extremes(spark, registry):
    """EWMA is a convex combination: every smoothed value lies within its
    own series' [min, max] of raw values."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    pdf = qs["evt_ewma"](spark, SF_DIR).toPandas()
    raw = load_table(spark, SF_DIR, "events").select("user_id", "value").toPandas()
    bounds = raw.groupby("user_id")["value"].agg(["min", "max"])
    j = pdf.join(bounds, on="user_id")
    assert (j["ewma"] >= j["min"] - 1e-6).all()
    assert (j["ewma"] <= j["max"] + 1e-6).all()


def test_fill_forward_null_before_first_purchase(spark, registry):
    qs, _ = registry
    pdf = qs["evt_fill_forward"](spark, SF_DIR).toPandas()
    assert pdf["last_purchase_value"].isna().any()  # pre-first-purchase rows
    assert pdf["last_purchase_value"].notna().any()


def test_span_dedup_fraction_bounds(spark, registry):
    qs, _ = registry
    pdf = qs["llm_span_dedup"](spark, SF_DIR).toPandas()
    assert ((pdf["dup_frac"] >= 0) & (pdf["dup_frac"] <= 1)).all()
    assert (pdf["n_dup_grams"] <= pdf["n_grams"]).all()
    assert pdf["keep"].nunique() == 2  # both classes present — not vacuous


def test_domain_cap_respected(spark, registry):
    from hive_test_spark.io import load_table

    qs, _ = registry
    pdf = qs["llm_domain_cap"](spark, SF_DIR).toPandas()
    raw = load_table(spark, SF_DIR, "documents").groupBy("lang").count().toPandas()
    sizes = pdf.groupby("lang").size()
    for _, row in raw.iterrows():
        assert sizes[row["lang"]] == min(row["count"], 100)


def test_dsir_separates_target_slice(spark, registry):
    """Sanity of the importance model: the 'en' slice must score higher
    on average than the rest (it IS the target distribution)."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    pdf = qs["llm_importance_weights"](spark, SF_DIR).toPandas()
    langs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang").toPandas()
    j = pdf.merge(langs, on="doc_id")
    en = j[j["lang"] == "en"]["dsir_weight"].mean()
    rest = j[j["lang"] != "en"]["dsir_weight"].mean()
    assert en > rest


def test_bpe_pairs_cover_alphabet(spark, registry):
    qs, _ = registry
    pdf = qs["llm_bpe_pair_counts"](spark, SF_DIR).toPandas()
    assert (pdf["pair"].str.len() == 2).all()
    assert pdf["n"].sum() > 10000  # every occurrence counts, not distinct words


def test_semdedup_keeps_cluster_exemplar(spark, registry):
    """Every cluster keeps at least its lowest-id member, and dropped
    vectors all have a qualifying close neighbor."""
    qs, _ = registry
    pdf = qs["llm_semdedup"](spark, SF_DIR).toPandas()
    for _, grp in pdf.groupby("cluster"):
        assert grp.loc[grp["vec_id"].idxmin()]["keep"]  # exemplar survives
    dropped = pdf[~pdf["keep"]]
    assert (dropped["max_sim"] >= 0.30).all()
    assert 0 < len(dropped) < len(pdf)  # both classes present


def test_pipeline_e2e_stage_monotone(spark, registry):
    """Stage verdicts are monotone: final_keep ⊆ is_canonical ⊆
    passed_quality, and every stage actually drops something."""
    qs, _ = registry
    pdf = qs["llm_pipeline_e2e"](spark, SF_DIR).toPandas()
    assert (~pdf["is_canonical"] | pdf["passed_quality"]).all()
    assert (~pdf["final_keep"] | pdf["is_canonical"]).all()
    n = len(pdf)
    nq, nc, nf = pdf["passed_quality"].sum(), pdf["is_canonical"].sum(), pdf["final_keep"].sum()
    assert n > nq > nc >= nf > 0


def test_rolling_median_within_series_bounds(spark, registry):
    from hive_test_spark.io import load_table

    qs, _ = registry
    pdf = qs["evt_rolling_median"](spark, SF_DIR).toPandas()
    raw = load_table(spark, SF_DIR, "events").select("user_id", "value").toPandas()
    bounds = raw.groupby("user_id")["value"].agg(["min", "max"])
    j = pdf.join(bounds, on="user_id")
    assert (j["rolling_med"] >= j["min"] - 1e-6).all()
    assert (j["rolling_med"] <= j["max"] + 1e-6).all()


def test_sketch_flags_all_true(spark, registry):
    qs, _ = registry
    pdf = qs["agg_sketch_distinct"](spark, SF_DIR).toPandas()
    assert pdf["within_5pct"].all() and pdf["merge_consistent"].all()


def test_epoch_shuffle_orders_differ_but_conserve(spark, registry):
    """llm_epoch_shuffle's contract: each epoch is a DIFFERENT
    permutation (the epoch is the seed), yet every epoch covers every
    doc exactly once and per-(epoch, shard) positions are dense 1..n."""
    qs, _ = registry
    rows = qs["llm_epoch_shuffle"](spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.shard_pos)
    assert len(by_epoch) == 2
    e0, e1 = by_epoch[0], by_epoch[1]
    assert set(e0) == set(e1), "both epochs must cover the same docs"
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > len(e0) * 0.9, "epochs must be different permutations"
    for assign in (e0, e1):
        per_shard = {}
        for shard, pos in assign.values():
            per_shard.setdefault(shard, []).append(pos)
        for shard, ps in per_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {shard} positions not dense"


def test_train_val_split_partitions_corpus(spark, registry):
    """llm_train_val_split: splits are disjoint and exhaustive (totals
    conserve, every cell's docs are distinct), and train holds the bulk."""
    qs, _ = registry
    rows = qs["llm_train_val_split"](spark, SF_DIR).collect()
    from hive_test_spark.io import load_table

    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs, "split must be exhaustive"
    assert all(r.n_docs == r.n_distinct for r in rows)
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > 0.8 * n_docs


def test_curriculum_global_positions_are_a_permutation(spark, registry):
    """llm_curriculum_order: global_pos is a dense 1..N permutation and
    stages are contiguous position ranges (stage 1 strictly before 2...)."""
    qs, _ = registry
    rows = qs["llm_curriculum_order"](spark, SF_DIR).collect()
    pos = sorted(r.global_pos for r in rows)
    assert pos == list(range(1, len(rows) + 1))
    max_by_stage = {}
    min_by_stage = {}
    for r in rows:
        max_by_stage[r.stage] = max(max_by_stage.get(r.stage, 0), r.global_pos)
        min_by_stage[r.stage] = min(min_by_stage.get(r.stage, 1 << 60), r.global_pos)
    stages = sorted(max_by_stage)
    for a, b in zip(stages, stages[1:]):
        assert max_by_stage[a] < min_by_stage[b], "stages must be contiguous ranges"


def test_kmeans_improves_on_init(spark, registry):
    """llm_kmeans_lloyd: the Lloyd update must not increase within-
    cluster dispersion — mean distance-to-centroid after the update is
    <= after the hash-sharded init (monotone descent property)."""
    from hive_test_spark.io import load_table
    from hive_test_spark.llm.cluster import KMEANS_K, _assign, _centroids

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb")
    )
    c0 = _centroids(e.select((F.col("vec_id") % KMEANS_K).alias("cluster"), "emb"))
    a1 = _assign(e, c0)
    c1 = _centroids(a1)
    a2 = _assign(e, c1)

    def dispersion(assign, cents):
        d = assign.join(cents, "cluster").select(
            F.expr(
                "aggregate(zip_with(emb, centroid, (x, y) -> (x - y) * (x - y)), "
                "0D, (acc, v) -> acc + v)"
            ).alias("d")
        )
        return d.agg(F.avg("d")).collect()[0][0]

    assert dispersion(a2, c1) <= dispersion(a1, c0) + 1e-9


def test_survival_curve_is_monotone_from_one(spark, registry):
    """K-M survival starts ≤ 1, never increases, and the risk set
    telescopes: n_{t+1} = n_t - d_t - c_t in event-time order."""
    qs, _ = registry
    rows = sorted(
        qs["evt_survival"](spark, SF_DIR).collect(), key=lambda r: r.t_days
    )
    assert rows, "curve must be non-empty"
    prev_s = 1.0
    for i, r in enumerate(rows):
        assert 0.0 <= r.km_survival <= prev_s + 1e-9, "S(t) must not increase"
        prev_s = r.km_survival
        if i + 1 < len(rows):
            assert (
                rows[i + 1].n_at_risk == r.n_at_risk - r.d_events - r.c_censored
            ), "risk set must telescope"
    assert sum(r.d_events + r.c_censored for r in rows) == rows[0].n_at_risk


def test_user_overlap_jaccard_bounds(spark, registry):
    """Jaccard ∈ (0, 1]; overlap never exceeds either set; pair keys
    are strictly ordered (no diagonal, no mirrored duplicates)."""
    qs, _ = registry
    rows = qs["evt_user_overlap"](spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r.type_a < r.type_b
        assert (r.type_a, r.type_b) not in seen
        seen.add((r.type_a, r.type_b))
        assert 0 < r.n_both <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0


def test_corpus_drift_js_bounds(spark, registry):
    """Jensen-Shannon divergence is bounded by ln 2 in nats and
    non-negative; every source must keep a non-empty token presence."""
    import math

    qs, _ = registry
    rows = qs["llm_corpus_drift"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9
        assert r.n_tokens_present > 0


def test_pareto_shares_sum_to_one(spark, registry):
    """Decile shares are a partition of the event mass: shares sum to
    1, cum_share is non-decreasing and ends at 1, and the top decile
    dominates every later decile (ranked by construction)."""
    qs, _ = registry
    rows = sorted(
        qs["evt_pareto_share"](spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    cum = 0.0
    for r in rows:
        cum += r.share
        assert abs(r.cum_share - cum) < 1e-5
    events = [r.n_events / r.n_users for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(events, events[1:])), (
        "mean events per user must decrease across deciles"
    )


def test_zipf_fit_matches_shape(spark, registry):
    """Zipf slope must be negative (frequency falls with rank) with a
    meaningful fit, and the head share is a proper fraction."""
    qs, _ = registry
    r = qs["llm_zipf_fit"](spark, SF_DIR).collect()[0]
    assert r.vocab_size > 10
    assert r.zipf_slope < 0
    assert 0.0 <= r.zipf_r2 <= 1.0
    assert 0.0 < r.top5_share < 1.0


def test_html_strip_roundtrips_every_doc(spark, registry):
    """The constructive wrapping must strip back to the exact original
    text for every document in every source."""
    qs, _ = registry
    rows = qs["llm_html_strip"](spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert r.n_roundtrip_ok == r.n_docs, f"{r.source} lost text"
        assert r.markup_overhead > 0


def test_langid_eval_matrix_is_consistent(spark, registry):
    """The confusion matrix partitions the corpus; n_correct equals
    n_docs exactly on the diagonal and 0 off it."""
    qs, _ = registry
    rows = qs["llm_langid_eval"](spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        expected = r.n_docs if r.lang == r.predicted_lang else 0
        assert r.n_correct == expected, (r.lang, r.predicted_lang)


def test_cusum_changepoint_one_row_per_series(spark, registry):
    """One changepoint per event type, peak magnitude strictly positive
    (a flat series would make CUSUM identically ~0 only if every day
    equals the mean), day within the fixture window."""
    qs, _ = registry
    rows = qs["evt_cusum_changepoint"](spark, SF_DIR).collect()
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types)) == 5
    for r in rows:
        assert abs(r.peak_cusum) > 0
        assert r.n_days >= 25
        assert r.changepoint_day.startswith("2024-01")


def test_drawdown_invariants(spark, registry):
    """max_drawdown >= 0 always; the final equity can never exceed the
    running peak; with at least one debit-capable type every user's
    peak is >= final."""
    qs, _ = registry
    pdf = qs["evt_drawdown"](spark, SF_DIR).toPandas()
    assert (pdf["max_drawdown"] >= 0).all()
    assert (pdf["final_equity"] <= pdf["peak_equity"] + 1e-6).all()
    assert pdf["n_events"].sum() > 0


def test_winnowing_fingerprints_bounded_by_windows(spark, registry):
    """The selected-set size can never exceed the window count, and the
    shared count can never exceed a doc's own fingerprint count."""
    qs, _ = registry
    pdf = qs["llm_winnowing"](spark, SF_DIR).toPandas()
    assert (pdf["n_fp"] <= pdf["n_windows"]).all()
    assert (pdf["n_shared_fp"] <= pdf["n_fp"]).all()
    assert (pdf["flagged"] == (pdf["n_shared_fp"] > 0)).all()


def test_preference_pairs_ordering(spark, registry):
    """chosen quality >= rejected quality, margin is their gap, and with
    n_docs >= 2 the two endpoints are distinct docs (the (q, doc_id)
    total order has no ties across rows)."""
    qs, _ = registry
    pdf = qs["llm_preference_pairs"](spark, SF_DIR).toPandas()
    assert (pdf["chosen_q"] >= pdf["rejected_q"]).all()
    assert (abs(pdf["chosen_q"] - pdf["rejected_q"] - pdf["margin"]) < 2e-6).all()
    assert (pdf["chosen_doc"] != pdf["rejected_doc"]).all()
    assert (pdf["n_docs"] >= 2).all()


def test_asof_tolerance_gate(spark, registry):
    """matched rows carry a click at most 1 day old; unmatched rows are
    fully nulled — and dropping the tolerance can only lose matches vs
    the plain as-of join."""
    import pandas as pd

    qs, _ = registry
    pdf = qs["join_asof_tolerance"](spark, SF_DIR).toPandas()
    m = pdf[pdf["matched"]]
    gaps = m["purchase_ts"] - m["last_click_ts"]
    assert (gaps <= pd.Timedelta(days=1)).all()
    assert (gaps >= pd.Timedelta(0)).all()
    um = pdf[~pdf["matched"]]
    assert um["last_click_ts"].isna().all() and um["click_value"].isna().all()
    plain = qs["join_asof"](spark, SF_DIR).toPandas()
    assert len(pdf) == len(plain)
    assert m.shape[0] <= plain["last_click_ts"].notna().sum()


def test_anomaly_mad_flags_are_bounded(spark, registry):
    """Anomaly count is bounded by the group size and the reported
    max |z| is consistent with whether anything was flagged."""
    qs, _ = registry
    pdf = qs["evt_anomaly_mad"](spark, SF_DIR).toPandas()
    assert (pdf["n_anomalies"] <= pdf["n_events"]).all()
    assert ((pdf["n_anomalies"] > 0) == (pdf["max_abs_z"] > 3.5)).all()


def test_ivf_recall_bounds(spark, registry):
    """recall@k is n_found/n_exact in [0,1] and n_found never exceeds
    the ground-truth set size."""
    qs, _ = registry
    pdf = qs["llm_ann_ivf_recall"](spark, SF_DIR).toPandas()
    assert (pdf["n_found"] <= pdf["n_exact"]).all()
    assert ((pdf["recall_at_k"] >= 0) & (pdf["recall_at_k"] <= 1)).all()


def test_token_budget_conserves(spark, registry):
    """Shares sum to 1, allocations sum to the budget (2x corpus
    tokens), and the oversample flag is exactly epochs > 1."""
    qs, _ = registry
    pdf = qs["llm_token_budget"](spark, SF_DIR).toPandas()
    assert abs(pdf["share"].sum() - 1.0) < 1e-4
    assert abs(pdf["target_tokens"].sum() - 2.0 * pdf["tokens_available"].sum()) < 1.0
    assert ((pdf["epochs"] > 1.0) == pdf["oversampled"]).all()


def test_winnowing_guarantee_shared_run_implies_shared_fp(spark):
    """The Schleimer/MOSS theorem, checked constructively on real data:
    every pair of docs sharing a run of >= w+k-1 consecutive tokens must
    share at least one selected winnowing fingerprint. Bounded to a
    120-doc panel — the theorem is per-pair, so any counterexample in
    the panel falsifies the operator."""
    from hive_test_spark.io import load_table
    from hive_test_spark.llm.text import _WINNOW_K, _WINNOW_W

    run = _WINNOW_K + _WINNOW_W - 1
    d = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", F.split("text", " ").alias("tok"))
        .filter(F.size("tok") >= run)
    )
    g6 = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(tok) - {run - 1}), "
                f"i -> concat_ws(' ', slice(tok, i, {run})))"
            )
        ).alias("g"),
    ).distinct()
    pairs = (
        g6.alias("a")
        .join(g6.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
    )
    hs = F.expr(
        f"transform(sequence(1, size(tok) - {_WINNOW_K - 1}), "
        f"i -> CAST(conv(substring(md5(concat_ws(' ', slice(tok, i, {_WINNOW_K}))), 1, 12), 16, 10) AS BIGINT))"
    )
    fps = (
        d.withColumn("hs", hs)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(1, size(hs) - {_WINNOW_W - 1}), "
                    f"p -> array_min(slice(hs, p, {_WINNOW_W}))))"
                )
            ).alias("fp"),
        )
    )
    covered = (
        pairs.join(fps.alias("fa"), F.col("da") == F.col("fa.doc_id"))
        .join(
            fps.alias("fb"),
            (F.col("db") == F.col("fb.doc_id")) & (F.col("fa.fp") == F.col("fb.fp")),
        )
        .select("da", "db")
        .distinct()
    )
    n_pairs, n_covered = pairs.count(), covered.count()
    assert n_pairs > 0, "panel must contain shared-run pairs (vacuous otherwise)"
    assert n_covered == n_pairs, (
        f"winnowing guarantee violated: {n_pairs - n_covered} of {n_pairs} "
        f"shared-run pairs share no fingerprint"
    )


def test_url_dedup_survivor_is_group_min(spark, registry):
    """Every reported group has >= 2 docs, more docs than raw variants
    is impossible, and the survivor never exceeds the group size's
    smallest possible id bound (survivor elections are min-id)."""
    qs, _ = registry
    rows = qs["llm_url_dedup"](spark, SF_DIR).collect()
    assert rows, "dedup must find collisions on this fixture"
    for r in rows:
        assert r.n_docs >= 2
        assert r.n_raw_variants <= r.n_docs
        assert r.canonical_url == r.canonical_url.lower()


def test_badwords_fraction_bounds(spark, registry):
    """n_bad <= n_tokens, frac in [0,1], and keep <=> frac <= threshold."""
    qs, _ = registry
    from hive_test_spark.llm.curation import _BADWORD_MAX_FRAC

    rows = qs["llm_badwords_filter"](spark, SF_DIR).collect()
    assert rows
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows), "threshold must split the corpus"
    for r in rows:
        assert 0 <= r.n_bad <= r.n_tokens
        assert r.keep == (r.n_bad / r.n_tokens <= _BADWORD_MAX_FRAC)


def test_covisitation_pairs_oriented_and_supported(spark, registry):
    """item_a < item_b (no mirrored or diagonal pairs) and every pair
    meets min support; n_users never exceeds the user population."""
    qs, _ = registry
    from hive_test_spark.io import load_table

    rows = qs["evt_covisitation"](spark, SF_DIR).collect()
    assert rows
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    for r in rows:
        assert r.item_a < r.item_b
        assert 2 <= r.n_users <= n_users


def test_seasonal_decompose_reconstructs(spark, registry):
    """Where trend is defined: observed == trend + seasonal + residual
    (to rounding); seasonal depends only on dow; edges have null trend."""
    qs, _ = registry
    rows = qs["evt_seasonal_decompose"](spark, SF_DIR).collect()
    assert len(rows) >= 28
    by_dow = {}
    for r in rows:
        if r.trend is None:
            assert r.residual is None
            continue
        assert abs(r.observed - (r.trend + r.seasonal + r.residual)) < 1e-4
        by_dow.setdefault(r.dow, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in by_dow.values()), "seasonal must be a dow constant"


def test_gdpr_erasure_conserves_rows(spark, registry):
    """after = before - erased per table, and the cascade can only
    shrink down the FK chain in fraction terms when keys are uniform."""
    qs, _ = registry
    rows = {r.table_name: r for r in qs["dml_gdpr_erasure"](spark, SF_DIR).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for r in rows.values():
        assert r.rows_after == r.rows_before - r.rows_erased
        assert 0 < r.rows_erased < r.rows_before


def test_rate_limit_rollup_consistent(spark, registry):
    """max_bucket <= total_events, burst buckets <= buckets, and the
    limited flag is exactly max_bucket >= threshold."""
    qs, _ = registry
    from hive_test_spark.operators.analytics import _RATE_BURST_AT

    rows = qs["evt_rate_limit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.max_bucket <= r.total_events
        assert r.n_burst_buckets <= r.n_buckets
        assert r.limited == (r.max_bucket >= _RATE_BURST_AT)


def test_bm25_scores_positive_and_ranked(spark, registry):
    """Lucene idf keeps every score positive; rk is a 1..k permutation
    per query with scores non-increasing in rank."""
    qs, _ = registry
    rows = qs["llm_bm25_score"](spark, SF_DIR).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r.score > 0
        per_q.setdefault(r.query_id, []).append((r.rk, r.score))
    for q, rs in per_q.items():
        rs.sort()
        assert [k for k, _ in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i][1] >= rs[i + 1][1] for i in range(len(rs) - 1))


def test_mmr_first_pick_is_top_relevance(spark, registry):
    """rk=1 equals the pure-relevance argmax (MMR reduces to relevance
    when nothing is selected yet), selections are unique per query, and
    exactly K are returned."""
    qs, _ = registry
    from hive_test_spark.llm.similarity import _MMR_K

    mmr = qs["llm_mmr_diversify"](spark, SF_DIR).collect()
    topk = qs["llm_cosine_topk"](spark, SF_DIR).collect()
    per_q = {}
    for r in mmr:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == _MMR_K
        assert len({r.vec_id for r in rs}) == _MMR_K
        first = next(r for r in rs if r.rk == 1)
        # cosine_topk probes coincide with MMR queries (both id < N_PROBES)
        sel1 = min(
            (x for x in topk if x.probe_id == q),
            key=lambda x: (-x.cos_sim, x.neighbor_id),
        )
        assert first.vec_id == sel1.neighbor_id


def test_rrf_rank_math(spark, registry):
    """rrf equals the sum of the reciprocal-rank terms actually present,
    and fused_rank orders by that score."""
    qs, _ = registry
    rows = qs["llm_rrf_fusion"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expect = 0.0
        if r.lex_rank is not None:
            expect += 1.0 / (60 + r.lex_rank)
        if r.den_rank is not None:
            expect += 1.0 / (60 + r.den_rank)
        assert abs(r.rrf - round(expect, 6)) < 1e-9
        assert r.lex_rank is not None or r.den_rank is not None


def test_ndcg_in_unit_interval(spark, registry):
    """0 <= ndcg <= 1 per query, idcg >= dcg, and the in-query flag
    agrees with the recomputation."""
    qs, _ = registry
    rows = qs["llm_ndcg_eval"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.in_unit_range
        assert r.idcg >= r.dcg >= 0
        assert 0.0 <= r.ndcg <= 1.0


def test_position_attribution_credit_conserves(spark, registry):
    """Every touched conversion distributes exactly 1.0 credit across
    channels, so total credit equals the number of touched conversions
    (to rounding)."""
    qs, _ = registry
    rows = qs["evt_attribution_position"](spark, SF_DIR).collect()
    assert rows
    total_credit = sum(r.total_credit for r in rows)
    from hive_test_spark.io import load_table

    ev = load_table(spark, SF_DIR, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), F.col("ts").alias("conv_ts")
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"), F.col("ts").alias("touch_ts")
    )
    touched = (
        conv.join(
            touch,
            (F.col("t_user") == F.col("user_id"))
            & (F.col("touch_ts") < F.col("conv_ts"))
            & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 7 DAY")),
            "left_semi",
        )
        .count()
    )
    assert abs(total_credit - touched) < 0.01 * max(touched, 1)


def test_benford_distribution_contract(spark, registry):
    """Digits span 1..9, observed shares sum to 1, expected shares are
    the Benford curve, chi2 terms are non-negative."""
    import math

    qs, _ = registry
    rows = qs["evt_benford"](spark, SF_DIR).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.expected_p - round(math.log10(1 + 1 / r.digit), 6)) < 1e-9
        assert r.chi2_term >= 0.0


def test_gini_in_unit_interval(spark, registry):
    """0 <= gini < 1 for any non-degenerate positive distribution."""
    qs, _ = registry
    (r,) = qs["evt_gini"](spark, SF_DIR).collect()
    assert r.n_customers > 0
    assert 0.0 <= r.gini < 1.0


def test_market_basket_rule_math(spark, registry):
    """Pair counts bounded by both marginals; confidence and lift
    recompute from the reported counts; rows ordered by lift."""
    qs, _ = registry
    rows = qs["evt_market_basket"](spark, SF_DIR).collect()
    assert rows
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.item_a < r.item_b, "pairs must be canonicalized"
        assert r.n_pair <= min(r.n_a, r.n_b)
        assert abs(r.confidence - round(r.n_pair / r.n_a, 6)) < 1e-9
        assert 0.0 < r.confidence <= 1.0


def test_acf_bounded_and_pairs_shrink_linearly(spark, registry):
    """|acf| <= 1 and, with a contiguous daily series, the overlap
    count drops by exactly one day per extra lag."""
    qs, _ = registry
    rows = sorted(qs["evt_acf"](spark, SF_DIR).collect(), key=lambda r: r.lag)
    assert [r.lag for r in rows] == list(range(1, 8))
    for r in rows:
        assert abs(r.acf) <= 1.0
        assert r.n_pairs == rows[0].n_pairs - (r.lag - 1)


def test_rouge_clipped_overlap_contract(spark, registry):
    """Overlap never exceeds either side's bigram mass; precision/
    recall/F1 recompute from the reported counts and stay in [0, 1]."""
    qs, _ = registry
    rows = qs["llm_rouge_overlap"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.overlap <= min(r.ref_bigrams, r.cand_bigrams)
        assert abs(r.rouge2_p - round(r.overlap / r.cand_bigrams, 6)) < 1e-9
        assert abs(r.rouge2_r - round(r.overlap / r.ref_bigrams, 6)) < 1e-9
        if r.overlap:
            assert (
                abs(
                    r.rouge2_f1
                    - round(2 * r.overlap / (r.ref_bigrams + r.cand_bigrams), 6)
                )
                < 1e-9
            )
        else:
            assert r.rouge2_f1 == 0.0


def test_kanonymity_accounting(spark, registry):
    """Violating classes/rows are subsets of the totals and risk_share
    recomputes; class sizes are positive."""
    qs, _ = registry
    rows = qs["llm_kanonymity"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_class_size >= 1
        assert r.n_violating_classes <= r.n_classes
        assert r.n_rows_at_risk <= r.n_rows
        assert abs(r.risk_share - round(r.n_rows_at_risk / r.n_rows, 6)) < 1e-9


def test_pmi_pair_counts_bounded_by_marginals(spark, registry):
    """c(w1,w2) <= min(c(w1), c(w2)); results ordered by PMI; every
    pair clears the minimum-frequency cut."""
    qs, _ = registry
    rows = qs["llm_pmi_collocations"](spark, SF_DIR).collect()
    assert rows
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.c12 >= 5
        assert r.c12 <= min(r.c_w1, r.c_w2)


def test_outlier_iqr_fence_contract(spark, registry):
    """Fences bracket the IQR box, outlier counts are bounded by group
    size, and share recomputes."""
    qs, _ = registry
    rows = qs["dq_outlier_iqr"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.fence_lo <= r.q1 <= r.q3 <= r.fence_hi
        assert 0 <= r.n_outliers <= r.n
        assert abs(r.outlier_share - round(r.n_outliers / r.n, 6)) < 1e-9


def test_skew_diagnose_contract(spark, registry):
    """Top-5 ranks are 1..5 with non-increasing counts; shares and the
    skew factor recompute; p50 <= p99 <= max."""
    qs, _ = registry
    rows = sorted(qs["scale_skew_diagnose"](spark, SF_DIR).collect(), key=lambda r: r.rk)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.n_ev for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert abs(r.share - round(r.n_ev / r.n_rows, 6)) < 1e-9
        assert r.skew_factor >= 1.0 - 1e-9, "max*n_keys/n_rows >= 1 always"
        assert r.p50_key_size <= r.p99_key_size <= rows[0].n_ev


def test_power_analysis_formula(spark, registry):
    """n_per_arm recomputes from the reported 6dp moments, and the
    powered flag agrees with the comparison."""
    import math

    qs, _ = registry
    rows = qs["evt_power_analysis"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expect = math.ceil(
            2.0 * (1.959964 + 0.841621) ** 2 * r.sd_val**2 / (0.05 * r.mean_val) ** 2
        )
        assert r.n_per_arm == expect
        assert r.currently_powered == int(r.n_obs >= 2 * expect)


def test_nearest_event_is_really_nearest(spark, registry):
    """For every purchase with a match, no click by the same user sits
    strictly closer than the reported gap."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["join_nearest_event"](spark, SF_DIR).collect()
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    clicks = {}
    for c in ev.filter(F.col("event_type") == "click").collect():
        clicks.setdefault(c.user_id, []).append(c.ts)
    for r in rows[:50]:
        best = min(abs((r.p_ts - t).total_seconds()) for t in clicks[r.user_id])
        assert abs(best * 1_000_000 - r.gap_us) < 1, (r.event_id, best, r.gap_us)


def test_show_create_table_facts(spark, registry):
    """The DDL readback reports the exact schema/provider/partition
    facts the exhibit table was created with."""
    qs, _ = registry
    facts = {r.element: r.value for r in qs["meta_show_create_table"](spark, SF_DIR).collect()}
    assert facts == {
        "column:o_orderkey": "bigint",
        "column:o_orderstatus": "string",
        "column:o_totalprice": "double",
        "has_location": "true",
        "partitioned_by": "o_orderstatus",
        "provider": "parquet",
    }


def test_pq_code_range_and_qerr(spark, registry):
    """Codes live in [0, K); qerr is non-negative; every vector is
    encoded exactly once; codes actually spread (a collapsed codebook
    would put every vector in one cell)."""
    from hive_test_spark.llm.cluster import PQ_K, PQ_M

    qs, _ = registry
    rows = qs["llm_ann_pq"](spark, SF_DIR).collect()
    assert len(rows) == len({r.vec_id for r in rows}) == 500
    for r in rows:
        for m in range(PQ_M):
            assert 0 <= getattr(r, f"code{m}") < PQ_K
        assert r.qerr >= 0.0
    assert len({(r.code0, r.code1, r.code2, r.code3) for r in rows}) > PQ_K


def test_concurrency_sweep_bounds(spark, registry):
    """Peak concurrency is >= 1 on every active day and never exceeds
    that day's session starts plus carried-over sessions (bounded by
    the total user count)."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["evt_concurrency_sweep"](spark, SF_DIR).collect()
    assert rows
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    for r in rows:
        assert 1 <= r.peak_concurrency <= n_users
        assert r.sessions_started >= 0


def test_new_vs_returning_partition(spark, registry):
    """new + returning == dau every day; day one is all-new; a user's
    first day is counted as new exactly once across the series."""
    qs, _ = registry
    rows = sorted(qs["evt_new_vs_returning"](spark, SF_DIR).collect(), key=lambda r: r.day)
    assert rows
    assert rows[0].new_users == rows[0].dau, "first day must be all-new"
    for r in rows:
        assert r.new_users + r.returning_users == r.dau
    from hive_test_spark.io import load_table

    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r.new_users for r in rows) == n_users


def test_prompt_render_digest_stable_and_lengths(spark, registry):
    """Rendered lengths exceed the raw text length (scaffold adds
    chars), est_tokens recomputes, and the digest is deterministic
    across two runs."""
    import math

    qs, _ = registry
    rows = {r.doc_id: r for r in qs["llm_prompt_template_render"](spark, SF_DIR).collect()}
    again = {r.doc_id: r.prompt_digest for r in qs["llm_prompt_template_render"](spark, SF_DIR).collect()}
    assert {k: v.prompt_digest for k, v in rows.items()} == again
    for r in rows.values():
        assert r.user_chars > 0 and r.sys_chars > len("You are a ")
        assert r.est_tokens == math.ceil((r.sys_chars + r.user_chars) / 4)


def test_pq_recall_in_unit_range(spark, registry):
    """recall@k in [0,1], n_exact == k for every probe, n_found <= k;
    the quantizer should beat random guessing on this clustered
    fixture (mean recall > 0.2)."""
    from hive_test_spark.llm.cluster import PQ_RECALL_K

    qs, _ = registry
    rows = qs["llm_ann_pq_recall"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_exact == PQ_RECALL_K
        assert 0 <= r.n_found <= PQ_RECALL_K
        assert 0.0 <= r.recall_at_k <= 1.0
    assert sum(r.recall_at_k for r in rows) / len(rows) > 0.2


def test_label_propagation_monotone_convergence(spark, registry):
    """Community count is non-increasing per round, the largest
    community non-decreasing, and the global min label is reached by
    round 1 and stable after."""
    qs, _ = registry
    rows = sorted(qs["graph_label_propagation"](spark, SF_DIR).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_communities <= a.n_communities
        assert b.largest_community >= a.largest_community
        assert b.min_label == rows[0].min_label, "min label can never be lost"
    assert rows[0].largest_community == 1, "round 0 is all-singletons"


def test_interarrival_quantile_ordering(spark, registry):
    """0 < p50 <= p90 <= max and the mean sits within [min-ish, max]."""
    qs, _ = registry
    rows = qs["evt_interarrival"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_gaps > 0
        assert 0 < r.p50_gap_s <= r.p90_gap_s <= r.max_gap_s
        assert 0 < r.mean_gap_s <= r.max_gap_s


def test_funnel_steps_monotone(spark, registry):
    """Funnel counts only shrink; conversion rates recompute and live
    in (0, 1]; latency is positive."""
    qs, _ = registry
    (r,) = qs["evt_funnel_steps"](spark, SF_DIR).collect()
    assert r.n_view >= r.n_click >= r.n_purchase
    assert abs(r.cvr_view_click - round(r.n_click / r.n_view, 6)) < 1e-9
    assert abs(r.cvr_total - round(r.n_purchase / r.n_view, 6)) < 1e-9
    if r.n_purchase:
        assert r.p50_total_latency_s > 0


def test_heatmap_covers_week_and_day(spark, registry):
    """dow in 0..6, hour in 0..23, and total events equal the table
    count."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["evt_heatmap_dow_hour"](spark, SF_DIR).collect()
    assert all(0 <= r.dow <= 6 and 0 <= r.hour <= 23 for r in rows)
    total = load_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in rows) == total


def test_shipping_latency_quantile_order(spark, registry):
    """p50 <= p90 <= max per priority; anomalies bounded by lines."""
    qs, _ = registry
    rows = qs["evt_shipping_latency"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p50_days <= r.p90_days <= r.max_days
        assert 0 <= r.n_anomalous <= r.n_lines


def test_lsh_tuning_monotone_in_bands(spark, registry):
    """More bands (shorter rows-per-band) ⇒ lower threshold and at
    least as many candidate pairs — the S-curve direction."""
    qs, _ = registry
    rows = sorted(qs["llm_lsh_tuning_curve"](spark, SF_DIR).collect(), key=lambda r: r.bands)
    assert [(r.bands, r.rows_per_band) for r in rows] == [(4, 4), (8, 2), (16, 1)]
    for a, b in zip(rows, rows[1:]):
        assert b.s_threshold < a.s_threshold
        assert b.n_candidate_pairs >= a.n_candidate_pairs


def test_ngram_novelty_bounds(spark, registry):
    """novelty in [0,1] and recomputes from the reported counts; every
    document appears exactly once."""
    qs, _ = registry
    rows = qs["llm_ngram_novelty"](spark, SF_DIR).collect()
    assert len(rows) == len({r.doc_id for r in rows}) == 500
    for r in rows:
        assert 0 <= r.n_unique_grams <= r.n_distinct_grams
        assert abs(r.novelty - round(r.n_unique_grams / r.n_distinct_grams, 6)) < 1e-9


def test_holt_recursion_contract(spark, registry):
    """Level starts at the first observation with zero trend; the
    recursion recomputes exactly from the reported inputs per series."""
    qs, _ = registry
    rows = qs["evt_holt_linear"](spark, SF_DIR).collect()
    assert rows
    series = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(r)
    for et, rs in series.items():
        rs.sort(key=lambda r: r.day)
        l, b = rs[0].rev, 0.0
        assert rs[0].level == round(l, 6) and rs[0].trend == 0.0
        for r in rs[1:]:
            l_new = 0.3 * r.rev + 0.7 * (l + b)
            b = 0.2 * (l_new - l) + 0.8 * b
            l = l_new
            assert abs(r.level - round(l, 6)) < 1e-9, (et, r.day)
            assert abs(r.forecast_next - round(l + b, 6)) < 1e-9


def test_cluster_purity_bounds(spark, registry):
    """Purity in [1/|labels|, 1], majority count bounded by total, and
    cluster sizes sum to the corpus."""
    qs, _ = registry
    rows = qs["llm_cluster_purity"](spark, SF_DIR).collect()
    assert rows
    assert sum(r.n_total for r in rows) == 500
    for r in rows:
        assert 1 <= r.n_majority <= r.n_total
        assert 0.1 - 1e-9 <= r.purity <= 1.0
        assert abs(r.purity - round(r.n_majority / r.n_total, 6)) < 1e-9


def test_price_elasticity_shape(spark, registry):
    """One row per brand; r2 in [0,1]; unit price positive."""
    qs, _ = registry
    rows = qs["evt_price_elasticity"](spark, SF_DIR).collect()
    assert rows
    assert len(rows) == len({r.p_brand for r in rows})
    for r in rows:
        assert 0.0 <= r.r2 <= 1.0
        assert r.mean_unit_price > 0


def test_anova_dow_contract(spark, registry):
    """7 groups over the 30-day series, F >= 0, eta² in [0,1] and
    recomputes from the reported sums of squares."""
    qs, _ = registry
    (r,) = qs["evt_anova_dow"](spark, SF_DIR).collect()
    assert r.n_groups == 7
    assert r.n_days >= 28
    assert r.f_stat >= 0.0
    assert 0.0 <= r.eta_squared <= 1.0
    assert abs(r.eta_squared - round(r.ss_between / (r.ss_between + r.ss_within), 6)) < 1e-6


def test_judge_agreement_table_consistency(spark, registry):
    """The 2x2 table sums to n; kappa recomputes from p_o and p_e and
    never exceeds 1."""
    qs, _ = registry
    (r,) = qs["llm_judge_agreement"](spark, SF_DIR).collect()
    assert r.n_both_pass + r.n_both_fail + r.n_disagree == r.n_docs
    assert abs(r.p_observed - round((r.n_both_pass + r.n_both_fail) / r.n_docs, 6)) < 1e-9
    assert r.kappa <= 1.0
    assert abs(r.kappa - round((r.p_observed - r.p_expected) / (1 - r.p_expected), 6)) < 5e-6


def test_exchange_partition_moves_all_p_rows(spark, registry):
    """After the exchange the source serves zero 'P' rows and the
    target serves exactly the orders-table 'P' count; spec counts
    reflect the move."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = {r.tbl: r for r in qs["dml_exchange_partition"](spark, SF_DIR).collect()}
    n_p = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderstatus") == "P").count()
    assert rows["source"].p_rows_visible == 0
    assert rows["source"].specs_after == 2
    assert rows["target"].p_rows_visible == n_p
    assert rows["target"].specs_after == 1


def test_active_margin_panel_contract(spark, registry):
    """Margins are non-negative, sorted ascending, d1 <= d2, and the
    panel has the configured depth with unique vectors."""
    qs, _ = registry
    rows = qs["llm_active_margin"](spark, SF_DIR).collect()
    assert len(rows) == 25 == len({r.vec_id for r in rows})
    margins = [r.margin for r in rows]
    assert margins == sorted(margins)
    for r in rows:
        assert 0 <= r.d1 <= r.d2
        assert abs(r.margin - round(r.d2 - r.d1, 6)) < 1e-9


def test_prefix_cache_monotone_in_depth(spark, registry):
    """Distinct prefixes grow (weakly) with depth while the hit share
    falls; shares stay in [0,1) and doc counts are constant."""
    qs, _ = registry
    rows = sorted(qs["llm_prefix_cache_hit"](spark, SF_DIR).collect(), key=lambda r: r.depth)
    assert [r.depth for r in rows] == [4, 8, 16]
    assert len({r.n_docs for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b.n_distinct_prefixes >= a.n_distinct_prefixes
        assert b.cache_hit_share <= a.cache_hit_share + 1e-9
    for r in rows:
        assert 0.0 <= r.cache_hit_share < 1.0


def test_kcenter_radii_non_increasing_and_centers_unique(spark, registry):
    """Selection radii never increase (the farthest point can only get
    closer as centers accumulate), centers are distinct, and the seed
    is the minimum vector id."""
    qs, _ = registry
    rows = sorted(qs["llm_coreset_kcenter"](spark, SF_DIR).collect(), key=lambda r: r.step)
    assert [r.step for r in rows] == list(range(1, 9))
    assert rows[0].center_id == 0 and rows[0].radius == 0.0
    assert len({r.center_id for r in rows}) == 8
    radii = [r.radius for r in rows[1:]]
    assert radii == sorted(radii, reverse=True) or all(
        a >= b - 1e-9 for a, b in zip(radii, radii[1:])
    )


def test_peaks_are_local_maxima(spark, registry):
    """Every reported peak clears the prominence gate and recomputes;
    prominence > 1.1 by construction."""
    qs, _ = registry
    rows = qs["evt_peaks"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.prominence > 1.1
        assert abs(r.prominence - round(r.rev / r.baseline, 6)) < 1e-9


def test_containment_bounds_and_relation_to_jaccard(spark, registry):
    """Directional containments bound Jaccard from above, all ratios
    live in (0, 1], and every pair clears the max-containment gate."""
    qs, _ = registry
    rows = qs["llm_shingle_containment"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 < r.jaccard <= min(r.containment_ab, r.containment_ba) + 1e-9
        assert max(r.containment_ab, r.containment_ba) >= 0.6 - 1e-9
        assert r.containment_ab <= 1.0 and r.containment_ba <= 1.0


def test_rolling_slope_recomputes(spark, registry):
    """Each slope recomputes from the trailing 7-day window of the
    rounded daily series."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["evt_rolling_slope"](spark, SF_DIR).collect()
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.round(F.sum("value"), 6).alias("y"))
        .collect()
    )
    import datetime

    anchor = datetime.date(2024, 1, 1)
    series = {}
    for r in daily:
        series.setdefault(r.event_type, {})[(r.d - anchor).days] = r.y
    for r in rows[:40]:
        et = r.event_type
        day_x = (datetime.date.fromisoformat(r.day) - anchor).days
        xs = [x for x in range(day_x - 6, day_x + 1) if x in series[et]]
        assert len(xs) == 7 == r.n
        ys = [series[et][x] for x in xs]
        n, sx = 7.0, float(sum(xs))
        sy, sxy = sum(ys), sum(x * y for x, y in zip(xs, ys))
        sxx = float(sum(x * x for x in xs))
        expect = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(r.slope - round(expect, 6)) < 1e-6, (et, r.day)


def test_prf_expansion_terms_disjoint_from_query(spark, registry):
    """Expansion terms never repeat the query's own tokens, ranks are
    1..2 per query with descending weights, and dfreq is positive."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["llm_query_expansion_prf"](spark, SF_DIR).collect()
    assert rows
    d = load_table(spark, SF_DIR, "documents")
    qtoks = {
        r.doc_id: set(r.text.split(" ")[:8])
        for r in d.filter(F.col("doc_id") % 53 == 0).collect()
    }
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.token not in qtoks[r.query_id], (r.query_id, r.token)
        assert r.dfreq >= 1 and r.weight > 0
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.exp_rank)
        assert [r.exp_rank for r in rs] == list(range(1, len(rs) + 1))
        ws = [r.weight for r in rs]
        assert ws == sorted(ws, reverse=True)


def test_hubness_in_degree_conservation(spark, registry):
    """Total in-degree across ALL vectors equals 500·k; the reported
    top hubs have non-increasing in-degree and consistent z-scores."""
    qs, _ = registry
    rows = qs["llm_hubness_audit"](spark, SF_DIR).collect()
    assert len(rows) == 10
    degs = [r.in_degree for r in rows]
    assert degs == sorted(degs, reverse=True)
    zs = [r.hub_z for r in rows]
    assert zs == sorted(zs, reverse=True)
    assert all(r.n_orphans == rows[0].n_orphans >= 0 for r in rows)


def test_embed_standardize_covers_all_dims(spark, registry):
    """One row per dimension 1..64; sd positive; flag recomputes."""
    qs, _ = registry
    rows = sorted(qs["llm_embed_standardize"](spark, SF_DIR).collect(), key=lambda r: r.pos)
    assert [r.pos for r in rows] == list(range(1, 65))
    for r in rows:
        assert r.sd > 0
        expect = int(abs(r.mu) > 0.5 or r.sd < 0.5 or r.sd > 2.0)
        assert r.flagged == expect


def test_ensemble_majority_accounting(spark, registry):
    """Unanimous docs are a subset of total; per-judge accuracies lie
    in [2/3-ish bounds, 1] — a judge can disagree with majority at
    most on docs where the other two agree."""
    qs, _ = registry
    (r,) = qs["llm_ensemble_majority"](spark, SF_DIR).collect()
    assert 0 <= r.n_unanimous <= r.n_docs
    assert 0 <= r.n_pass_majority <= r.n_docs
    for acc in (r.acc_j1, r.acc_j2, r.acc_j3):
        assert 0.0 <= acc <= 1.0
    # In any 3-judge majority system the average agreement rate is >= 2/3.
    assert (r.acc_j1 + r.acc_j2 + r.acc_j3) / 3 >= 2 / 3 - 1e-9


def test_watermark_calibrated_null(spark, registry):
    """On an unwatermarked corpus the z-test must behave like a null:
    no flags at z>4, mean z near 0, and each z recomputes."""
    import math

    qs, _ = registry
    rows = qs["llm_watermark_detect"](spark, SF_DIR).collect()
    assert len(rows) == 500
    assert sum(r.flagged for r in rows) == 0, "false positives on null corpus"
    zs = [r.z for r in rows]
    assert abs(sum(zs) / len(zs)) < 0.5, "null z distribution should center near 0"
    for r in rows[:50]:
        expect = (r.n_green - 0.5 * r.n_pairs) / math.sqrt(r.n_pairs * 0.25)
        assert abs(r.z - round(expect, 6)) < 1e-9


def test_did_identity(spark, registry):
    """DiD recomputes from the four cell means and the null-effect
    t-stat stays modest on this effect-free assignment."""
    qs, _ = registry
    (r,) = qs["evt_did"](spark, SF_DIR).collect()
    expect = (r.treated_post - r.treated_pre) - (r.control_post - r.control_pre)
    assert abs(r.did - round(expect, 6)) < 5e-6
    assert r.se > 0
    assert abs(r.t_stat) < 5.0, "odd/even split has no real effect"


def test_wilson_ci_brackets_rate(spark, registry):
    """ci_lo <= rate <= ci_hi, all within [0,1], and the interval
    narrows with n (the largest stratum has the tightest interval)."""
    qs, _ = registry
    rows = qs["llm_eval_wilson_ci"](spark, SF_DIR).collect()
    assert rows
    pairs = []
    for r in rows:
        assert 0.0 <= r.ci_lo <= r.pass_rate <= r.ci_hi <= 1.0
        pairs.append((r.n, r.ci_hi - r.ci_lo))
    # The widest interval must come from one of the smallest strata —
    # Wilson width shrinks ~1/sqrt(n) at comparable rates.
    widest_n = max(pairs, key=lambda t: t[1])[0]
    assert widest_n <= sorted(n for n, _ in pairs)[len(pairs) // 2]
    assert sum(r.n for r in rows) == 500


def test_ols_multifactor_r2_bounds_and_nesting(spark, registry):
    """R² lies in [0,1] and the two-factor fit explains at least as
    much variance as each single-factor regr_r2 (model nesting)."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    (r,) = qs["evt_ols_multifactor"](spark, SF_DIR).collect()
    assert 0.0 <= r.r2 <= 1.0
    assert r.n_days > 10
    ev = load_table(spark, SF_DIR, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 6).alias("y"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("double").alias("x1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).cast("double").alias("x2"),
    ).filter(F.col("y").isNotNull())
    (single,) = daily.agg(
        F.expr("regr_r2(y, x1)").alias("r1"), F.expr("regr_r2(y, x2)").alias("r2b")
    ).collect()
    assert r.r2 >= max(single.r1, single.r2b) - 1e-6, "nested model must not lose variance"


def test_dedup_venn_consistent_with_legs(spark, registry):
    """Venn cells are non-negative, and token cells sum to the
    llm_minhash_det pair count (the token leg reused verbatim)."""
    qs, _ = registry
    (r,) = qs["llm_dedup_method_venn"](spark, SF_DIR).collect()
    assert r.n_both >= 0 and r.n_token_only >= 0 and r.n_embed_only >= 0
    tok_pairs = qs["llm_minhash_det"](spark, SF_DIR).count()
    assert r.n_both + r.n_token_only == tok_pairs
    assert 0.0 <= r.jaccard_of_methods <= 1.0


def test_kcore_monotone_shrinkage(spark, registry):
    """Peeling only removes: nodes and edges are non-increasing per
    round, and every surviving round-3 node had degree >= 3 in round 2
    (checked via the reported counts being consistent)."""
    qs, _ = registry
    rows = sorted(qs["graph_kcore"](spark, SF_DIR).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
    # Directed-both-ways construction: edges are even and bounded by
    # n_nodes*(n_nodes-1).
    for r in rows:
        assert r.n_edges % 2 == 0


def test_otsu_threshold_maximizes_between_var(spark, registry):
    """The elected split's between-class variance is the max over an
    independent recomputation of all candidate splits."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    (r,) = qs["llm_otsu_threshold"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    stop = {"the", "a", "of", "to", "and", "in", "is", "on"}
    bins = [0] * 20
    for row in docs:
        toks = row.text.lower().split(" ")
        s = sum(1 for x in toks if x in stop) / len(toks)
        bins[min(19, int(s * 20))] += 1
    total = sum(bins)
    tmass = sum(n * (b + 0.5) for b, n in enumerate(bins))
    best = None
    for b in range(20):
        cn = sum(bins[: b + 1])
        if cn == 0 or cn == total:
            continue
        cmass = sum(n * (i + 0.5) for i, n in enumerate(bins[: b + 1]))
        w0, w1 = cn / total, 1 - cn / total
        mu0, mu1 = cmass / cn, (tmass - cmass) / (total - cn)
        v = round(w0 * w1 * (mu0 - mu1) ** 2, 6)
        if best is None or v > best[0] or (v == best[0] and b < best[1]):
            best = (v, b)
    assert (round(r.between_var, 6), r.threshold_bin) == best


def test_markov_stationary_is_distribution(spark, registry):
    """π sums to 1 (to rounding), every component positive, and the
    power iteration is converging (deltas small on this well-mixed
    chain)."""
    qs, _ = registry
    rows = qs["evt_markov_stationary"](spark, SF_DIR).collect()
    assert len(rows) == 5
    s = sum(r.pi_stationary for r in rows)
    assert abs(s - 1.0) < 1e-3, "probability mass must be conserved"
    for r in rows:
        assert r.pi_stationary > 0
        assert r.delta_last_iter < 0.05, "uniform-ish chain mixes fast"


def test_mixup_convexity_holds_everywhere(spark, registry):
    """Every mixed vector satisfies the norm triangle inequality and
    the pairing is a perfect matching of the lower-id half."""
    qs, _ = registry
    rows = qs["llm_mixup_embed"](spark, SF_DIR).collect()
    assert len(rows) == 250
    assert all(r.convexity_ok == 1 for r in rows)
    assert {r.id_a for r in rows} == set(range(250))
    assert all(r.id_b == r.id_a + 250 for r in rows)


def test_catalog_coverage_accounting(spark, registry):
    """Subset counts bounded by the catalog size; share recomputes."""
    qs, _ = registry
    (r,) = qs["evt_catalog_coverage"](spark, SF_DIR).collect()
    assert 0 < r.n_items
    for cnt in (r.n_multi_user, r.n_singleton, r.n_never_purchased):
        assert 0 <= cnt <= r.n_items
    assert abs(r.covisitable_share - round(r.n_multi_user / r.n_items, 6)) < 1e-9
    assert r.mean_inter_per_item >= 1.0


def test_pass_at_k_estimator_identities(spark, registry):
    """pass@k in [0,1], equals 1 when fewer than k failures exist,
    equals 0 when nothing passed, and recomputes from (n, c)."""
    import math

    qs, _ = registry
    rows = qs["llm_pass_at_k"](spark, SF_DIR).collect()
    assert len(rows) == 50
    for r in rows:
        assert 0.0 <= r.pass_at_k <= 1.0
        if r.n - r.c < 4:
            assert r.pass_at_k == 1.0
        else:
            expect = 1.0 - math.comb(r.n - r.c, 4) / math.comb(r.n, 4)
            assert abs(r.pass_at_k - round(expect, 6)) < 1e-6
        if r.c == 0:
            assert r.pass_at_k == 0.0


def test_bradley_terry_ranking_tracks_wins(spark, registry):
    """Scores form a distribution, ranks are a permutation, and the
    top-rated player has at least the average win rate."""
    qs, _ = registry
    rows = sorted(qs["llm_bradley_terry"](spark, SF_DIR).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert abs(sum(r.bt_score for r in rows) - 1.0) < 1e-3
    scores = [r.bt_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    top, rest = rows[0], rows[1:]
    top_rate = top.wins / top.n_battles
    assert top_rate >= min(r.wins / r.n_battles for r in rest)


def test_sprt_walk_is_cumulative_and_calibrated(spark, registry):
    """llr_cum is the running sum of increments, decisions match the
    boundaries, and the null trace never accepts H1."""
    qs, _ = registry
    rows = sorted(qs["evt_sprt"](spark, SF_DIR).collect(), key=lambda r: r.day)
    run = 0.0
    for r in rows:
        run = round(run + r.llr_inc, 6)
        assert abs(r.llr_cum - run) < 1e-5
        if r.llr_cum >= 2.772589:
            assert r.decision == "accept_h1"
        elif r.llr_cum <= -1.558145:
            assert r.decision == "accept_h0"
        else:
            assert r.decision == "continue"
    assert all(r.decision != "accept_h1" for r in rows), "null must not fire H1"


def test_best_of_n_curve_monotone(spark, registry):
    """Per problem the curve is non-decreasing in n, n=1 equals the
    sample mean, and n=8's expectation never exceeds the max score."""
    qs, _ = registry
    rows = qs["llm_best_of_n_curve"](spark, SF_DIR).collect()
    per = {}
    for r in rows:
        per.setdefault(r.problem_id, {})[r.n] = r.expected_best
    assert len(per) == 50
    for pid, curve in per.items():
        assert set(curve) == {1, 2, 4, 8}
        assert curve[1] <= curve[2] <= curve[4] <= curve[8] + 1e-9, pid
        assert 0.0 <= curve[1] and curve[8] <= 1.0


def test_judge_length_bias_detects_floor_judge(spark, registry):
    """The audit must flag j2 (whose length FLOOR makes the verdict
    monotone in length) as the most length-correlated judge, while the
    band judges stay far below — the hidden-length-proxy detection the
    op exists for."""
    qs, _ = registry
    rows = {r.judge: r for r in qs["llm_judge_length_bias"](spark, SF_DIR).collect()}
    assert set(rows) == {"j1", "j2", "j3"}
    for r in rows.values():
        assert 0.0 <= r.pass_rate <= 1.0
        assert -1.0 <= r.length_corr <= 1.0
    assert rows["j2"].length_corr > 0.5, "floor judge must read as length-biased"
    assert rows["j2"].length_corr > abs(rows["j1"].length_corr)
    assert rows["j2"].length_corr > abs(rows["j3"].length_corr)


def test_wow_growth_deltas_recompute(spark, registry):
    """Deltas recompute from consecutive weekly revenues; the first
    week's deltas are NULL, not fabricated."""
    qs, _ = registry
    rows = sorted(qs["evt_wow_growth"](spark, SF_DIR).collect(), key=lambda r: r.week)
    assert rows[0].wow_delta is None and rows[0].wow_pct is None
    for a, b in zip(rows, rows[1:]):
        assert abs(b.wow_delta - round(b.revenue - a.revenue, 4)) < 1e-6
        assert b.active_users >= 1 and b.n_events >= b.active_users


def test_ece_is_mass_weighted_gap(spark, registry):
    """ECE recomputes from the reported bins; gaps bounded by 1;
    the same ECE value rides every row."""
    qs, _ = registry
    rows = qs["llm_calibration_ece"](spark, SF_DIR).collect()
    assert rows
    total = sum(r.n for r in rows)
    expect = round(sum(r.n * abs(r.mean_conf - r.accuracy) for r in rows) / total, 6)
    assert len({r.ece for r in rows}) == 1
    assert abs(rows[0].ece - expect) < 2e-6
    for r in rows:
        assert 0.0 <= r.gap <= 1.0
        assert abs(r.gap - round(abs(r.mean_conf - r.accuracy), 6)) < 1e-9


def test_propensity_balance_null_assignment(spark, registry):
    """The odd/even split is effect-free, so every covariate should
    pass the 0.1 SMD rule, and SMDs recompute direction-consistently."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["evt_propensity_balance"](spark, SF_DIR).collect()
    assert {r.covariate for r in rows} == {"n_events", "mean_value", "purchase_rate"}
    # SMD sampling noise scales ~sqrt(4/n_arm): with the fixture's
    # handful of users per arm an |SMD| well above 0.1 is expected
    # chance imbalance, so the bound must be sample-size aware.
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    bound = 6.0 / (n_users / 2) ** 0.5
    for r in rows:
        assert r.imbalanced == int(abs(r.smd) > 0.1)
        assert abs(r.smd) < bound, (r.covariate, r.smd, bound)


def test_dedup_sweep_monotone_in_tau(spark, registry):
    """Raising τ can only shrink pairs, dropped docs, and drop share;
    the τ=0.9 row must agree with llm_minhash_det's pair count."""
    qs, _ = registry
    rows = sorted(qs["llm_dedup_threshold_sweep"](spark, SF_DIR).collect(), key=lambda r: r.tau)
    assert [r.tau for r in rows] == [0.7, 0.8, 0.9, 0.95]
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs
        assert b.n_docs_dropped <= a.n_docs_dropped
    det = qs["llm_minhash_det"](spark, SF_DIR).count()
    assert rows[2].n_pairs == det, "tau=0.9 must match the production cut"


def test_cms_one_sided_error(spark, registry):
    """CMS never underestimates (the defining guarantee) and excess
    stays within the collision bound ~ stream/width per row."""
    from hive_test_spark.io import load_table

    qs, _ = registry
    rows = qs["agg_count_min_sketch"](spark, SF_DIR).collect()
    assert rows
    stream = load_table(spark, SF_DIR, "lineitem").count()
    for r in rows:
        assert r.one_sided_ok == 1
        assert r.cms_estimate >= r.exact_n
        assert r.overestimate <= stream // 256 * 4 + 64, "excess beyond collision bound"


def test_tblproperties_roundtrip(spark, registry):
    """All three governance properties survive the DDL round-trip."""
    qs, _ = registry
    props = {r.property: r.value for r in qs["meta_tblproperties"](spark, SF_DIR).collect()}
    assert props == {"steward": "pipeline", "quality": "gold", "retention_days": "90"}


def test_mcnemar_table_and_flag(spark, registry):
    """Discordance cells sum with n_both to at most n_items; chi2
    recomputes from the cells; the flag matches the critical value."""
    qs, _ = registry
    (r,) = qs["llm_eval_mcnemar"](spark, SF_DIR).collect()
    assert r.n_a_only + r.n_b_only + r.n_both <= r.n_items
    expect = (abs(r.n_a_only - r.n_b_only) - 1) ** 2 / (r.n_a_only + r.n_b_only)
    assert abs(r.mcnemar_chi2 - round(expect, 6)) < 1e-6
    assert r.significant_05 == int(expect > 3.841459)


def test_minhash_estimator_within_sampling_bound(spark, registry):
    """The signature estimate stays within ~4 sd of exact at K=16
    for every pair, and the mean signed error is near zero (the
    estimator is unbiased)."""
    qs, _ = registry
    rows = qs["llm_minhash_estimator_error"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:2000]:
        j = r.exact_jaccard
        sd = (j * (1 - j) / 16) ** 0.5
        assert abs(r.estimator_error) <= 4 * sd + 1 / 16 + 1e-9, (r.doc_a, r.doc_b)
    mean_err = sum(r.estimator_error for r in rows) / len(rows)
    # Candidate pairs are selected BECAUSE a band matched — the
    # estimator is conditioned on agreement, so the selected-sample
    # mean error is POSITIVE (post-selection bias), but small.
    assert 0.0 < mean_err < 0.1


def test_feature_matrix_no_leakage(spark, registry):
    """Lag features are honest NULLs on short history, the trailing MA
    recomputes from visible rows only, and active_days_7 never exceeds
    7 or the row's own position in its series."""
    qs, _ = registry
    rows = qs["evt_feature_matrix"](spark, SF_DIR).collect()
    series = {}
    for r in rows:
        series.setdefault(r.user_id, []).append(r)
    for uid, rs in series.items():
        rs.sort(key=lambda r: r.day)
        for i, r in enumerate(rs):
            assert 1 <= r.active_days_7 <= min(7, i + 1)
            if i == 0:
                assert r.rev_lag1 is None
            else:
                assert r.rev_lag1 == rs[i - 1].rev
            window = [x.rev for x in rs[max(0, i - 6): i + 1]]
            assert abs(r.rev_ma7 - round(sum(window) / len(window), 6)) < 1e-5


def test_retention_grid_diagonal_and_monotone_base(spark, registry):
    """Offset-0 cells retain 1.0 by construction; every cell's actives
    are bounded by its cohort size; offsets are non-negative."""
    qs, _ = registry
    rows = qs["evt_retention_grid"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.offset_weeks >= 0
        assert 1 <= r.n_active <= r.cohort_size
        if r.offset_weeks == 0:
            assert r.retained_share == 1.0


def test_dup_rate_by_source_accounting(spark, registry):
    """Rates in [0,1], marked docs bounded by source size, and the
    total marked mass equals the distinct docs in verified pairs."""
    qs, _ = registry
    rows = qs["llm_dup_rate_by_source"](spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert 0 <= r.n_in_dup_pair <= r.n_docs
        assert abs(r.dup_rate - round(r.n_in_dup_pair / r.n_docs, 6)) < 1e-9
    pairs = qs["llm_minhash_det"](spark, SF_DIR).collect()
    marked = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert sum(r.n_in_dup_pair for r in rows) == len(marked)


def test_cluster_density_bounds(spark, registry):
    """llm_cluster_density_audit: density is a true pair fraction —
    verified pairs never exceed C(size,2), density in (0, 1], and a
    2-cluster is by construction a verified pair (density 1.0)."""
    qs, _ = registry
    from tests.conftest import SF_DIR

    pdf = qs["llm_cluster_density_audit"](spark, SF_DIR).toPandas()
    assert len(pdf) > 0
    assert (pdf["verified_pairs"] <= pdf["possible_pairs"]).all()
    assert ((pdf["density"] > 0) & (pdf["density"] <= 1.0)).all()
    two = pdf[pdf["cluster_size"] == 2]
    if len(two):
        assert (two["density"] == 1.0).all()
