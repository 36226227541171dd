"""Edge cases for the classifier-evaluation operators."""

import pytest


def test_classification_report_known_matrix(spark):
    from discoverx_spark.operators.eval import binary_classification_report
    # tp=2 fp=1 fn=1 tn=2
    rows = [(True, True), (True, True), (False, True),
            (True, False), (False, False), (False, False)]
    df = spark.createDataFrame(rows, "label boolean, pred boolean")
    r = binary_classification_report(df, "label", "pred").collect()[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 1, 2)
    assert r["accuracy"] == round(4 / 6, 6)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == round(4 / 6, 6)


def test_classification_report_degenerate_denominators(spark):
    from discoverx_spark.operators.eval import binary_classification_report
    # no positive predictions AND no positive labels -> all ratios 0/…
    df = spark.createDataFrame([(False, False)] * 3,
                               "label boolean, pred boolean")
    r = binary_classification_report(df, "label", "pred").collect()[0]
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0
    assert r["accuracy"] == 1.0


def test_auc_perfect_reversed_and_ties(spark):
    from discoverx_spark.operators.eval import binary_auc
    perfect = spark.createDataFrame(
        [(True, 0.9), (True, 0.8), (False, 0.2), (False, 0.1)],
        "y boolean, s double")
    assert binary_auc(perfect, "y", "s").collect()[0]["auc"] == 1.0
    reversed_ = spark.createDataFrame(
        [(True, 0.1), (False, 0.9)], "y boolean, s double")
    assert binary_auc(reversed_, "y", "s").collect()[0]["auc"] == 0.0
    all_tied = spark.createDataFrame(
        [(True, 0.5), (False, 0.5), (True, 0.5), (False, 0.5)],
        "y boolean, s double")
    assert binary_auc(all_tied, "y", "s").collect()[0]["auc"] == 0.5


def test_auc_mixed_matches_hand_computation(spark):
    from discoverx_spark.operators.eval import binary_auc
    # pos scores {0.8, 0.4, 0.4}, neg {0.6, 0.4, 0.2}:
    # pairs = 9; wins: 0.8 beats all 3, each 0.4 beats 0.2 (2) -> 5
    # ties: two 0.4-pos vs one 0.4-neg -> 2 -> AUC = (5 + 1) / 9
    rows = [(True, 0.8), (True, 0.4), (True, 0.4),
            (False, 0.6), (False, 0.4), (False, 0.2)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    r = binary_auc(df, "y", "s").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (3, 3)
    assert r["auc"] == round(6 / 9, 6)


def test_auc_single_class_is_null(spark):
    from discoverx_spark.operators.eval import binary_auc
    df = spark.createDataFrame([(True, 0.9), (True, 0.1)],
                               "y boolean, s double")
    r = binary_auc(df, "y", "s").collect()[0]
    assert r["auc"] is None and r["n_neg"] == 0


def test_calibration_bins_boundaries(spark):
    from discoverx_spark.operators.eval import calibration_bins
    rows = [(True, 1.0), (False, 0.95), (True, 0.0), (False, 0.05),
            (True, 0.55)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    out = {r["bin"]: r for r in
           calibration_bins(df, "y", "s", n_bins=10).collect()}
    assert out[9]["n"] == 2          # 1.0 clamps into the top bin
    assert out[0]["n"] == 2 and out[5]["n"] == 1
    assert out[9]["frac_pos"] == 0.5
    assert out[0]["mean_score"] == 0.025
    with pytest.raises(ValueError):
        calibration_bins(df, "y", "s", n_bins=0)


def test_normalize_scores_ties_and_singleton(spark):
    from discoverx_spark.operators.eval import normalize_scores
    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 2.0), (4, "a", 3.0),
            (5, "b", 9.0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = {r["id"]: r for r in
           normalize_scores(df, "source", "q", "doc_id").collect()}
    assert out[1]["score_pct"] == 0.0
    # tied scores share percent_rank (rank 2 of 4 -> (2-1)/3)
    assert out[2]["score_pct"] == out[3]["score_pct"] == round(1 / 3, 6)
    assert out[4]["score_pct"] == 1.0
    # singleton group: percent_rank defined as 0
    assert out[5]["score_pct"] == 0.0


def test_topk_recall_missed_query_surfaces_as_zero(spark):
    from discoverx_spark.operators.eval import topk_recall
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, neighbor_id long")
    # query 1: one hit of two; query 2: entirely missed by approx
    approx = spark.createDataFrame(
        [(1, 10), (1, 99)], "query_id long, neighbor_id long")
    out = {r["query"]: r for r in
           topk_recall(approx, exact, "query_id", "neighbor_id").collect()}
    assert out[1]["n_exact"] == 2 and out[1]["n_hit"] == 1
    assert out[1]["recall"] == 0.5
    assert out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0
