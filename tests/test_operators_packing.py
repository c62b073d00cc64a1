"""Sequence packing + mixture weights (operators/packing.py)."""

import pytest

from syncmaven_spark.operators.packing import mixture_weights, pack_sequences


def test_pack_sequences_straddle_and_zero_token_docs(spark):
    # shard "s": 5 + 3 + 0 + 6 tokens, budget 4:
    #   doc 1: start 0, tokens 0..4  -> seqs 0..1 (straddles)
    #   doc 2: start 5, tokens 5..7  -> seq 1
    #   doc 3: start 8, zero tokens  -> pinned to seq 2 (greatest(n,1) guard)
    #   doc 4: start 8, tokens 8..13 -> seqs 2..3
    df = spark.createDataFrame(
        [
            (1, "s", "a b c d e"),
            (2, "s", "f g h"),
            (3, "s", ""),
            (4, "s", "i j k l m n"),
            (9, "t", "x y"),  # independent shard: packing restarts at 0
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(df, budget=4).collect()
    }
    assert (rows[1]["start_tok"], rows[1]["first_seq"], rows[1]["last_seq"],
            rows[1]["n_seqs"]) == (0, 0, 1, 2)
    assert (rows[2]["start_tok"], rows[2]["first_seq"], rows[2]["last_seq"],
            rows[2]["n_seqs"]) == (5, 1, 1, 1)
    assert rows[3]["n_tokens"] == 0
    assert (rows[3]["first_seq"], rows[3]["last_seq"], rows[3]["n_seqs"]) == (2, 2, 1)
    assert (rows[4]["start_tok"], rows[4]["first_seq"], rows[4]["last_seq"],
            rows[4]["n_seqs"]) == (8, 2, 3, 2)
    assert (rows[9]["start_tok"], rows[9]["first_seq"]) == (0, 0)


def test_pack_sequences_precomputed_counts_and_budget_guard(spark):
    df = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 10)], "doc_id long, source string, n_tok long"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, token_count_col="n_tok", budget=8
        ).collect()
    }
    assert (rows[2]["start_tok"], rows[2]["first_seq"], rows[2]["last_seq"]) == (
        10, 1, 2,
    )
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, token_count_col="n_tok", budget=0)


def test_mixture_weights_temperature_upweights_small_sources(spark):
    df = spark.createDataFrame(
        [("big", "w " * 90), ("small", "w " * 10)],
        "source string, text string",
    )
    rows = {r["source"]: r for r in mixture_weights(df).collect()}
    assert rows["big"]["n_tokens"] == 90
    assert rows["big"]["raw_share"] == 0.9
    # temperature < 1 pulls the big source's weight below its raw share
    assert rows["small"]["temp_weight"] > rows["small"]["raw_share"]
    assert abs(rows["big"]["temp_weight"] + rows["small"]["temp_weight"] - 1.0) < 1e-9
    with pytest.raises(ValueError, match="temperature"):
        mixture_weights(df, temperature=0.0)


def test_mixture_weights_degenerate_corpus_yields_zero_not_nan(spark):
    import math

    df = spark.createDataFrame(
        [("a", ""), ("b", None)], "source string, text string"
    )
    rows = mixture_weights(df).collect()
    for r in rows:
        assert r["n_tokens"] == 0
        assert r["raw_share"] == 0.0 and not math.isnan(r["raw_share"])
        assert r["temp_weight"] == 0.0


def test_repetition_stats_rejects_reserved_columns(spark):
    from syncmaven_spark.operators.text import repetition_stats

    df = spark.createDataFrame([(1, "a b", 0)], "doc_id long, text string, _rep_toks long")
    with pytest.raises(ValueError, match="_rep_toks"):
        repetition_stats(df)


def test_sample_token_budget_fills_each_source_deterministically(spark):
    from syncmaven_spark.operators.packing import sample_token_budget

    rows = [(i, "s" if i < 20 else "t", "w " * 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out1 = sorted(
        (r["source"], r["doc_id"], r["cum_tokens"])
        for r in sample_token_budget(df, total_budget=100).collect()
    )
    out2 = sorted(
        (r["source"], r["doc_id"], r["cum_tokens"])
        for r in sample_token_budget(df, total_budget=100).collect()
    )
    assert out1 == out2  # reproducible shuffle: md5(id) order
    # every source stays within floor(weight * budget) tokens
    from syncmaven_spark.operators.packing import mixture_weights
    import math

    budgets = {
        r["source"]: math.floor(r["temp_weight"] * 100)
        for r in mixture_weights(df).collect()
    }
    per_source: dict = {}
    for src, _id, cum in out1:
        per_source[src] = max(per_source.get(src, 0), cum)
    for src, used in per_source.items():
        assert used <= budgets[src]
    # docs are 10 tokens each, so each source selects floor(budget/10) docs
    from collections import Counter
    counts = Counter(src for src, _, _ in out1)
    for src, n_sel in counts.items():
        assert n_sel == budgets[src] // 10

    with pytest.raises(ValueError, match="total_budget"):
        sample_token_budget(df, total_budget=-1)


def test_sample_token_budget_zero_budget_selects_nothing(spark):
    from syncmaven_spark.operators.packing import sample_token_budget

    df = spark.createDataFrame(
        [(1, "s", "a b c")], "doc_id long, source string, text string"
    )
    assert sample_token_budget(df, total_budget=0).count() == 0
