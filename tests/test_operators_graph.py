"""Connected components: pointer-doubling label propagation vs a pure-Python
union-find, plus convergence on adversarial (deep chain) graphs."""

import random

from pyspark.sql import functions as F

from syncmaven_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignments,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # find() roots are not necessarily min ids — label by member minimum
    members = {}
    for v in range(n_nodes):
        members.setdefault(find(v), []).append(v)
    return {v: min(ms) for ms in members.values() for v in ms}


def _cc_dict(spark, edges, n_nodes, **kw):
    edges_df = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        edges_df = edges_df.filter("id_a < 0")
    nodes_df = spark.createDataFrame([(i,) for i in range(n_nodes)], "v long")
    out = connected_components(edges_df, nodes=nodes_df, **kw)
    return {r["v"]: r["component"] for r in out.collect()}


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(150)  # sparse → many nontrivial components
    ]
    expected = _union_find(n, edges)
    # small graph → the driver-local union-find finish (default path)
    assert _cc_dict(spark, edges, n) == expected
    # local_finish_edges=0 forces the distributed star-rewriting loop;
    # both modes must agree exactly
    assert _cc_dict(spark, edges, n, local_finish_edges=0) == expected


def test_deep_chain_converges(spark):
    # a 300-node path has diameter 299: naive min-label propagation would
    # need ~300 rounds; star rewriting (forced distributed here) must finish
    # within the default max_iter=30 (measured: ~6 rounds)
    n = 300
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _cc_dict(spark, edges, n, local_finish_edges=0)
    assert got == {v: 0 for v in range(n)}


def test_raises_when_max_iter_too_small(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(edges, max_iter=1, local_finish_edges=0)


def test_local_finish_handles_string_ids(spark):
    # the local union-find must preserve the id type and the min-label
    # contract for non-numeric ids too
    edges = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    out = {
        r["v"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_isolated_nodes_label_themselves(spark):
    got = _cc_dict(spark, [(0, 1)], 4)
    assert got == {0: 0, 1: 0, 2: 2, 3: 3}


def test_cluster_assignments_canonical_flag(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    out = dedup_cluster_assignments(pairs, ids)
    rows = {r["v"]: (r["component"], r["is_canonical"]) for r in out.collect()}
    assert rows[1] == (1, True)
    assert rows[2] == (1, False)
    assert rows[3] == (1, False)
    assert rows[5] == (5, True)
    assert rows[6] == (5, False)
    assert rows[4] == (4, True)  # isolated
    assert rows[7] == (7, True)


def test_dedup_cluster_pipeline_invariants(spark):
    from syncmaven_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["dedup_cluster_pipeline"].spark_fn(spark, SF_SMOKE).cache()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # every doc assigned exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # canonical ⇔ doc is its cluster's minimum
    bad = out.filter(
        (F.col("is_canonical") != (F.col("doc_id") == F.col("component")))
    )
    assert bad.count() == 0
    # each cluster has exactly one canonical member, and it's the min id
    per = out.groupBy("component").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.min("doc_id").alias("min_id"),
    )
    assert per.filter("n_canon != 1 OR component != min_id").count() == 0
    out.unpersist()


def test_catalog_component_labels_are_members(spark):
    # structural sanity at sf0.001 beyond the hash-parity test
    from syncmaven_spark.queries import CATALOG
    from tests.conftest import SF_SMOKE

    out = CATALOG["graph_connected_components"].spark_fn(spark, SF_SMOKE)
    n_docs = out.count()
    assert out.select("doc_id").distinct().count() == n_docs
    # component label must itself be a member doc
    labels = out.select(F.col("component").alias("doc_id")).distinct()
    member = out.select("doc_id").distinct()
    assert labels.join(member, "doc_id", "left_anti").count() == 0
