"""Dedup operator tests: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import pytest

from syncmaven_spark.operators import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from "
    "the warm windowsill and the birds sing in the garden all afternoon long"
)
NEAR = BASE.replace("warm windowsill", "cold doorstep")  # small edit
OTHER = (
    "completely different content about distributed query engines shuffling "
    "partitioned columnar data across executors with adaptive optimization"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "srcA"),
        (2, BASE, "srcA"),        # exact duplicate of 1
        (3, NEAR, "srcA"),        # near duplicate of 1
        (4, OTHER, "srcA"),
        (5, OTHER + " extra tail words here", "srcB"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_exact_dedup_keeps_lowest_id(docs):
    kept = exact_dedup(docs, ["text"], "doc_id")
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3, 4, 5]  # doc 2 collapsed into 1
    flags = {r.doc_id: r.is_duplicate_group for r in kept.collect()}
    assert flags[1] is True and flags[4] is False


def test_minhash_identical_docs_identical_signatures(docs):
    sig = minhash_signatures(docs, "text", "doc_id", num_perm=32).collect()
    by_id = {r.doc_id: [r[f"mh{i}"] for i in range(32)] for r in sig}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
    # near-dup shares most minhashes
    shared = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert shared >= 16


def test_minhash_lsh_candidates_find_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in minhash_lsh_candidates(
            docs, "text", "doc_id", num_perm=32, bands=16
        ).collect()
    }
    assert (1, 2) in pairs  # exact dup shares all bands
    assert pairs[(1, 2)] == 16
    assert (1, 3) in pairs  # near dup shares some band
    assert (1, 4) not in pairs  # unrelated content


def test_simhash_hamming_ordering(docs):
    sims = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id").collect()}
    assert sims[1] == sims[2]

    def hamming(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert hamming(sims[1], sims[3]) < hamming(sims[1], sims[4])


def test_simhash_near_dups_blocking(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dups(docs, "text", "doc_id", max_hamming=16).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs


def test_ngram_jaccard_with_blocking(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", ["source"], threshold=0.3
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.7 <= pairs[(1, 3)] < 1.0
    # 4↔5 share a source block and overlap heavily by words
    assert (1, 4) not in pairs
    # cross-block pair (4 in srcA, 5 in srcB) never considered
    assert (4, 5) not in pairs


def test_minhash_empty_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, ""), (3, "one two")], ["doc_id", "text"]
    )
    sig = minhash_signatures(df, "text", "doc_id", num_perm=8)
    assert sig.count() == 3  # shorter-than-k docs fall back to whole-text shingle
