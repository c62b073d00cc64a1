"""Property tests: sliding-window chunking reconstructs the token stream;
md5 hash sampling is a pure deterministic predicate (Spark ≡ hashlib)."""

import hashlib
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

CHUNK, STRIDE = 32, 16

word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
doc_words = st.lists(word, min_size=0, max_size=90)


def _chunks_spark(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    words = F.split("text", " ")
    return (
        df.select(
            "doc_id",
            words.alias("words"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(words) - F.lit(1), F.lit(0)),
                    F.lit(STRIDE),
                )
            ).alias("chunk_start"),
        )
        .select(
            "doc_id",
            "chunk_start",
            F.slice("words", F.col("chunk_start") + 1, F.lit(CHUNK)).alias("chunk"),
        )
        .collect()
    )


@pytest.mark.usefixtures("spark")
@given(docs=st.lists(doc_words, min_size=1, max_size=4))
@settings(max_examples=10, deadline=None)
def test_chunks_cover_and_overlap_exactly(spark, docs):
    texts = [" ".join(ws) for ws in docs]
    rows = _chunks_spark(spark, texts)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        words = text.split(" ")  # "" splits to [''] — matches Spark's split
        got = sorted(by_doc[i], key=lambda r: r["chunk_start"])
        # chunk starts are exactly 0, STRIDE, ... ≤ max(len-1, 0)
        assert [r["chunk_start"] for r in got] == list(
            range(0, max(len(words) - 1, 0) + 1, STRIDE)
        )
        for r in got:
            assert r["chunk"] == words[r["chunk_start"] : r["chunk_start"] + CHUNK]
        # stride-aligned reconstruction: taking the first STRIDE tokens of
        # each chunk (all of the last) rebuilds the doc exactly
        rebuilt = []
        for j, r in enumerate(got):
            take = len(r["chunk"]) if j == len(got) - 1 else STRIDE
            rebuilt.extend(r["chunk"][:take])
        assert rebuilt == words


@pytest.mark.usefixtures("spark")
@given(ids=st.lists(st.integers(0, 10**12), min_size=1, max_size=40, unique=True))
@settings(max_examples=10, deadline=None)
def test_hash_sample_matches_hashlib(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    sampled = {
        r["doc_id"]
        for r in df.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                "0", "1", "2", "3"
            )
        ).collect()
    }
    expected = {
        i for i in ids if hashlib.md5(str(i).encode()).hexdigest()[0] in "0123"
    }
    assert sampled == expected
