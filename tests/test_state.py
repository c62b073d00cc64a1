"""State store tests (reference: packages/core/src/lib/store.ts semantics)."""

import pytest

from syncmaven_spark.state import InMemoryStore, SqliteStore, create_store, stringify_key


@pytest.fixture(params=["memory", "sqlite"])
def store(request, tmp_path):
    if request.param == "memory":
        s = InMemoryStore()
    else:
        s = SqliteStore(str(tmp_path / "store.sqlite"))
    yield s
    s.close()


def test_key_join_and_validation():
    assert stringify_key(["a", "b", "c"]) == "a::b::c"
    assert stringify_key("solo") == "solo"
    with pytest.raises(ValueError):
        stringify_key(["a::b"])
    with pytest.raises(ValueError):
        stringify_key([])


def test_get_set_delete(store):
    assert store.get(["k"]) is None
    store.set(["syncId=s1", "$lastCursor=id"], {"type": "integer", "val": 5})
    assert store.get(["syncId=s1", "$lastCursor=id"]) == {"type": "integer", "val": 5}
    store.set(["syncId=s1", "$lastCursor=id"], {"type": "integer", "val": 9})
    assert store.get(["syncId=s1", "$lastCursor=id"])["val"] == 9
    store.delete(["syncId=s1", "$lastCursor=id"])
    assert store.get(["syncId=s1", "$lastCursor=id"]) is None


def test_prefix_scan_ordered(store):
    store.set(["p", "b"], 2)
    store.set(["p", "a"], 1)
    store.set(["p"], 0)
    store.set(["prefix_not_segment"], 99)  # 'p' prefix must not match this
    store.set(["q", "z"], 3)
    assert store.list(["p"]) == [("p", 0), ("p::a", 1), ("p::b", 2)]


def test_stream_batch(store):
    for i in range(7):
        store.set(["pre", f"k{i}"], i)
    batches = list(store.stream_batch(["pre"], max_batch_size=3))
    assert [len(b) for b in batches] == [3, 3, 1]
    assert batches[0][0][0] == "pre::k0"


def test_delete_by_prefix_and_size(store):
    store.set(["a", "1"], 1)
    store.set(["a", "2"], 2)
    store.set(["b"], 3)
    assert store.size() == 3
    store.delete_by_prefix(["a"])
    assert store.size() == 1
    assert store.get(["b"]) == 3


def test_sqlite_persistence(tmp_path):
    path = str(tmp_path / "s.sqlite")
    s1 = SqliteStore(path)
    s1.set(["k"], {"v": [1, 2, 3]})
    s1.close()
    s2 = SqliteStore(path)
    assert s2.get(["k"]) == {"v": [1, 2, 3]}
    s2.close()


def test_create_store_dispatch(tmp_path):
    assert isinstance(create_store(None), InMemoryStore)
    assert isinstance(create_store("memory://"), InMemoryStore)
    assert isinstance(create_store(str(tmp_path)), SqliteStore)
