"""Catalog ordering contract.

The round driver samples a PREFIX of ``queries()`` in catalog order (both
prior rounds stopped at 50/103), so the order IS the coverage policy:
every family must appear early, large families must get a proportional
share of any prefix, and entries without a prior driver CORRECTNESS row
must sort before already-verified ones within their family.
"""

from collections import Counter

from syncmaven_spark.queries import CATALOG, _DRIVER_CHECKED


def _family(name: str) -> str:
    return name.split("_", 1)[0]


def test_every_family_in_first_pass():
    families = {_family(n) for n in CATALOG}
    head = [_family(n) for n in list(CATALOG)[: len(families)]]
    assert set(head) == families
    assert len(head) == len(set(head))  # one slot per family, no repeats


def test_prefix_share_is_proportional():
    names = list(CATALOG)
    sizes = Counter(_family(n) for n in names)
    prefix = Counter(_family(n) for n in names[:50])
    for fam, total in sizes.items():
        expected = 50 * total / len(names)
        # one representative slot + stride share; allow ±3 slot rounding
        assert abs(prefix[fam] - expected) <= 3, (fam, prefix[fam], expected)
    # the regression that motivated this: rel (39 entries) got 5/50 slots
    # out of a then-103-entry catalog under equal-weight round-robin
    # (~50/#families ≈ 3 slots). This floor is deliberately ABSOLUTE and
    # independent of the proportional loop above (a proportional-derived
    # floor would be implied by it and could never fire — round-8
    # review); 10 stays comfortably below rel's fair share until the
    # catalog roughly doubles again, at which point revisit.
    assert prefix["rel"] >= 10


def test_unchecked_entries_sort_first_within_family():
    seen_checked: dict[str, bool] = {}
    for name in CATALOG:
        fam = _family(name)
        if seen_checked.get(fam):
            assert name in _DRIVER_CHECKED, (
                f"{name} is driver-unchecked but follows a checked "
                f"entry of family {fam}"
            )
        if name in _DRIVER_CHECKED:
            seen_checked[fam] = True


def test_driver_checked_names_exist():
    assert _DRIVER_CHECKED <= set(CATALOG)
