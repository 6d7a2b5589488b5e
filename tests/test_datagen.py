"""Fixture-generator invariants: pure-function determinism and family
coverage (FIXTURES.md §1 determinism rule)."""

from __future__ import annotations

import collections

from rsmetacheck_ray.datagen import FAMILIES, build_row, generate_tables


def test_build_row_is_pure():
    for i in (0, 17, 999, 123_456):
        a_page, a_label = build_row(i)
        b_page, b_label = build_row(i)
        assert a_page == b_page
        assert a_label == b_label


def test_row_independent_of_table_size():
    # row i must be identical whether generated in a small or large table
    t1, l1 = generate_tables(50)
    t2, l2 = generate_tables(200)
    assert t1.slice(0, 50).equals(t2.slice(0, 50))
    assert l1.slice(0, 50).equals(l2.slice(0, 50))


def test_every_family_appears():
    _, labels = generate_tables(2000)
    seen = collections.Counter(labels.column("family").to_pylist())
    for name, _, _, _ in FAMILIES:
        assert seen[name] > 0, f"family {name} missing from 2000-row table"


def test_urls_unique():
    pages, _ = generate_tables(2000)
    urls = pages.column("url").to_pylist()
    assert len(set(urls)) == len(urls)


def test_labels_align_with_pages():
    pages, labels = generate_tables(500)
    assert pages.column("url").to_pylist() == labels.column("url").to_pylist()
