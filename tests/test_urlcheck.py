"""URL-status actor-pool stage (stages/urlcheck.py)."""

import pyarrow as pa
import pytest

import ray.data as rd

from rsmetacheck_ray.stages.urlcheck import (
    OK_STATUSES,
    URLStatusCheck,
    check_urls,
    deterministic_fetcher,
    requests_fetcher,
)


def _batch(urls, ids=None):
    ids = ids or list(range(len(urls)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
        }
    )


def test_unique_urls_fetched_once_and_cached_across_batches():
    calls = []

    def counting(url):
        calls.append(url)
        return 200

    stage = URLStatusCheck(fetcher=counting)
    stage(_batch(["http://a", "http://b", "http://a"]))
    assert sorted(calls) == ["http://a", "http://b"]  # in-batch dedup
    stage(_batch(["http://b", "http://c"]))
    # http://b served from the actor cache, only the new URL fetched
    assert sorted(calls) == ["http://a", "http://b", "http://c"]


def test_status_and_ok_mapping():
    stage = URLStatusCheck(fetcher=lambda u: {"r": 301, "m": 404}.get(u, 200))
    out = stage(_batch(["x", "r", "m"]))
    assert out.column("status").to_pylist() == [200, 301, 404]
    assert out.column("url_ok").to_pylist() == [True, True, False]
    assert 404 not in OK_STATUSES


def test_deterministic_fetcher_is_pure_and_bounded():
    urls = [f"https://site{i}.example.com/p{i}" for i in range(200)]
    statuses = {deterministic_fetcher(u) for u in urls}
    assert statuses <= {200, 301, 404, 503}
    assert all(
        deterministic_fetcher(u) == deterministic_fetcher(u) for u in urls[:10]
    )
    assert 200 in statuses  # the healthy bucket dominates


def test_requests_fetcher_import_gate():
    """Constructing the real fetcher is import-gated; with the library
    present it returns a callable (never invoked here — the test
    environment has no network, and the differential gate must stay
    network-free)."""
    try:
        import requests  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="deterministic_fetcher"):
            requests_fetcher()
    else:
        assert callable(requests_fetcher())


def test_check_urls_dataset_end_to_end(ray_session):
    ds = rd.from_arrow(_batch(["https://x.example/1", "https://x.example/2"]))
    out = check_urls(ds).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "url", "status", "url_ok"]
    assert out["status"].tolist() == [
        deterministic_fetcher("https://x.example/1"),
        deterministic_fetcher("https://x.example/2"),
    ]
