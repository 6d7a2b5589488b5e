"""Scalar normalizer tests — trigger/non-trigger pairs per helper,
mirroring the reference's parametrized helper tests."""

from __future__ import annotations

import pyarrow as pa
import pytest

from rsmetacheck_ray.functions import normalize as nz


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("v1.2.3", "1.2.3"),
        ("V2.0", "2.0"),
        ("  v0.1  ", "0.1"),
        ("1.0.0", "1.0.0"),
        ("version-7", "version-7"),  # only a LEADING bare v strips
    ],
)
def test_normalize_version(raw, expected):
    assert nz.normalize_version(pa.array([raw]))[0].as_py() == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("python", "Python"),
        ("Python3", "Python"),
        ("CPP", "C++"),
        ("js", "JavaScript"),
        ("EN", "en"),
        ("klingon", "klingon"),  # unknown passes through trimmed
        ("  go  ", "Go"),
    ],
)
def test_normalize_lang(raw, expected):
    assert nz.normalize_lang(pa.array([raw]))[0].as_py() == expected


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("git+https://GitHub.com/User/Repo.git", "https://github.com/user/repo"),
        ("git@github.com:user/repo.git", "https://github.com/user/repo"),
        ("https://example.com/path/", "https://example.com/path"),
        ("HTTPS://EXAMPLE.COM", "https://example.com"),
    ],
)
def test_normalize_url(raw, expected):
    assert nz.normalize_url(pa.array([raw]))[0].as_py() == expected


@pytest.mark.parametrize(
    "url,host",
    [
        ("https://docs.example.org/x/y", "docs.example.org"),
        ("http://a.b.c:8080/q", "a.b.c"),
        ("site3.example.com:users/repo.git", "site3.example.com"),
        ("ftp://files.example.net/pub", "files.example.net"),
    ],
)
def test_url_host(url, host):
    assert nz.url_host(pa.array([url]))[0].as_py() == host


@pytest.mark.parametrize(
    "raw,iso",
    [
        ("2024-03-01T12:30:00", "2024-03-01T12:30:00"),
        ("2024-03-01T12:30:00Z", "2024-03-01T12:30:00"),
        ("2024-03-01 12:30:00", "2024-03-01T12:30:00"),
        ("2024-03-01", "2024-03-01T00:00:00"),
        ("01/03/2024", "2024-03-01T00:00:00"),
        ("2024/03/01", "2024-03-01T00:00:00"),
        ("2024-03-01T12:30:00+02:00", "2024-03-01T12:30:00"),
        ("2024-03-01whatever-trailing", "2024-03-01T00:00:00"),  # prefix fallback
    ],
)
def test_parse_date_multi(raw, iso):
    got = nz.parse_date_multi(pa.array([raw]))[0].as_py()
    assert got is not None and got.isoformat() == iso


def test_parse_date_multi_unparseable_is_null():
    assert nz.parse_date_multi(pa.array(["not a date"]))[0].as_py() is None


def test_all_null_safe():
    arr = pa.array([None], pa.string())
    assert nz.normalize_version(arr)[0].as_py() is None
    assert nz.normalize_url(arr)[0].as_py() is None
    assert nz.parse_date_multi(arr)[0].as_py() is None


@pytest.mark.parametrize(
    "text,urls",
    [
        ("see https://example.com/a and www.foo.org/b.", ["https://example.com/a", "www.foo.org/b"]),
        ("no links here", []),
        ("trailing (https://x.io/y).", ["https://x.io/y"]),
        (None, None),
    ],
)
def test_extract_urls(text, urls):
    got = nz.extract_urls(pa.array([text], pa.string()))[0].as_py()
    assert got == urls


@pytest.mark.parametrize(
    "url,ver",
    [
        ("https://github.com/u/r/releases/tag/v1.2.3", "1.2.3"),
        ("https://example.com/pkg-2.0.1.tar.gz", "2.0.1"),
        ("https://example.com/downloads/app_v3.4", "3.4"),
        ("https://example.com/plain/path", None),
    ],
)
def test_version_from_url(url, ver):
    assert nz.version_from_url(pa.array([url]))[0].as_py() == ver
