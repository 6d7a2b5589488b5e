"""PII scrub (functions/pii.py) and repetition signals
(functions/repetition.py): behavior on constructed inputs — the SQL
oracles pin the sf-corpus differential; these pin the semantics the
word-salad corpus can't exercise (multiple hits per doc, unicode,
boundary cases, pattern order)."""

from __future__ import annotations

import pyarrow as pa

from rsmetacheck_ray.functions.pii import scrub_pii_array, scrub_pii_stage
from rsmetacheck_ray.functions.repetition import repetition_stage


def _scrub(texts):
    s, counts = scrub_pii_array(pa.array(texts, pa.string()))
    return s.to_pylist(), {k: v.to_pylist() for k, v in counts.items()}


class TestPIIScrub:
    def test_email(self):
        out, c = _scrub(["mail bob.smith+x@sub.example.co.uk now"])
        assert out == ["mail <EMAIL> now"]
        assert c["email"] == [1]

    def test_ipv4_boundaries(self):
        out, c = _scrub(
            ["srv at 192.168.0.1 and 10.0.0.255.", "ver 1.2.3 only"]
        )
        assert out[0] == "srv at <IP> and <IP>."
        assert c["ipv4"] == [2, 0]
        # three dotted groups is a version string, not an IP
        assert out[1] == "ver 1.2.3 only"

    def test_phone(self):
        out, c = _scrub(["call +1-555-0123 or +442071234567 now"])
        assert out == ["call <PHONE> or <PHONE> now"]
        assert c["phone"] == [2]

    def test_order_email_eats_its_digits(self):
        # the email's host digits must NOT later count as an IP
        out, c = _scrub(["x 10.0.0.1@10.0.0.2.com y"])
        assert c["email"] == [1]
        assert c["ipv4"] == [0]
        assert out == ["x <EMAIL> y"]

    def test_multiple_kinds_one_doc(self):
        out, c = _scrub(["a@b.io then 8.8.8.8 then +1-555-7777 end"])
        assert out == ["<EMAIL> then <IP> then <PHONE> end"]
        assert (c["email"], c["ipv4"], c["phone"]) == ([1], [1], [1])

    def test_null_and_empty(self):
        s, counts = scrub_pii_array(pa.array([None, ""], pa.string()))
        assert s.to_pylist() == ["", ""]
        assert counts["email"].to_pylist() == [0, 0]

    def test_stage_shape(self):
        b = pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array(["hi a@b.io"], pa.string()),
            }
        )
        out = scrub_pii_stage(b)
        assert out.column_names == [
            "doc_id", "n_email", "n_ipv4", "n_phone", "scrubbed_text",
        ]
        assert out.column("scrubbed_text").to_pylist() == ["hi <EMAIL>"]


def _rep(texts):
    b = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return repetition_stage(b).to_pydict()


class TestRepetition:
    def test_all_unique(self):
        r = _rep(["a\nb\nc"])
        assert r["n_lines"] == [3]
        assert r["n_distinct_lines"] == [3]
        assert r["dup_line_frac"] == [0.0]
        assert r["dup_line_char_frac"] == [0.0]
        assert r["top_line_count"] == [1]

    def test_duplicates(self):
        # "spam" ×3 (4 chars each, 2 dup instances), "x" ×1
        r = _rep(["spam\nx\nspam\nspam"])
        assert r["n_lines"] == [4]
        assert r["n_distinct_lines"] == [2]
        assert r["dup_line_frac"] == [2 / 4]
        assert r["dup_line_char_frac"] == [8 / 13]
        assert r["top_line_count"] == [3]

    def test_empty_lines_count(self):
        # "a", "", "a", "" -> dups of both "a" and ""
        r = _rep(["a\n\na\n"])
        assert r["n_lines"] == [4]
        assert r["n_distinct_lines"] == [2]
        assert r["top_line_count"] == [2]

    def test_single_line_and_empty_doc(self):
        r = _rep(["no newlines here", ""])
        assert r["n_lines"] == [1, 1]
        assert r["dup_line_frac"] == [0.0, 0.0]

    def test_null_text(self):
        b = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([None], pa.string()),
            }
        )
        r = repetition_stage(b).to_pydict()
        assert r["n_lines"] == [1]

    def test_per_doc_isolation(self):
        # the same line in two docs is NOT a cross-doc duplicate
        r = _rep(["same\nsame", "same"])
        assert r["dup_line_frac"] == [0.5, 0.0]
        assert r["top_line_count"] == [2, 1]

    def test_unicode_lengths(self):
        # length() counts code points on both sides; 中 is 1
        r = _rep(["中中\nz\n中中"])
        assert r["dup_line_char_frac"] == [2 / 5]
