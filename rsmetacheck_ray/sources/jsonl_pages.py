"""JSONL source for the pages table — the second input format (the
reference itself consumes JSON documents, ``detect_pitfalls_main.py:
316-318``; Common-Crawl-adjacent corpora frequently arrive as JSONL).

``ray.data.read_json`` parallelizes over files exactly like the
parquet reader; this module adds the SCHEMA COERCION boundary the
fixed-Arrow-schema engine requires (SURVEY §1.4: dynamic input →
nullable typed columns at the table edge):

 - ``warc_ts``: ISO-8601 string → ``timestamp[us]`` (unparseable →
   null, the null⇒skip discipline);
 - ``html``: base64 string → ``binary`` (absent/empty → null, which
   the extract stage treats as text-fallback);
 - ``url``/``text``/``lang``: cast to string, absent → null.

The coerced Dataset is schema-identical to the parquet path, so the
entire gate pipeline runs unchanged on either format.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def coerce_pages(batch: pa.Table) -> pa.Table:
    """Dynamic JSON columns → the fixed pages schema (extra columns
    are carried through unchanged, e.g. ``doc_id``)."""
    n = len(batch)
    cols: dict = {}
    names = set(batch.column_names)

    def _get_string(name: str):
        if name not in names:
            return pa.nulls(n, pa.string())
        return pc.cast(batch.column(name), pa.string())

    cols["url"] = _get_string("url")
    if "warc_ts" in names and pa.types.is_timestamp(batch.column("warc_ts").type):
        # Arrow's JSON reader already inferred the ISO strings as
        # timestamps — just normalize the unit
        cols["warc_ts"] = pc.cast(batch.column("warc_ts"), pa.timestamp("us"))
    else:
        ts_str = _get_string("warc_ts")
        # ISO-8601 with optional fractional seconds: Arrow's strptime
        # has no %f, so parse the whole-second prefix vectorized and
        # add the microsecond fraction per row (coercion boundary, not
        # a hot path)
        base = pc.strptime(
            pc.utf8_slice_codeunits(ts_str, 0, 19),
            format="%Y-%m-%dT%H:%M:%S",
            unit="us",
            error_is_null=True,
        )
        import numpy as np

        frac_us = np.zeros(n, dtype=np.int64)
        for i, s in enumerate(ts_str.to_pylist()):
            if s and len(s) > 20 and s[19] == ".":
                digits = "".join(ch for ch in s[20:26] if ch.isdigit())
                if digits:
                    frac_us[i] = int(digits.ljust(6, "0"))
        cols["warc_ts"] = pc.cast(
            pc.add(pc.cast(base, pa.int64()), pa.array(frac_us, pa.int64())),
            pa.timestamp("us"),
        )
    if "html" in names:
        raw = batch.column("html").to_pylist()
        decoded = []
        for v in raw:
            if not v:
                decoded.append(None)
                continue
            try:
                decoded.append(base64.b64decode(v, validate=True))
            except Exception:
                decoded.append(None)  # malformed payload ⇒ null ⇒ text fallback
        cols["html"] = pa.array(decoded, pa.binary())
    else:
        cols["html"] = pa.nulls(n, pa.binary())
    cols["text"] = _get_string("text")
    cols["lang"] = _get_string("lang")
    out = pa.table(cols)
    for name in batch.column_names:  # carry extras (doc_id, ...) through
        if name not in out.column_names:
            out = out.append_column(name, batch.column(name))
    return out


def read_pages_jsonl(paths: str | list[str]) -> rd.Dataset:
    """Pages Dataset from JSONL file(s) — file-parallel read + the
    coercion boundary, schema-identical to ``read_parquet`` pages."""
    ds = rd.read_json(paths)
    return ds.map_batches(coerce_pages, batch_format="pyarrow")
