"""ORC source for the pages table — the fifth input format (after
parquet, JSONL, CSV and WARC), for corpora exported from Hive/Spark
warehouses where ORC is the native columnar layout.

Ray Data has no ``read_orc``, so this is a real ``FileBasedDatasource``
(the WARC lesson, sources/warc_pages.py): the read task itself decodes
ORC stripes into page ROWS, one block per stripe, so downstream
operators see row-count-true blocks and honest row-based scheduling —
never the one-row-per-file collapse of ``read_binary_files`` + parse.

ORC stores native Arrow types (timestamp/binary survive), so unlike
CSV/JSONL there is no string-coercion dialect; the boundary only
normalizes column order and unit (timestamp → µs) to the shared pages
schema. A corrupt file fails its read task strictly, and
``probe_orc`` streams stripe-by-stripe for the resume loop's
skip-and-record classification.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.datasource import FileBasedDatasource

from ..schema import PAGES_COLUMNS


def _normalize(t: pa.Table) -> pa.Table:
    """Column order + timestamp unit to the shared pages schema."""
    cols = {}
    for name in PAGES_COLUMNS:
        col = t.column(name)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        cols[name] = col
    return pa.table(cols)


class OrcDatasource(FileBasedDatasource):
    """One block per ORC stripe — the format's natural parallel unit
    within a file (files stay the cross-task unit)."""

    def _read_stream(self, f, path: str):
        import pyarrow.orc as orc

        of = orc.ORCFile(pa.BufferReader(f.readall()))
        if of.nstripes == 0:  # header-only file: one empty, typed block
            yield _normalize(of.read())
            return
        for i in range(of.nstripes):
            yield _normalize(
                pa.Table.from_batches([of.read_stripe(i)])
            )


def read_pages_orc(paths: str | list[str]) -> rd.Dataset:
    """Pages Dataset from ORC file(s), schema-identical to the parquet
    pages path."""
    import os

    filter_exts = isinstance(paths, str) and os.path.isdir(paths)
    return rd.read_datasource(
        OrcDatasource(
            paths, file_extensions=["orc"] if filter_exts else None
        )
    )


def probe_orc(path: str) -> int:
    """Raise if the file cannot be FULLY decoded; returns row count.
    Streams stripe-by-stripe so the resume loop's corruption probe
    never materializes a fragment in driver memory."""
    import pyarrow.orc as orc

    of = orc.ORCFile(path)
    rows = 0
    for i in range(of.nstripes):
        rows += of.read_stripe(i).num_rows
    return rows


def write_pages_orc(
    table: pa.Table, path: str, stripe_size: int | None = None
) -> None:
    """Write a pages-shaped table as ORC (test/export helper —
    production output stays parquet). ``stripe_size`` (bytes) bounds
    rows per stripe so multi-stripe files are testable at small
    sizes."""
    import pyarrow.orc as orc

    kw = {"stripe_size": stripe_size} if stripe_size else {}
    orc.write_table(_normalize(table), path, **kw)
