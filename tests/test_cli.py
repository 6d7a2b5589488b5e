"""CLI surface (rsmetacheck_ray/cli.py): the query subcommand — list,
sample output, parquet export, unknown-name failure. Runs in-process
against the session Ray fixture (cli.main only initializes Ray when
none is active)."""

from __future__ import annotations

import json

import pyarrow.parquet as pq

from rsmetacheck_ray.cli import main

SF_DIR = "/root/testdata/sf0.001"


def test_query_list(capsys):
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "dedup_exact" in names and "gate_then_dedup" in names
    assert names == sorted(names)


def test_query_sample(ray_session, capsys):
    assert main(["query", "url_canonical", "--sf-dir", SF_DIR]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert 0 < len(lines) <= 10
    row = json.loads(lines[0])
    assert {"doc_id", "url", "canonical_url"} <= set(row)


def test_query_export(ray_session, tmp_path, capsys):
    dest = str(tmp_path / "out.parquet")
    assert main(
        ["query", "doc_stats", "--sf-dir", SF_DIR, "--dest", dest]
    ) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] > 0
    # Dataset.write_parquet writes a directory of fragments
    import os

    total = (
        sum(
            pq.read_metadata(os.path.join(dest, f)).num_rows
            for f in os.listdir(dest)
            if f.endswith(".parquet")
        )
        if os.path.isdir(dest)
        else pq.read_metadata(dest).num_rows
    )
    assert total == info["rows"]


def test_query_unknown_name(capsys):
    # validated pre-Ray-init (no session needed), error on stderr
    assert main(["query", "nope_not_a_query", "--sf-dir", SF_DIR]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_export_jsonl_views(ray_session, tmp_path, capsys):
    from rsmetacheck_ray.datagen import corpus_dir
    from rsmetacheck_ray.pipelines.quality_gate import run_gate

    pages_dir, _ = corpus_dir(300)
    out = str(tmp_path / "run")
    m = run_gate(pages_dir, out, n_partitions=2)
    dest = str(tmp_path / "jsonl")
    assert main(["export", "--out", out, "--dest", dest,
                 "--view", "kept"]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == m["kept"] and info["files"] >= 1
    # every exported line is standalone JSON with the kept columns
    import os

    n_lines = 0
    for f in os.listdir(dest):
        with open(os.path.join(dest, f)) as fh:
            for line in fh:
                row = json.loads(line)
                assert "url" in row and "scrubbed_text" in row
                n_lines += 1
    assert n_lines == m["kept"]


def test_gate_incremental_cli(ray_session, small_corpus, tmp_path, capsys):
    """`gate --incremental` end to end through the CLI: first run
    gates everything, second run with no new fragments is a no-op
    delta with identical merged metrics."""
    import glob
    import json as _json
    import os
    import shutil

    pages_dir, _ = small_corpus
    lake = tmp_path / "lake"
    os.makedirs(lake)
    for f in sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))[:2]:
        shutil.copy(f, lake)
    out = tmp_path / "run"
    assert main(["gate", "--incremental", "--input", str(lake),
                 "--out", str(out), "--partitions", "1"]) == 0
    m1 = _json.loads(capsys.readouterr().out)
    assert m1["incremental"]["epoch"] == 0
    assert m1["total_documents"] > 0
    assert main(["gate", "--incremental", "--input", str(lake),
                 "--out", str(out), "--partitions", "1"]) == 0
    m2 = _json.loads(capsys.readouterr().out)
    assert m2["incremental"]["new_fragments"] == 0
    m1.pop("incremental"); m2.pop("incremental")
    assert m1 == m2


def test_metrics_cli_incremental_layout(ray_session, small_corpus, tmp_path, capsys):
    """`metrics --out` on an incremental run dir merges per-epoch
    recomputes and matches the run's own merged metrics (minus the
    incremental block, which only the run writer knows)."""
    import glob
    import json as _json
    import os
    import shutil

    pages_dir, _ = small_corpus
    lake = tmp_path / "lake"
    os.makedirs(lake)
    for f in sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))[:2]:
        shutil.copy(f, lake)
    out = tmp_path / "run"
    assert main(["gate", "--incremental", "--input", str(lake),
                 "--out", str(out), "--partitions", "1"]) == 0
    run_metrics = _json.loads(capsys.readouterr().out)
    run_metrics.pop("incremental")
    assert main(["metrics", "--out", str(out)]) == 0
    recomputed = _json.loads(capsys.readouterr().out)
    # skipped_fragments lineage lives only in the manifest; the pure
    # recompute carries everything else
    run_metrics.pop("skipped_fragments", None)
    assert recomputed == run_metrics


def test_kept_view_cli_incremental_layout(ray_session, small_corpus, tmp_path, capsys):
    """`kept --out <incremental-run>` exports across all epochs."""
    import glob
    import json as _json
    import os
    import shutil

    pages_dir, _ = small_corpus
    lake = tmp_path / "lake"
    os.makedirs(lake)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    shutil.copy(files[0], lake)
    out = tmp_path / "run"
    assert main(["gate", "--incremental", "--input", str(lake),
                 "--out", str(out), "--partitions", "1"]) == 0
    m1 = _json.loads(capsys.readouterr().out)
    shutil.copy(files[1], lake)
    assert main(["gate", "--incremental", "--input", str(lake),
                 "--out", str(out), "--partitions", "1"]) == 0
    m2 = _json.loads(capsys.readouterr().out)
    dest = tmp_path / "kept"
    assert main(["kept", "--out", str(out), "--dest", str(dest)]) == 0
    res = _json.loads(capsys.readouterr().out)
    assert res["rows"] == m2["kept"] > m1["kept"]
