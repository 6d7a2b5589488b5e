"""Chaos matrix (r5): ONE gate run over the full 8-format mixed lake
with a corrupt fragment per format AND Ray workers SIGKILLed mid-run —
the combined failure mode the per-format corrupt tests and the
worker-loss tests cover only separately. Final metrics and the docs
output must equal an undisturbed clean run, and every one of the 8
corrupt fragments must appear in the ``skipped_fragments`` lineage."""

from __future__ import annotations

import glob
import io
import os
import shutil
import sys
import tarfile

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def lake8(tmp_path_factory, ray_session):
    """8-fragment corpus, one fragment per format, plus one corrupt
    fragment per format (8 good + 8 bad files)."""
    from tests.test_avro_source import _to_avro
    from tests.test_csv_source import _to_csv
    from tests.test_ipc_source import _to_ipc
    from tests.test_jsonl_source import _to_jsonl
    from tests.test_orc_source import _to_orc
    from tests.test_tar_source import _to_tar
    from tests.test_warc_source import _to_warc

    from rsmetacheck_ray.datagen import corpus_dir

    pages_dir, _ = corpus_dir(2000, n_files=8)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    assert len(files) == 8
    lake = str(tmp_path_factory.mktemp("lake8"))

    def one(src: str, conv) -> None:
        d = src + ".tmp1"
        os.makedirs(d, exist_ok=True)
        shutil.copy(src, d)
        conv(d, lake)
        shutil.rmtree(d)

    shutil.copy(files[0], lake)
    one(files[1], _to_jsonl)
    one(files[2], _to_csv)
    one(files[3], _to_orc)
    one(files[4], _to_ipc)
    one(files[5], _to_tar)
    one(files[6], _to_avro)
    one(files[7], lambda d, o: _to_warc(d, o, gz_half=True))

    # one corrupt fragment per format (each format's known bad shape)
    bads = []

    def bad(name: str, data: bytes) -> None:
        p = os.path.join(lake, name)
        with open(p, "wb") as fh:
            fh.write(data)
        bads.append(p)

    bad("zz-bad.parquet", b"PAR1 this is not a parquet footer")
    bad("zz-bad.jsonl", b'{"url": "https://x.example", "text": trunc')
    bad("zz-bad.csv",
        b'url,warc_ts,html,text,lang\n"https://x.example,,,"trunc')
    bad("zz-bad.orc", b"ORC\x00nope")
    bad("zz-bad.arrow", b"ARROW1\x00\x00not really an ipc file")
    bad("zz-bad.avro", b"Obj\x01 torn avro header")
    bad("zz-bad.warc",
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        payload = b"this is not json {"
        info = tarfile.TarInfo(name="member.json")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    bad("zz-bad.tar", buf.getvalue())

    return lake, sorted(bads)


def test_chaos_matrix_kill_plus_corrupt(ray_session, lake8, tmp_path):
    """Corrupt fragments in every format + workers killed mid-shuffle:
    metrics, lineage and the per-doc output all match the clean run."""
    import pandas as pd

    from tests.test_resilience import _Killer

    from rsmetacheck_ray.pipelines.quality_gate import run_gate

    lake, bads = lake8
    out_clean = tmp_path / "clean"
    clean = run_gate(lake, str(out_clean), n_partitions=4,
                     input_format="auto")
    assert clean["total_documents"] == 2000
    assert sorted(clean["skipped_fragments"]) == bads

    # chaos runs: repeat until a kill actually lands mid-run (a warm
    # run can finish before any task is observable); every attempt —
    # disturbed or not — must reproduce the clean result exactly
    landed = False
    for attempt in range(8):
        out_chaos = tmp_path / f"chaos{attempt}"
        killer = _Killer(n=2)
        killer.start()
        try:
            chaos = run_gate(lake, str(out_chaos), n_partitions=4,
                             input_format="auto")
        finally:
            killer.stop.set()
            killer.join(timeout=12)
        assert chaos == clean
        a = (pq.read_table(str(out_clean / "docs")).to_pandas()
             .sort_values("url").reset_index(drop=True))
        b = (pq.read_table(str(out_chaos / "docs")).to_pandas()
             .sort_values("url").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        if killer.killed:
            landed = True
            break
    assert landed, "no kill ever landed on an active worker"
