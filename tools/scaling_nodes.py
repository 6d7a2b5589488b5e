"""Two-NODE emulation for the full-occupancy scaling criterion.

The open question from the round-4 scaling evidence: the single-box
Ray 8→32 pair reads ~0.65 because at 32 cores ONE raylet, ONE object
store, ONE driver and one shared memory bus serve 4× the workers —
costs added NODES do not share. This harness emulates adding a node
the only way a single box can: it partitions the machine into two
fully ISOLATED 16-CPU Ray clusters (separate processes, separate
raylets, separate object stores, separate plasma dirs, disjoint pinned
CPU sets) and compares

  1-node : one pinned 16-cpu cluster gates the WHOLE WARC corpus
  2-node : two pinned 16-cpu clusters each gate HALF, started through
           a shared go-file barrier so the timed windows overlap

scaling efficiency = (docs / max(t_a, t_b)) / (2 × docs / t_1node)

Every window excludes warmup (worker-pool spin-up + scorer state) —
steady-state throughput, matching bench.py's headline discipline. The
corpus is the compute-per-byte-heaviest path (gzipped WARC → record
framing → html→text → langid → LM → 30-rule vector), the same corpus
as SCALING_r4's pinned pairs, so the numbers compose.

Usage (orchestrator):
    PYTHONPATH=/root/repo python tools/scaling_nodes.py [--runs 3]
Prints one JSON line; write it into SCALING_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALING_HTML_DOCS", "400000"))
HALF = int(os.environ.get("NODE_CPUS", "16"))  # CPUs per emulated node
N_NODES = int(os.environ.get("NODES", "2"))    # emulated node count


# ---------------------------------------------------------------------------
# worker: one emulated node = one isolated Ray cluster, pinned outside
# ---------------------------------------------------------------------------

def worker(args) -> None:
    import ray

    os.environ.pop("RAY_ADDRESS", None)  # never join another cluster
    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        object_store_memory=8 * 1024**3,
        _temp_dir=args.ray_tmp,
    )
    from rsmetacheck_ray.pipelines.quality_gate import run_gate

    files = sorted(open(args.file_list).read().split())
    # warmup OUTSIDE the timed window: spin the worker pool, build
    # per-worker scorer state, touch the input format path
    shutil.rmtree(args.out + "_warm", ignore_errors=True)
    run_gate(files[:4], args.out + "_warm", input_format="warc")

    # barrier: report ready, then wait for the orchestrator's go-file
    # so both nodes' timed windows overlap fully
    open(args.ready_file, "w").close()
    while not os.path.exists(args.go_file):
        time.sleep(0.02)

    shutil.rmtree(args.out, ignore_errors=True)
    t0 = time.perf_counter()
    m = run_gate(files, args.out, input_format="warc")
    dt = time.perf_counter() - t0
    print(json.dumps({
        "docs": m["total_documents"], "sec": round(dt, 3),
        "docs_per_sec": round(m["total_documents"] / dt, 1),
    }))
    ray.shutdown()


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def _corpus_files() -> list[str]:
    """The cached WARC scaling corpus (shared with tools/scaling_probe
    and bench.py --scaling-corpus warc)."""
    import ray

    from rsmetacheck_ray.datagen import corpus_dir

    import bench

    need_ray = not ray.is_initialized()
    if need_ray:
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    html_pages, _ = corpus_dir(N_DOCS, n_files=max(64, N_DOCS // 800))
    wdir = bench.prepare_warc(html_pages)
    if need_ray:
        ray.shutdown()
    bench.warm_page_cache(wdir)
    return sorted(
        os.path.join(wdir, f)
        for f in os.listdir(wdir)
        if f.endswith(".warc.gz")
    )


def _launch(tag: str, cpu_range: str, files: list[str]):
    base = f"/tmp/rsmc_nodes/{tag}"
    os.makedirs(base, exist_ok=True)
    flist = os.path.join(base, "files.txt")
    with open(flist, "w") as fh:
        fh.write("\n".join(files))
    ready = os.path.join(base, "ready")
    go = os.path.join(base, "go")
    for p in (ready, go):
        if os.path.exists(p):
            os.remove(p)
    cmd = [
        sys.executable, os.path.abspath(__file__), "--worker",
        "--cpus", str(HALF), "--file-list", flist,
        "--out", os.path.join(base, "out"),
        "--ray-tmp", os.path.join(base, "ray"),
        "--ready-file", ready, "--go-file", go,
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", cpu_range] + cmd
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    return proc, ready, go


def _collect(proc) -> dict:
    out, _ = proc.communicate(timeout=3600)
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _barrier_go(waiters) -> None:
    deadline = time.time() + 1200
    for _, ready, _ in waiters:
        while not os.path.exists(ready):
            if time.time() > deadline:
                raise TimeoutError("worker never became ready")
            time.sleep(0.1)
    for _, _, go in waiters:
        open(go, "w").close()


def one_round(files: list[str]) -> dict:
    # 1-node: a single pinned HALF-cpu cluster over the whole corpus
    p, ready, go = _launch("solo", f"0-{HALF - 1}", files)
    _barrier_go([(p, ready, go)])
    solo = _collect(p)

    # N nodes: N isolated pinned HALF-cpu clusters over 1/N each,
    # started together through the barrier
    waiters = []
    for k in range(N_NODES):
        cpu_range = f"{k * HALF}-{(k + 1) * HALF - 1}"
        waiters.append(_launch(f"n{k}", cpu_range, files[k::N_NODES]))
    _barrier_go(waiters)
    nodes = [_collect(w[0]) for w in waiters]

    docs_n = sum(n["docs"] for n in nodes)
    wall_n = max(n["sec"] for n in nodes)
    tput1 = solo["docs_per_sec"]
    tput_n = docs_n / wall_n
    return {
        "one_node_docs_per_sec": tput1,
        "n_node_docs_per_sec": round(tput_n, 1),
        "n_node_skew_sec": round(
            max(n["sec"] for n in nodes) - min(n["sec"] for n in nodes), 3
        ),
        "efficiency": round(tput_n / (N_NODES * tput1), 3),
        "solo": solo, "nodes": nodes,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=HALF)
    ap.add_argument("--file-list")
    ap.add_argument("--out")
    ap.add_argument("--ray-tmp")
    ap.add_argument("--ready-file")
    ap.add_argument("--go-file")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return
    files = _corpus_files()
    rounds = [one_round(files) for _ in range(args.runs)]
    best = max(rounds, key=lambda r: r["efficiency"])
    med = sorted(r["efficiency"] for r in rounds)[len(rounds) // 2]
    print(json.dumps({
        "metric": "two_node_emulation_scaling",
        "nodes": N_NODES, "cpus_per_node": HALF,
        "corpus": f"gzipped WARC real-HTML gate corpus, {N_DOCS} docs",
        "efficiency_median": med,
        "efficiency_runs": [r["efficiency"] for r in rounds],
        "rounds": rounds,
        "best": best,
    }))


if __name__ == "__main__":
    main()
