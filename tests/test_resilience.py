"""Worker-loss resilience: SIGKILL a Ray worker process (never the
driver) while a shuffle-bearing dedup query is executing and assert
the output is identical to an undisturbed run — Ray's task retry plus
lineage re-execution must absorb the loss. This is the multi-node
failure mode the on-disk resume tests don't cover."""

from __future__ import annotations

import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def _active_worker_pids() -> list[int]:
    """PIDs of ray workers EXECUTING a task right now (cmdline
    'ray::<task>', not 'ray::IDLE'), never the current process."""
    me = os.getpid()
    out = []
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit() or int(pid_s) == me:
            continue
        try:
            with open(f"/proc/{pid_s}/cmdline", "rb") as f:
                cmd = f.read().split(b"\0")[0].decode(errors="replace")
        except OSError:
            continue
        if cmd.startswith("ray::") and not cmd.startswith("ray::IDLE"):
            out.append(int(pid_s))
    return out


class _Killer(threading.Thread):
    """Poll for ACTIVE ray workers and SIGKILL up to ``n`` of them —
    a kill only counts when it lands on a worker mid-task."""

    def __init__(self, n: int = 1):
        super().__init__(daemon=True)
        self.n = n
        self.killed: list[int] = []
        self.stop = threading.Event()

    def run(self):
        while len(self.killed) < self.n and not self.stop.is_set():
            for pid in _active_worker_pids():
                if pid in self.killed:
                    continue
                try:
                    os.kill(pid, signal.SIGKILL)
                    self.killed.append(pid)
                except OSError:
                    continue
                if len(self.killed) >= self.n:
                    break
            time.sleep(0.02)


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def _run_with_kill(fn, want, n_kill: int):
    """Run ``fn`` repeatedly with a concurrent active-worker killer
    until a kill lands mid-execution (a warm run can finish before any
    task is observable); every attempt's output must equal ``want``."""
    for _ in range(8):
        killer = _Killer(n=n_kill)
        killer.start()
        try:
            got = _rows(fn(SF))
        finally:
            killer.stop.set()
            killer.join(timeout=12)
        assert got == want
        if killer.killed:
            return killer.killed
    return []


def test_worker_loss_mid_shuffle_identical_output(ray_session):
    from rsmetacheck_ray.pipelines.queries import registry

    fn = registry()["dedup_exact"][0]
    want = _rows(fn(SF))
    assert len(want) > 0
    killed = _run_with_kill(fn, want, n_kill=2)
    assert killed, "no kill ever landed on an executing worker"


def test_worker_loss_during_groupby_shuffle(ray_session):
    """Same check on a groupby-shuffle query (sessionization: one
    hashed-partition all-to-all with per-group merges)."""
    from rsmetacheck_ray.pipelines.queries import registry

    fn = registry()["sessionize_users"][0]
    want = _rows(fn(SF))
    assert len(want) > 0
    killed = _run_with_kill(fn, want, n_kill=1)
    assert killed, "no kill ever landed on an executing worker"


def _active_gate_actor_pids() -> list[int]:
    """PIDs of GateStage ACTORS currently executing a submit call."""
    me = os.getpid()
    out = []
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit() or int(pid_s) == me:
            continue
        try:
            with open(f"/proc/{pid_s}/cmdline", "rb") as f:
                cmd = f.read().split(b"\0")[0].decode(errors="replace")
        except OSError:
            continue
        if cmd.startswith("ray::MapWorker(MapBatches(GateStage)).submit"):
            out.append(int(pid_s))
    return out


def test_actor_pool_member_loss(ray_session):
    """SIGKILL a GateStage ACTOR mid-batch on the actor-pool gate
    layout (build_gate(compute='actors')): Ray Data must replace the
    pool member and re-run its in-flight batch, with gate output
    identical to an undisturbed run — the stateful-stage counterpart
    of the task-retry tests above."""
    import pyarrow.compute as pc
    import ray.data as rd

    from rsmetacheck_ray.datagen import corpus_dir
    from rsmetacheck_ray.pipelines.quality_gate import build_gate

    pages_dir, _ = corpus_dir(20000, n_files=16)

    def gate_counts(kill: bool):
        out = build_gate(rd.read_parquet(pages_dir), compute="actors")
        killed: list[int] = []
        stop = threading.Event()

        def killer():
            deadline = time.time() + 20
            while (
                not killed and time.time() < deadline
                and not stop.is_set()
            ):
                for pid in _active_gate_actor_pids():
                    try:
                        os.kill(pid, signal.SIGKILL)
                        killed.append(pid)
                        break
                    except OSError:
                        continue
                time.sleep(0.02)

        th = None
        if kill:
            th = threading.Thread(target=killer, daemon=True)
            th.start()
        n = kept = 0
        for b in out.iter_batches(batch_format="pyarrow"):
            n += len(b)
            kept += pc.sum(pc.cast(b.column("keep"), "int64")).as_py()
        if th:
            stop.set()
            th.join(timeout=21)
        return n, kept, killed

    want = gate_counts(False)
    assert want[0] == 20000
    for _ in range(5):
        got = gate_counts(True)
        assert got[:2] == want[:2], (got, want)
        if got[2]:
            return  # a kill landed mid-batch and the run still matched
    raise AssertionError("no kill ever landed on an executing actor")


def test_worker_loss_during_bsp_bfs(ray_session):
    """SIGKILL a worker during the raw-Ray BSP min-plus BFS
    (dedup_graph_bfs): task retry + lineage reconstruction of the
    per-shard distance objects must reproduce the identical hop map —
    the bare-task counterpart of the Dataset-shuffle kill tests."""
    from rsmetacheck_ray.pipelines.queries import q_dedup_graph_bfs

    def fn(sf):
        t = q_dedup_graph_bfs(sf)
        return sorted(
            zip(
                t.column("doc_id").to_pylist(),
                t.column("component_id").to_pylist(),
                t.column("dist").to_pylist(),
            )
        )

    want = fn(SF)
    assert len(want) > 0
    for _ in range(8):
        killer = _Killer(n=1)
        killer.start()
        try:
            got = fn(SF)
        finally:
            killer.stop.set()
            killer.join(timeout=12)
        assert got == want
        if killer.killed:
            return
    raise AssertionError("no kill ever landed on an executing worker")


def test_worker_loss_during_knn_block_pair_tasks(ray_session):
    """Same check on the kNN JOIN's raw block-pair task stage (the
    from_arrow_refs escape hatch) — a killed block-pair task must be
    retried by lineage, not silently dropped from the union."""
    from rsmetacheck_ray.pipelines.queries import registry

    fn = registry()["crosslingual_knn"][0]
    want = _rows(fn(SF))
    assert len(want) > 0
    killed = _run_with_kill(fn, want, n_kill=1)
    assert killed, "no kill ever landed on an executing worker"
