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
