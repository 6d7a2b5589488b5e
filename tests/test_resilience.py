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

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def _ray_worker_pids() -> list[int]:
    """PIDs of ray worker processes, busiest first (cmdline 'ray::<task>'
    before 'ray::IDLE'), never the current process."""
    me = os.getpid()
    active, idle = [], []
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit() or int(pid_s) == me:
            continue
        try:
            with open(f"/proc/{pid_s}/cmdline", "rb") as f:
                cmd = f.read().split(b"\0")[0].decode(errors="replace")
        except OSError:
            continue
        if cmd.startswith("ray::IDLE"):
            idle.append(int(pid_s))
        elif cmd.startswith("ray::"):
            active.append(int(pid_s))
    return active + idle


class _Killer(threading.Thread):
    """After ``delay`` seconds, SIGKILL up to ``n`` worker processes;
    keeps retrying the scan briefly so the kill lands mid-execution."""

    def __init__(self, delay: float = 0.3, n: int = 2):
        super().__init__(daemon=True)
        self.delay, self.n = delay, n
        self.killed: list[int] = []
        self.stop = threading.Event()

    def run(self):
        time.sleep(self.delay)
        deadline = time.time() + 10.0
        while (
            len(self.killed) < self.n
            and time.time() < deadline
            and not self.stop.is_set()
        ):
            for pid in _ray_worker_pids():
                if pid in self.killed:
                    continue
                try:
                    os.kill(pid, signal.SIGKILL)
                    self.killed.append(pid)
                except OSError:
                    continue
                if len(self.killed) >= self.n:
                    break
            time.sleep(0.1)


def _rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_worker_loss_mid_shuffle_identical_output(ray_session):
    from rsmetacheck_ray.pipelines.queries import registry

    fn = registry()["dedup_exact"][0]
    want = _rows(fn(SF))
    assert len(want) > 0

    killer = _Killer(delay=0.2, n=2)
    killer.start()
    try:
        got = _rows(fn(SF))
    finally:
        killer.stop.set()
        killer.join(timeout=12)
    # the kill must actually have landed on live worker processes —
    # otherwise this test silently degrades to a plain re-run
    assert killer.killed, "no ray worker process found to kill"
    assert got == want


def test_worker_loss_during_groupby_shuffle(ray_session):
    """Same check on a groupby-shuffle query (sessionization: one
    hashed-partition all-to-all with per-group merges)."""
    from rsmetacheck_ray.pipelines.queries import registry

    fn = registry()["sessionize_users"][0]
    want = _rows(fn(SF))
    assert len(want) > 0

    killer = _Killer(delay=0.15, n=1)
    killer.start()
    try:
        got = _rows(fn(SF))
    finally:
        killer.stop.set()
        killer.join(timeout=12)
    assert killer.killed, "no ray worker process found to kill"
    assert got == want
