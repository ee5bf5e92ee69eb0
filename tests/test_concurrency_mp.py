"""Cross-process lock semantics with hard-killed holders.

`tests/test_concurrency.py` races threads; these tests cover the claims
that only survive a REAL crash — a holder SIGKILLed mid-lease leaves its
lease file on disk with no releasing finally-block, and takeover must
recover it — plus the stale-takeover-entry sweep and the tmp-staging
sweep, each across process boundaries. No Spark involved: the lock is
pure filesystem metadata by design (concurrency.py module docstring).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import signal
import time

import pytest

from hudi_utility_spark import concurrency
from hudi_utility_spark.table import KeyedTable, TableType


def _table(root: str) -> KeyedTable:
    return KeyedTable(
        path=os.path.join(root, "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )


def _hold_lock_forever(root: str, ready) -> None:
    with concurrency.table_lock(_table(root), owner="victim"):
        ready.set()
        time.sleep(300)


def _race_one_acquire(root: str, result_dir: str) -> None:
    """Attempt ONE takeover of a known-stale lease; while holding, probe
    that no other process holds concurrently (write pid, sleep, read
    back)."""
    try:
        with concurrency.table_lock(
            _table(root), owner=f"p{os.getpid()}", timeout_s=5.0
        ):
            probe = os.path.join(result_dir, "probe")
            with open(probe, "w") as f:
                f.write(str(os.getpid()))
            time.sleep(0.3)
            got = open(probe).read()
            verdict = "ok" if got == str(os.getpid()) else "VIOLATION"
            with open(os.path.join(result_dir, f"r{os.getpid()}"), "w") as f:
                f.write(verdict)
    except concurrency.LockHeld:
        pass


@pytest.fixture
def ctx():
    # spawn, not fork: the pytest process may carry a live py4j gateway
    return mp.get_context("spawn")


def test_sigkilled_holder_is_taken_over(tmp_path, ctx):
    root = str(tmp_path)
    table = _table(root)
    ready = ctx.Event()
    p = ctx.Process(target=_hold_lock_forever, args=(root, ready))
    p.start()
    try:
        assert ready.wait(60), "holder never acquired"
        os.kill(p.pid, signal.SIGKILL)
        p.join(10)
        lock = concurrency._lock_path(table)
        # the orphaned lease is still on disk — no finally ran
        assert os.path.exists(lock)
        # within its term the dead holder's lease still excludes writers
        with pytest.raises(concurrency.LockHeld, match="victim"):
            with concurrency.table_lock(table, owner="b", timeout_s=3600.0):
                pass
        # past its term it is taken over, and release removes it
        with concurrency.table_lock(table, owner="b", timeout_s=0.0):
            assert json.loads(open(lock).read())["owner"] == "b"
        assert not os.path.exists(lock)
    finally:
        if p.is_alive():
            p.kill()
            p.join(10)


def test_crashed_takeover_entry_is_swept(tmp_path):
    """A contender that died inside the takeover critical section must
    not wedge takeovers forever; its (uniquely-named, never-reused)
    entry expires and is removed by the next contender."""
    table = _table(str(tmp_path))
    lock = concurrency._lock_path(table)
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w") as f:
        json.dump({"owner": "dead", "acquired_at": time.time() - 10_000}, f)
    stale_entry = f"{lock}.tk.99999.1"
    with open(stale_entry, "w") as f:
        f.write("crashed")
    old = time.time() - 40
    os.utime(stale_entry, (old, old))
    with concurrency.table_lock(table, owner="b", timeout_s=60.0):
        assert json.loads(open(lock).read())["owner"] == "b"
    assert not os.path.exists(stale_entry)


def test_tiny_timeout_contender_spares_fresh_staging(tmp_path):
    """The tmp sweep uses a fixed generous floor, not the caller's
    timeout — a timeout_s=0 contender must not delete another writer's
    just-staged payload (ADVICE r2: that os.link would then crash)."""
    table = _table(str(tmp_path))
    lock_dir = os.path.dirname(concurrency._lock_path(table))
    os.makedirs(lock_dir, exist_ok=True)
    staged = os.path.join(lock_dir, "writer.lock.12345.67.tmp")
    with open(staged, "w") as f:
        f.write("{}")
    with concurrency.table_lock(table, owner="b", timeout_s=0.0):
        pass
    assert os.path.exists(staged)


def test_multiprocess_takeover_race_single_winner(tmp_path, ctx):
    """Eight processes race to take over one stale lease; mutual
    exclusion must hold throughout (each winner's probe read-back sees
    its own pid) and at least one must win."""
    root = str(tmp_path)
    table = _table(root)
    lock = concurrency._lock_path(table)
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    with open(lock, "w") as f:
        json.dump({"owner": "dead", "acquired_at": time.time() - 10_000}, f)
    result_dir = str(tmp_path / "results")
    os.makedirs(result_dir)
    procs = [
        ctx.Process(target=_race_one_acquire, args=(root, result_dir))
        for _ in range(8)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    verdicts = [
        open(os.path.join(result_dir, n)).read()
        for n in os.listdir(result_dir)
        if n.startswith("r")
    ]
    assert verdicts, "no process ever acquired the stale lease"
    assert all(v == "ok" for v in verdicts), verdicts
