"""Lease-based IndexLock protocol tests (sources/locking.py).

The r13 protocol had two stacked hazards (VERDICT r13 "What's wrong",
ADVICE r13 medium): the steal put-back used os.rename (clobbers a third
claimant's fresh O_EXCL lock → two writers inside the critical
section), and liveness was a same-host pid probe (a multi-host
warehouse would misjudge every remote owner as dead).  These tests pin
the replacement: lease expiry is the ONLY cross-host reclaim signal,
same-host death is a fast path, the put-back is clobber-free
(os.link), a stolen-from owner fails loudly before logging its txn,
and N racing processes with forced crashes keep the txn log gap-free
and the critical section single-occupancy.

No Spark session: IndexLock only reads spark.conf for the warehouse
dir, so a stub keeps the whole file JVM-free (subprocess racers start
in milliseconds instead of seconds)."""

import json
import os
import socket
import subprocess
import sys
import time
import uuid
from unittest import mock

import pytest

from steel_datafusion_spark.sources.locking import (
    IndexLock, LockLost, LockTimeout, index_txns, log_index_txn,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _FakeSpark:
    """Just enough of a SparkSession for the locking module."""

    def __init__(self, warehouse: str):
        self.conf = self
        self._wh = warehouse

    def get(self, key):
        assert key == "spark.sql.warehouse.dir"
        return self._wh


@pytest.fixture()
def wh(tmp_path):
    return _FakeSpark(str(tmp_path / "wh"))


def _write_lock(path: str, host: str, pid: int, ts: float,
                lease_s: float, token: str | None = None) -> str:
    token = token or uuid.uuid4().hex
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"host": host, "pid": pid, "ts": ts,
                   "token": token, "lease_s": lease_s}, fh)
    return token


def _dead_pid() -> int:
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    return p.pid


def test_remote_live_lease_not_stolen(wh):
    """A REMOTE owner's lock with a fresh lease must NOT be stolen even
    though its pid is not visible on this host — the r13 pid probe
    would have misjudged it dead and handed the lock to a second
    writer."""
    lk = IndexLock(wh, "idx", timeout_s=1.2, poll_s=0.05)
    _write_lock(lk.path, "some-other-host", _dead_pid(),
                ts=time.time(), lease_s=3600.0)
    t0 = time.monotonic()
    with pytest.raises(LockTimeout):
        with lk:
            pass
    assert time.monotonic() - t0 >= 1.0  # genuinely waited
    assert os.path.exists(lk.path)       # remote owner's lock intact


def test_remote_expired_lease_is_stolen(wh):
    lk = IndexLock(wh, "idx", timeout_s=5.0, poll_s=0.05)
    _write_lock(lk.path, "some-other-host", 1,
                ts=time.time() - 10.0, lease_s=2.0)
    with lk:
        assert lk.still_held()
    assert not os.path.exists(lk.path)


def test_same_host_dead_pid_fast_path(wh):
    """A dead owner on THIS host is reclaimed immediately — no need to
    wait out a long lease when death is locally observable."""
    lk = IndexLock(wh, "idx", timeout_s=5.0, poll_s=0.05)
    _write_lock(lk.path, socket.gethostname(), _dead_pid(),
                ts=time.time(), lease_s=3600.0)
    t0 = time.monotonic()
    with lk:
        assert time.monotonic() - t0 < 2.0


def test_heartbeat_keeps_short_lease_alive(wh):
    """A live owner holding longer than its lease is never stolen: the
    heartbeat re-stamps ts every lease/3."""
    owner = IndexLock(wh, "idx", lease_s=1.0)
    waiter = IndexLock(wh, "idx", timeout_s=2.5, poll_s=0.05)
    with owner:
        time.sleep(2.0)  # two lease periods
        with pytest.raises(LockTimeout):
            with waiter:
                pass
        assert owner.still_held()
    with waiter:  # released: acquires instantly
        pass


def test_stalled_owner_detects_loss_and_aborts_txn(wh):
    """An owner whose heartbeat stalls past its lease is stolen from;
    it must then fail assert_held/log_index_txn/exit LOUDLY rather
    than commit — the single-writer guarantee under the lease model."""
    owner = IndexLock(wh, "idx", lease_s=0.6)
    waiter = IndexLock(wh, "idx", timeout_s=10.0, poll_s=0.05)
    owner.__enter__()
    try:
        owner._hb_stop.set()          # simulate a GC-pause/stall
        owner._hb_thread.join()
        time.sleep(1.0)               # lease expires
        with waiter:                  # reclaims the expired lease
            with pytest.raises(LockLost):
                log_index_txn(wh, "idx", {"verb": "x"}, lock=owner)
            assert index_txns(wh, "idx") == []  # nothing was logged
            assert waiter.still_held()
    finally:
        with pytest.raises(LockLost):
            owner.__exit__(None, None, None)


def test_steal_putback_never_clobbers_third_claimant(wh):
    """The ABA edge (ADVICE r13 medium), deterministically interleaved:
    stealer S reads an EXPIRED lock X; new owner B re-creates the lock
    before S's rename; claimant C O_EXCL-creates between S's rename and
    S's put-back.  The r13 rename put-back overwrote C's lock (B and C
    both 'holding'); the link put-back must leave C's lock untouched,
    and B — whose lock S moved aside — must detect the foreign token
    and refuse to commit."""
    s = IndexLock(wh, "idx", timeout_s=1.0)
    x_token = _write_lock(s.path, "some-other-host", 1,
                          ts=time.time() - 100.0, lease_s=1.0)
    x_payload = open(s.path).read()

    b = IndexLock(wh, "idx")
    c = IndexLock(wh, "idx")
    # B re-creates the lock "between S's read and S's rename": on disk
    # NOW, while S's _read is patched to return the stale X it read
    os.unlink(s.path)
    assert b._try_create()
    b._held = True

    real_rename = os.rename

    def rename_then_c_wins(src, dst):
        real_rename(src, dst)
        if src == s.path:  # C's O_EXCL create lands inside the window
            assert c._try_create()
            c._held = True

    real_read = s._read
    stale = json.loads(x_payload)

    def read_stale_once(path):
        if path == s.path and not read_stale_once.done:
            read_stale_once.done = True
            return stale
        return real_read(path)

    read_stale_once.done = False
    with mock.patch.object(s, "_read", side_effect=read_stale_once), \
            mock.patch("os.rename", side_effect=rename_then_c_wins):
        s._steal_if_expired()

    # C's lock survived; B's did not win
    cur = json.load(open(s.path))
    assert cur["token"] == c.token
    assert cur["token"] != x_token
    # no stray aside files leak
    d = os.path.dirname(s.path)
    assert [f for f in os.listdir(d) if ".stale." in f] == []
    # B detects the loss before committing anything
    with pytest.raises(LockLost):
        b.assert_held()
    # C is the single legitimate owner and can release cleanly
    c.__exit__(None, None, None)
    assert not os.path.exists(s.path)


_RACER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from steel_datafusion_spark.sources.locking import IndexLock, log_index_txn

class FakeSpark:
    def __init__(self, wh): self.conf = self; self._wh = wh
    def get(self, key): return self._wh

wh, lane, cycles, crash = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4] == "crash"
spark = FakeSpark(wh)
crit = os.path.join(wh, "critical.log")
for c in range(cycles):
    lk = IndexLock(spark, "stress", timeout_s=120.0, poll_s=0.01, lease_s=2.0)
    with lk:
        if crash:
            # dead-owner injection: vanish while holding the lock —
            # the other racers must steal via the same-host fast path
            os._exit(0)
        with open(crit, "a") as fh:
            fh.write(f"IN {{lane}}-{{c}}\\n".format(lane=lane, c=c))
        time.sleep(0.02)
        log_index_txn(spark, "stress",
                      {{"verb": "cycle", "lane": lane, "c": c}}, lock=lk)
        with open(crit, "a") as fh:
            fh.write(f"OUT {{lane}}-{{c}}\\n".format(lane=lane, c=c))
print("RACER_DONE")
"""


def test_multiprocess_stress_with_forced_steals(tmp_path):
    """4 live racers × 3 cycles each, plus 2 crashers that die INSIDE
    the critical section (forcing dead-owner steals).  Afterwards: the
    critical log shows strict alternation (never two INs in a row ⇒
    single-occupancy), and the txn log is gap-free with exactly one
    record per completed live cycle."""
    whdir = str(tmp_path / "wh")
    os.makedirs(whdir, exist_ok=True)
    spark = _FakeSpark(whdir)
    script = _RACER.format(repo=REPO)
    procs = []
    for lane in range(4):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, whdir, str(lane), "3", "live"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for lane in (90, 91):  # crashers: acquire, then _exit inside
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, whdir, str(lane), "1",
             "crash"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs[:4], outs[:4]):
        assert p.returncode == 0, f"racer failed:\n{out}\n{err[-2000:]}"
        assert "RACER_DONE" in out
    # single-occupancy: IN i must be followed by OUT i before any IN j
    lines = open(os.path.join(whdir, "critical.log")).read().splitlines()
    open_id = None
    for ln in lines:
        kind, ident = ln.split()
        if kind == "IN":
            assert open_id is None, f"overlap: {ident} entered while " \
                                    f"{open_id} inside"
            open_id = ident
        else:
            assert open_id == ident
            open_id = None
    assert open_id is None
    assert sum(1 for ln in lines if ln.startswith("IN ")) == 12
    # txn log: gap-free, one record per completed live cycle
    txns = index_txns(spark, "stress")
    assert [t["version"] for t in txns] == list(range(1, 13))
    seen = {(t["meta"]["lane"], t["meta"]["c"]) for t in txns}
    assert seen == {(lane, c) for lane in range(4) for c in range(3)}
    # a crasher may have died holding the lock LAST (nobody left to
    # steal it) — the next claimant must reclaim it via the dead-pid
    # fast path and the log must stay contiguous
    with IndexLock(spark, "stress", timeout_s=10.0, poll_s=0.01) as lk:
        v = log_index_txn(spark, "stress", {"verb": "after"}, lock=lk)
    assert v == 13
    assert not os.path.exists(os.path.join(whdir, "stress__idxlock"))


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
