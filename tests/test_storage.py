"""Storage-seam tests (sources/storage.py): the three atomic
primitives every coordination protocol here relies on — exclusive
create, atomic rename, link-claim — behave identically on the POSIX
backend and the in-memory conditional-PUT fake, and the full IndexLock
acquire/steal/ABA state machine runs unmodified over the fake.  That
is the object-store portability argument made executable: porting to
S3-class storage means implementing this interface over conditional
PUT, not re-deriving the protocols (VERDICT r13 item 6)."""

import json
import time

import pytest

from steel_datafusion_spark.sources.locking import (
    IndexLock, LockLost, LockTimeout,
)
from steel_datafusion_spark.sources.storage import (
    MemoryBackend, PosixBackend,
)


class _FakeSpark:
    def __init__(self, warehouse: str):
        self.conf = self
        self._wh = warehouse

    def get(self, key):
        return self._wh


@pytest.fixture(params=["posix", "memory"])
def backend(request, tmp_path):
    if request.param == "posix":
        return PosixBackend(), str(tmp_path / "wh")
    return MemoryBackend(), "/mem/wh"


def test_primitive_contract(backend):
    """Exclusive create and link-claim fail on an existing name; rename
    moves atomically and replaces; read/unlink round-trip — the exact
    contract both backends must share."""
    fs, root = backend
    a, b, c = f"{root}/a", f"{root}/b", f"{root}/c"
    assert fs.create_exclusive(a, b"one")
    assert not fs.create_exclusive(a, b"two")  # conditional PUT
    assert fs.read(a) == b"one"
    assert fs.create_exclusive(b, b"claimed")
    assert not fs.link_claim(a, b)             # dst exists: claim fails
    assert fs.read(b) == b"claimed"
    assert fs.link_claim(a, c)                 # dst absent: claim wins
    assert fs.read(c) == b"one"
    assert fs.rename(b, c)                     # rename replaces
    assert fs.read(c) == b"claimed"
    assert not fs.exists(b)
    assert not fs.rename(b, c)                 # vanished src
    assert fs.unlink(a) and not fs.unlink(a)
    assert fs.read(a) is None


def test_lock_protocol_runs_on_memory_backend():
    """Acquire, contend, expire, steal, release — the lock state
    machine over the conditional-PUT fake, no filesystem involved."""
    fs = MemoryBackend()
    spark = _FakeSpark("/mem/wh")
    owner = IndexLock(spark, "idx", lease_s=0.5, backend=fs)
    waiter = IndexLock(spark, "idx", timeout_s=0.6, poll_s=0.02,
                       backend=fs)
    with owner:
        assert fs.exists(owner.path)
        with pytest.raises(LockTimeout):
            with waiter:
                pass
    assert not fs.exists(owner.path)
    # expired remote lease on the fake store: stolen
    fs.create_exclusive(owner.path, json.dumps(
        {"host": "other", "pid": 1, "ts": time.time() - 100,
         "token": "x", "lease_s": 1.0}).encode())
    taker = IndexLock(spark, "idx", timeout_s=5.0, poll_s=0.02,
                      backend=fs)
    with taker:
        assert json.loads(fs.read(taker.path))["token"] == taker.token


def test_aba_putback_never_clobbers_on_memory_backend():
    """The steal ABA edge exercised purely over backend primitives:
    stealer S reads expired X, B re-creates before S's rename, C claims
    between S's rename and S's put-back — C's lock survives, B detects
    the foreign token and fails loudly."""
    from unittest import mock

    fs = MemoryBackend()
    spark = _FakeSpark("/mem/wh")
    s = IndexLock(spark, "idx", backend=fs)
    stale = {"host": "other", "pid": 1, "ts": time.time() - 100,
             "token": "x-token", "lease_s": 1.0}
    b = IndexLock(spark, "idx", backend=fs)
    c = IndexLock(spark, "idx", backend=fs)
    assert b._try_create()          # B holds the live lock on-store
    b._held = True

    real_rename = fs.rename

    def rename_then_c_claims(src, dst):
        ok = real_rename(src, dst)
        if ok and src == s.path:
            assert c._try_create()  # C lands inside the window
            c._held = True
        return ok

    real_read = s._read

    def read_stale_once(path):
        if path == s.path and not read_stale_once.done:
            read_stale_once.done = True
            return dict(stale)
        return real_read(path)

    read_stale_once.done = False
    with mock.patch.object(fs, "rename",
                           side_effect=rename_then_c_claims), \
            mock.patch.object(s, "_read", side_effect=read_stale_once):
        s._steal_if_expired()

    cur = json.loads(fs.read(s.path))
    assert cur["token"] == c.token          # C's claim intact
    # no aside keys leak
    assert not [p for p in fs._files if ".stale." in p]
    with pytest.raises(LockLost):
        b.assert_held()
    c.__exit__(None, None, None)
    assert not fs.exists(s.path)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
