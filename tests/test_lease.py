"""Maintenance lease (lease.py): single-compactor enforcement over the
CAS seam — the check-and-put contract (hbase.clj:241-248) applied to
index maintenance, per VERDICT r5 #4. Exactly one of two concurrent
compactors may proceed; reads stay correct throughout."""

from __future__ import annotations

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from mandoline_hbase_spark import storage
from mandoline_hbase_spark.errors import LeaseHeldError
from mandoline_hbase_spark.lease import lease_holder, maintenance_lease
from mandoline_hbase_spark.streaming import ann as sann
from mandoline_hbase_spark.streaming import search as ssearch


def _backdate(path: str, seconds: float) -> None:
    """Age a lease file on the STORE's clock (st_mtime): staleness now
    derives from backend-side metadata, not the holder-written
    timestamp, so simulating a long-crashed owner means backdating the
    object itself — a payload that merely CLAIMS to be old is fresh."""
    old = time.time() - seconds
    os.utime(path, (old, old))


def test_acquire_release_cycle(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    assert lease_holder(d) is None
    with maintenance_lease(d, owner="me") as who:
        assert who == "me"
        assert lease_holder(d)["owner"] == "me"
        assert os.path.exists(os.path.join(d, ".compaction.lease"))
    assert lease_holder(d) is None  # released
    with maintenance_lease(d):  # re-acquirable
        pass


def test_lease_never_fabricates_the_index_dir(tmp_path):
    from mandoline_hbase_spark.errors import StorageError

    d = str(tmp_path / "no-such-idx")
    with pytest.raises(StorageError, match="does not exist"):
        with maintenance_lease(d):
            pass
    assert not os.path.exists(d)  # no side-effect directory


def test_second_acquirer_raises_and_release_on_exception(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    with maintenance_lease(d, owner="a"):
        with pytest.raises(LeaseHeldError, match="held by a"):
            with maintenance_lease(d, owner="b"):
                pass
    # a body that raises still releases (finally)
    with pytest.raises(RuntimeError, match="boom"):
        with maintenance_lease(d, owner="c"):
            raise RuntimeError("boom")
    assert lease_holder(d) is None


def test_stale_lease_break_and_fresh_lease_respected(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    # a hard-crashed owner's leftover lease, acquired long ago
    storage.cas_backend_for(d).put(
        os.path.join(d, ".compaction.lease"),
        json.dumps({"owner": "crashed", "acquired_at_unix": time.time() - 9999}).encode(),
    )
    _backdate(os.path.join(d, ".compaction.lease"), 9999)
    # without steal: respected
    with pytest.raises(LeaseHeldError):
        with maintenance_lease(d, owner="b"):
            pass
    # with steal threshold below its age: broken and reclaimed
    with maintenance_lease(d, owner="b", steal_stale_after_s=60) as who:
        assert lease_holder(d)["owner"] == "b" == who
    # a FRESH lease is never stolen even with the threshold set
    with maintenance_lease(d, owner="c"):
        with pytest.raises(LeaseHeldError):
            with maintenance_lease(d, owner="d", steal_stale_after_s=60):
                pass


def test_unparseable_lease_is_stale_with_threshold_respected_without(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    storage.cas_backend_for(d).put(path, b"\x00torn-not-json")
    # no threshold: fail safe — respected
    with pytest.raises(LeaseHeldError, match="unparseable"):
        with maintenance_lease(d, owner="b"):
            pass
    # a FRESH corrupt payload is still respected with a threshold: the
    # STORE's mtime vouches for its age even when the payload cannot
    with pytest.raises(LeaseHeldError, match="unparseable"):
        with maintenance_lease(d, owner="b", steal_stale_after_s=3600):
            pass
    # once the object itself is old on the store's clock it is stale —
    # maintenance must not wedge forever on a corrupt lease
    _backdate(path, 9999)
    with maintenance_lease(d, owner="b", steal_stale_after_s=3600) as who:
        assert who == "b" and lease_holder(d)["owner"] == "b"
    assert lease_holder(d) is None


@pytest.mark.parametrize(
    "payload",
    [
        b"null",  # valid JSON, not an object
        b"42",
        b'{"owner": "z"}',  # object, no timestamp
        b'{"owner": "z", "acquired_at_unix": "123"}',  # non-numeric ts
        b'{"owner": "z", "acquired_at_unix": true}',  # bool is not an age
    ],
)
def test_age_unvouchable_payloads_steal_with_threshold_respect_without(
    tmp_path, payload
):
    """Any payload that cannot vouch for its own age behaves exactly
    like unparseable bytes: respected without a threshold (raise, never
    crash), stale with one (maintenance must not wedge forever)."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    storage.cas_backend_for(d).put(path, payload)
    with pytest.raises(LeaseHeldError):  # not AttributeError/TypeError
        with maintenance_lease(d, owner="b"):
            pass
    _backdate(path, 9999)  # stale on the store's clock
    with maintenance_lease(d, owner="b", steal_stale_after_s=3600) as who:
        assert who == "b" and lease_holder(d)["owner"] == "b"
    assert lease_holder(d) is None


def test_lease_in_pure_object_store_mode_needs_no_local_dir(tmp_path):
    """With a registered bucket-only backend (no local mirror) the
    bucket is the only truth: the local-directory existence guard must
    not apply, or no maintainer could ever take the lease."""
    from mandoline_hbase_spark.storage import (
        InMemoryCasBackend,
        register_cas_backend,
        unregister_cas_backend,
    )

    prefix = str(tmp_path / "bucket-only-idx")  # never created locally
    register_cas_backend(prefix, InMemoryCasBackend(write_through=False))
    try:
        with maintenance_lease(prefix, owner="cloud") as who:
            assert who == "cloud"
            assert lease_holder(prefix)["owner"] == "cloud"
        assert lease_holder(prefix) is None
        assert not os.path.exists(prefix)  # still no local side effects
    finally:
        unregister_cas_backend(prefix)


def test_usurped_owner_does_not_delete_usurpers_lease(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    backend = storage.cas_backend_for(d)
    lease_cm = maintenance_lease(d, owner="slowpoke")
    lease_cm.__enter__()
    # a rival breaks the (simulated-stale) lease while slowpoke runs
    backend.delete(path)
    backend.put(
        path,
        json.dumps({"owner": "usurper", "acquired_at_unix": time.time()}).encode(),
    )
    # slowpoke's release must NOT remove the usurper's lease
    lease_cm.__exit__(None, None, None)
    assert lease_holder(d)["owner"] == "usurper"
    backend.delete(path)


def test_stale_break_leaves_exactly_our_payload(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    storage.cas_backend_for(d).put(
        path,
        json.dumps({"owner": "crashed", "acquired_at_unix": time.time() - 9999}).encode(),
    )
    _backdate(path, 9999)
    with maintenance_lease(d, owner="winner", steal_stale_after_s=60):
        h = lease_holder(d)
        assert h["owner"] == "winner"  # conditional claim won: our payload stored


class _InterleavingBackend:
    """Delegates to the real local backend but fires ``on_cad`` ONCE
    immediately before the first ``compare_and_delete`` — injecting a
    rival's actions into exactly the window where the pre-round-7
    get-then-delete code could destroy a fresh lease."""

    def __init__(self, inner, on_cad):
        self._inner = inner
        self._on_cad = on_cad
        self._fired = False

    def compare_and_delete(self, path, expected):
        if not self._fired:
            self._fired = True
            self._on_cad()
        return self._inner.compare_and_delete(path, expected)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_stale_break_racing_a_rival_break_never_deletes_the_fresh_lease(tmp_path):
    """VERDICT r6 #1 done-criterion: a breaker observes the stale
    payload, a RIVAL breaks-and-claims in the window before the
    breaker's delete — the conditional DELETE answers false against the
    rival's fresh payload, the breaker loses the reclaim, and the
    rival's live lease survives untouched."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    inner = storage.LocalFSCasBackend()
    inner.put(path, json.dumps({"owner": "crashed", "acquired_at_unix": 1.0}).encode())
    _backdate(path, 9999)

    rival_payload = json.dumps({"owner": "rival", "acquired_at_unix": time.time()}).encode()

    def rival_breaks_and_claims():
        # the rival completes its own stale-break first
        assert inner.compare_and_delete(path, inner.get(path))
        assert inner.put_if_absent(path, rival_payload)

    storage.register_cas_backend(d, _InterleavingBackend(inner, rival_breaks_and_claims))
    try:
        with pytest.raises(LeaseHeldError, match="reclaim race"):
            with maintenance_lease(d, owner="late-breaker", steal_stale_after_s=60):
                pass
        assert inner.get(path) == rival_payload  # fresh lease intact
    finally:
        storage.unregister_cas_backend(d)
        inner.delete(path)


def test_release_racing_a_steal_never_deletes_the_usurpers_lease(tmp_path):
    """The release-path twin: a rival steals between the owner's exit
    and its delete — the conditional DELETE (If-Match on the owner's
    own payload) answers false and the usurper's lease survives."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    inner = storage.LocalFSCasBackend()
    usurper_payload = json.dumps({"owner": "usurper", "acquired_at_unix": time.time()}).encode()

    def rival_steals():
        assert inner.compare_and_delete(path, inner.get(path))
        assert inner.put_if_absent(path, usurper_payload)

    storage.register_cas_backend(d, _InterleavingBackend(inner, rival_steals))
    try:
        with maintenance_lease(d, owner="slowpoke"):
            pass  # the hook fires inside the release's compare_and_delete
        assert inner.get(path) == usurper_payload  # usurper survived the release
    finally:
        storage.unregister_cas_backend(d)
        inner.delete(path)


class _UnfencedBackend:
    """A third-party-style backend WITHOUT ``compare_and_delete`` —
    only the base ops, explicitly (no ``__getattr__``, which would leak
    the inner backend's fenced method). ``on_claim`` fires once right
    after a successful ``put_if_absent``: exactly the window where a
    rival breaker's unconditional fallback delete can remove our fresh
    claim before its own."""

    def __init__(self, inner, on_claim=None):
        self._inner, self._on_claim, self._fired = inner, on_claim, False

    def get(self, path):
        return self._inner.get(path)

    def put(self, path, data):
        return self._inner.put(path, data)

    def delete(self, path):
        return self._inner.delete(path)

    def mtime(self, path):
        return self._inner.mtime(path)

    def put_if_absent(self, path, data):
        ok = self._inner.put_if_absent(path, data)
        if ok and not self._fired and self._on_claim is not None:
            self._fired = True
            self._on_claim()
        return ok


def test_unfenced_backend_stale_break_read_back_cedes_to_rival(tmp_path):
    """ADVICE r7: on a backend lacking compare_and_delete the break is
    an unfenced get-then-delete — a rival's delete landing AFTER our
    claim removes our fresh lease before its own claim, so both
    breakers would believe they won. The post-claim read-back must make
    us cede in this interleaving (rival's lease intact). The window is
    NARROWED, not closed — a rival delete landing after the read-back
    still double-holds; only a fenced backend closes it."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    inner = storage.LocalFSCasBackend()
    inner.put(path, json.dumps({"owner": "crashed", "acquired_at_unix": 1.0}).encode())
    _backdate(path, 9999)
    rival_payload = json.dumps({"owner": "rival", "acquired_at_unix": time.time()}).encode()

    def rival_delete_then_claim():
        # the rival breaker's fallback delete (it observed the same
        # stale payload before we broke it) lands after OUR claim
        inner.delete(path)
        assert inner.put_if_absent(path, rival_payload)

    storage.register_cas_backend(d, _UnfencedBackend(inner, rival_delete_then_claim))
    try:
        with pytest.raises(LeaseHeldError, match="rival breaker"):
            with maintenance_lease(d, owner="loser", steal_stale_after_s=60):
                pass
        assert inner.get(path) == rival_payload  # the rival's lease survives
    finally:
        storage.unregister_cas_backend(d)
        inner.delete(path)


def test_unfenced_backend_stale_break_without_rival_succeeds(tmp_path):
    """The read-back must not break the solo case: a single breaker on
    an unfenced backend steals the stale lease and holds it."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    inner = storage.LocalFSCasBackend()
    inner.put(path, json.dumps({"owner": "crashed", "acquired_at_unix": 1.0}).encode())
    _backdate(path, 9999)
    storage.register_cas_backend(d, _UnfencedBackend(inner))
    try:
        with maintenance_lease(d, owner="solo", steal_stale_after_s=60):
            assert lease_holder(d)["owner"] == "solo"
        assert inner.get(path) is None  # released (unfenced fallback)
    finally:
        storage.unregister_cas_backend(d)


def test_concurrent_stale_breakers_exactly_one_wins(tmp_path):
    """Many breakers race the SAME stale lease concurrently: the fenced
    conditional delete + conditional claim admit exactly one winner;
    every loser raises LeaseHeldError and the winner's lease is never
    deleted out from under it."""
    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    storage.cas_backend_for(d).put(
        path, json.dumps({"owner": "crashed", "acquired_at_unix": 1.0}).encode()
    )
    _backdate(path, 9999)
    barrier = threading.Barrier(8)
    wins, losses = [], []

    def contend(i):
        barrier.wait()
        try:
            with maintenance_lease(d, owner=f"b{i}", steal_stale_after_s=60):
                wins.append(i)
                # while held, the winner's lease must remain its own
                assert lease_holder(d)["owner"] == f"b{i}"
                time.sleep(0.2)  # hold across every rival's full attempt
        except LeaseHeldError:
            losses.append(i)

    ts = [threading.Thread(target=contend, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    assert lease_holder(d) is None  # the winner released cleanly


def test_concurrent_acquirers_exactly_one_wins(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    barrier = threading.Barrier(8)
    wins, losses = [], []

    def contend(i):
        barrier.wait()
        try:
            with maintenance_lease(d, owner=f"t{i}"):
                wins.append(i)
                time.sleep(0.05)  # hold it across the others' attempts
        except LeaseHeldError:
            losses.append(i)

    ts = [threading.Thread(target=contend, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    assert lease_holder(d) is None


DDL = "doc_id bigint, text string"


def test_two_concurrent_compactors_one_wins_reads_correct(spark, tmp_path):
    """VERDICT r5 #4's done-criterion: two concurrent compactors on the
    same postings index — exactly one proceeds, the loser raises
    LeaseHeldError, and the index content is intact afterwards."""
    index_dir = str(tmp_path / "pidx")
    for i, text in enumerate(["apple banana", "banana cherry", "apple apple"]):
        ssearch.append_index_batch(
            spark.createDataFrame([(i, text)], DDL), i, index_dir
        )
    tf0, dl0 = ssearch.read_index(spark, index_dir)
    want_tf = {tuple(r) for r in tf0.collect()}
    want_dl = {tuple(r) for r in dl0.collect()}

    started = threading.Event()
    blocker_err = []

    def hold_and_compact():
        # this thread takes the lease first and compacts while holding it
        try:
            with maintenance_lease(index_dir, owner="winner"):
                started.set()
                time.sleep(0.3)  # window where the rival must lose
            # after release, the real compaction runs uncontended
            ssearch.compact_index(spark, index_dir)
        except Exception as exc:  # pragma: no cover - surfaced below
            blocker_err.append(exc)
            started.set()

    t = threading.Thread(target=hold_and_compact)
    t.start()
    started.wait(5)
    with pytest.raises(LeaseHeldError):
        ssearch.compact_index(spark, index_dir)
    t.join()
    assert not blocker_err
    tf1, dl1 = ssearch.read_index(spark, index_dir)
    assert {tuple(r) for r in tf1.collect()} == want_tf
    assert {tuple(r) for r in dl1.collect()} == want_dl
    # the winner compacted: one consolidated dir per role
    for role in ("tf", "dl"):
        dirs = [e.name for e in os.scandir(os.path.join(index_dir, role)) if e.is_dir()]
        assert dirs == ["batch-compacted-001"]
    assert lease_holder(index_dir) is None


def test_ann_compactor_respects_lease(spark, tmp_path):
    index_dir = str(tmp_path / "aidx")
    sann.init_ann_index(index_dir, dim=4, n_centroids=2)
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(6)],
        "vec_id bigint, embedding array<double>",
    )
    sann.append_ann_batch(vecs.filter(F.col("vec_id") < 3), 0, index_dir)
    sann.append_ann_batch(vecs.filter(F.col("vec_id") >= 3), 1, index_dir)
    with maintenance_lease(index_dir, owner="rival"):
        with pytest.raises(LeaseHeldError):
            sann.compact_ann_index(spark, index_dir)
    # nothing was touched while blocked
    names = sorted(
        e.name for e in os.scandir(os.path.join(index_dir, "cells")) if e.is_dir()
    )
    assert names == ["batch-0000000000", "batch-0000000001"]
    assert sann.compact_ann_index(spark, index_dir) == 1  # uncontended run
    assert lease_holder(index_dir) is None


def test_lease_over_s3_backend_stale_break_uses_bucket_clock(tmp_path):
    """The lease's full cycle through the S3 adapter: conditional
    claim, respect-fresh, stale break judged by the BUCKET's
    LastModified (not the holder-written timestamp), and a fenced
    conditional-delete release."""
    from mandoline_hbase_spark.objectstore import FakeS3Client, S3CasBackend

    d = str(tmp_path / "bucket-idx")  # never created locally
    store = str(tmp_path / "_bucket")
    backend = S3CasBackend(
        "b", FakeS3Client(store), root=str(tmp_path), mirror_to_fs=False
    )
    storage.register_cas_backend(str(tmp_path), backend)
    try:
        path = os.path.join(d, ".compaction.lease")
        # a crashed owner's lease whose PAYLOAD claims to be ancient but
        # whose OBJECT is fresh on the bucket clock: respected
        backend.put(
            path,
            json.dumps({"owner": "crashed", "acquired_at_unix": 1.0}).encode(),
        )
        with pytest.raises(LeaseHeldError):
            with maintenance_lease(d, owner="b", steal_stale_after_s=60):
                pass
        # age the OBJECT in the fake bucket -> now stealable
        key = os.path.relpath(path, str(tmp_path))
        obj = os.path.join(store, *key.split(os.sep))
        old = time.time() - 9999
        os.utime(obj, (old, old))
        with maintenance_lease(d, owner="winner", steal_stale_after_s=60) as who:
            assert who == "winner"
            assert lease_holder(d)["owner"] == "winner"
        assert lease_holder(d) is None  # fenced release removed it
    finally:
        storage.unregister_cas_backend(str(tmp_path))


_BREAKER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[4])
from mandoline_hbase_spark.errors import LeaseHeldError
from mandoline_hbase_spark.lease import maintenance_lease

d, who, barrier_dir = sys.argv[1], sys.argv[2], sys.argv[3]
# file barrier: no attempt starts until every interpreter is up, so a
# fast starter cannot win-and-release before a slow one even tries
open(os.path.join(barrier_dir, who), "w").close()
deadline = time.time() + 60
while len(os.listdir(barrier_dir)) < 6:
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.01)
try:
    with maintenance_lease(d, owner=who, steal_stale_after_s=60):
        time.sleep(1.0)  # hold across every rival's full attempt
        print(json.dumps({"owner": who, "won": True}))
except LeaseHeldError:
    print(json.dumps({"owner": who, "won": False}))
"""


def test_cross_process_stale_breakers_exactly_one_wins(tmp_path):
    """The conditional-delete fence is flock-based — prove it across OS
    PROCESSES (threads share the GIL and an interpreter; flock's
    guarantees are per-fd and must hold between interpreters): six
    processes race the same backdated stale lease, exactly one wins."""
    import subprocess
    import sys as _sys

    d = str(tmp_path / "idx")
    os.makedirs(d)
    path = os.path.join(d, ".compaction.lease")
    storage.cas_backend_for(d).put(
        path, json.dumps({"owner": "crashed", "acquired_at_unix": 1.0}).encode()
    )
    _backdate(path, 9999)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    barrier_dir = str(tmp_path / "barrier")
    os.makedirs(barrier_dir)
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _BREAKER, d, f"p{i}", barrier_dir, repo],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(6)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err[-500:]
        results.append(json.loads(out.strip().splitlines()[-1]))
    winners = [r["owner"] for r in results if r["won"]]
    assert len(winners) == 1, results
    assert lease_holder(d) is None  # the winner released cleanly
