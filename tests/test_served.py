"""The shared served-artifact lifecycle (operators/served.py): the
content-fingerprint → scratch-build → atomic-rename-claim → quarantine
protocol both served queries (sim_ivf_served_topk, bm25_served_topk)
delegate to. Spark-free — the protocol is pure filesystem."""

from __future__ import annotations

import os

import pytest

from mandoline_hbase_spark.operators.served import (
    content_fingerprint,
    served_artifact,
)


def _writer(payload: str, calls: list):
    def build(work: str) -> None:
        calls.append(work)
        with open(os.path.join(work, "data"), "w") as f:
            f.write(payload)

    return build


def test_build_once_then_serve(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-resolve gettempdir() from TMPDIR
    try:
        calls = []
        fp = content_fingerprint(str(tmp_path / "absent-src"), {"k": 1})
        d1 = served_artifact("t-serve", fp, _writer("x", calls))
        d2 = served_artifact("t-serve", fp, _writer("x", calls))
        assert d1 == d2 and len(calls) == 1  # second call served, not rebuilt
        assert os.path.exists(os.path.join(d1, "_built"))  # marker stamped
        assert open(os.path.join(d1, "data")).read() == "x"
    finally:
        tempfile.tempdir = None


def test_fingerprint_splits_on_params_and_content(tmp_path):
    src = tmp_path / "corpus.parquet"
    src.write_bytes(b"v1")
    a = content_fingerprint(str(src), {"k": 1})
    assert a == content_fingerprint(str(src), {"k": 1})
    assert a != content_fingerprint(str(src), {"k": 2})  # param edit
    os.utime(src, ns=(1, 1))
    assert a != content_fingerprint(str(src), {"k": 1})  # content stamp


def test_custom_marker_written_by_build(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        def build(work):
            open(os.path.join(work, "codebook.json"), "w").close()

        d = served_artifact("t-marker", "fp-m", build, marker="codebook.json")
        assert os.path.exists(os.path.join(d, "codebook.json"))
        assert not os.path.exists(os.path.join(d, "_built"))  # no double marker
    finally:
        tempfile.tempdir = None


def test_missing_marker_after_build_is_stamped_not_fatal(tmp_path, monkeypatch):
    # default-marker builds don't create their own sentinel; the helper
    # stamps it so the rename claim implies artifact-complete
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        d = served_artifact("t-stamp", "fp-s", lambda w: None)
        assert os.path.exists(os.path.join(d, "_built"))
    finally:
        tempfile.tempdir = None


def test_crashed_partial_squatter_is_quarantined_never_deleted(
    tmp_path, monkeypatch
):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        import hashlib

        tag = hashlib.md5(b"fp-q").hexdigest()[:16]
        final = tmp_path / f"t-quar-{tag}"
        final.mkdir()
        (final / "partial-data").write_text("crashed build's leftovers")
        calls = []
        d = served_artifact("t-quar", "fp-q", _writer("good", calls))
        # canonical slot healed with the fresh build
        assert d == str(final) and open(final / "data").read() == "good"
        # the squatter survives, renamed aside — never rmtree'd
        quars = [p for p in tmp_path.iterdir() if ".quarantine-" in p.name]
        assert len(quars) == 1
        assert (quars[0] / "partial-data").read_text() == "crashed build's leftovers"
    finally:
        tempfile.tempdir = None


def test_total_race_loss_serves_scratch(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        real_rename = os.rename

        def deny(src, dst):
            raise OSError("simulated lost race")

        monkeypatch.setattr(os, "rename", deny)
        d = served_artifact("t-lost", "fp-l", _writer("scratch", []))
        monkeypatch.setattr(os, "rename", real_rename)
        # loser serves its own complete scratch build
        assert "t-lost-build-" in os.path.basename(d)
        assert open(os.path.join(d, "data")).read() == "scratch"
        assert os.path.exists(os.path.join(d, "_built"))
    finally:
        tempfile.tempdir = None


def test_loser_adopts_winners_artifact(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        import hashlib

        tag = hashlib.md5(b"fp-w").hexdigest()[:16]
        final = str(tmp_path / f"t-win-{tag}")
        real_rename = os.rename

        def racing_rename(src, dst):
            if dst == final and not os.path.exists(os.path.join(final, "_built")):
                # the "winner" lands a complete artifact first
                os.makedirs(final)
                with open(os.path.join(final, "data"), "w") as f:
                    f.write("winner")
                open(os.path.join(final, "_built"), "w").close()
                raise OSError(39, "directory not empty")
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", racing_rename)
        d = served_artifact("t-win", "fp-w", _writer("loser", []))
        assert d == final
        assert open(os.path.join(d, "data")).read() == "winner"
    finally:
        tempfile.tempdir = None


def test_sweep_removes_only_stale_debris(tmp_path, monkeypatch):
    """ADVICE r6: quarantined squatters and abandoned scratch dirs
    accumulate in tempdir; the sweep removes only the OLD ones (a
    fresh quarantine may still be serving a pre-heal reader, a fresh
    scratch may belong to a live builder) and never a canonical
    ready slot."""
    import time

    from mandoline_hbase_spark.operators.served import sweep_stale_artifacts

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        old = time.time() - 7200
        stale_q = tmp_path / "t-sw-abc.quarantine-deadbeef"
        stale_b = tmp_path / "t-sw-build-xyz"
        fresh_q = tmp_path / "t-sw-def.quarantine-cafebabe"
        ready = tmp_path / "t-sw-0123456789abcdef"
        other = tmp_path / "unrelated-build-1"
        for d in (stale_q, stale_b, fresh_q, ready, other):
            d.mkdir()
        (ready / "_built").write_text("")
        for d in (stale_q, stale_b, ready, other):
            os.utime(d, (old, old))

        removed = sweep_stale_artifacts("t-sw", max_age_s=3600)
        assert sorted(os.path.basename(p) for p in removed) == [
            "t-sw-abc.quarantine-deadbeef",
            "t-sw-build-xyz",
        ]
        assert fresh_q.is_dir()  # too fresh to touch
        assert ready.is_dir() and other.is_dir()  # never in scope
    finally:
        tempfile.tempdir = None


def test_quarantine_names_are_unique_within_a_process(tmp_path, monkeypatch):
    """Two heals in the same process (same pid) must both succeed: the
    quarantine suffix is a uuid, not the pid."""
    import hashlib

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None
    try:
        for round_ in range(2):
            tag = hashlib.md5(b"fp-uu").hexdigest()[:16]
            final = tmp_path / f"t-uu-{tag}"
            final.mkdir(exist_ok=True)
            marker = final / "_built"
            if marker.exists():
                marker.unlink()  # simulate a NEW crashed squatter each round
            (final / "partial").write_text(f"crash-{round_}")
            d = served_artifact("t-uu", "fp-uu", _writer(f"good-{round_}", []))
            assert d == str(final)
        quars = [p for p in tmp_path.iterdir() if ".quarantine-" in p.name]
        assert len(quars) == 2  # both heals landed under distinct names
    finally:
        tempfile.tempdir = None
