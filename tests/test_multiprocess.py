"""Concurrent multi-PROCESS writers — the reference's disabled scenario.

The reference ships ``lots-of-processes`` (ordered + misordered) but has
it commented out (hbase_test.clj:134-138; README.md:5 "only some of the
tests are currently passing"). These tests pass here: real OS processes
(separate interpreters via subprocess, nothing shared but the dataset
directory) write slabs to the same variable concurrently.

What the storage design must deliver, per SURVEY.md §3.2/§7:

- commits serialize on the cross-process dataset lock (O_EXCL file),
  version ids stay strictly monotonic;
- every committed write is atomic: chunks -> index -> version append,
  visible only after the version row lands;
- overlapping writers linearize: the final array equals a driver-side
  numpy replay of the updates in VERSION ORDER, and reads at any
  intermediate bound equal the replay prefix (snapshot semantics of
  find-index, hbase.clj:184-198).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, sys
import numpy as np
from mandoline_hbase_spark.engine import mk_schema

base_path, proc, n_updates, mode = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
conn = mk_schema({"root": "mp.mandoline.io", "base_path": base_path}).connect("mp-ds")
out = []
for i in range(n_updates):
    value = proc * 1000.0 + i
    if mode == "disjoint":
        offset, shape = (proc * 8, 0), (8, 32)
    else:  # overlapping 16x16 windows sliding with proc and step
        offset = ((proc * 4 + i * 4) % 16, (proc * 8 + i * 4) % 16)
        shape = (16, 16)
    vid = conn.update_region("x", np.full(shape, value), offset)
    out.append({"version": vid, "offset": offset, "shape": shape, "value": value})
print(json.dumps(out))
"""


def _run_workers(base_path: str, n_procs: int, n_updates: int, mode: str):
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, base_path, str(p), str(n_updates), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for p in range(n_procs)
    ]
    updates = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err
        updates.extend(json.loads(out.strip().splitlines()[-1]))
    return updates


def _mk_store(tmp_path):
    from mandoline_hbase_spark.engine import mk_schema

    schema = mk_schema({"root": "mp.mandoline.io", "base_path": str(tmp_path)})
    schema.create_dataset("mp-ds")
    conn = schema.connect("mp-ds")
    conn.create_variable("x", (32, 32), dtype="float64", chunk_shape=(8, 8), fill=0.0)
    return conn


def _replay(updates, upto=None):
    arr = np.zeros((32, 32), dtype=np.float64)
    for u in sorted(updates, key=lambda u: u["version"]):
        if upto is not None and u["version"] > upto:
            break
        (r, c), (h, w) = u["offset"], u["shape"]
        arr[r : r + h, c : c + w] = u["value"]
    return arr


def test_lots_of_processes_disjoint(tmp_path):
    conn = _mk_store(tmp_path)
    updates = _run_workers(str(tmp_path), n_procs=4, n_updates=3, mode="disjoint")

    vids = sorted(u["version"] for u in updates)
    assert len(vids) == 12 and len(set(vids)) == 12  # every commit distinct
    committed = [int(v["version"]) for v in conn.versions()]
    assert set(vids) <= set(committed)
    assert committed == sorted(committed, reverse=True)  # newest-first, linear

    # each process's band holds that process's LAST value
    final = conn.read_variable("x")
    for p in range(4):
        assert (final[p * 8 : p * 8 + 8, :] == p * 1000.0 + 2).all()


def test_lots_of_processes_overlapping_linearizes(tmp_path):
    conn = _mk_store(tmp_path)
    updates = _run_workers(str(tmp_path), n_procs=4, n_updates=4, mode="overlap")
    assert len({u["version"] for u in updates}) == 16

    # final state == numpy replay in version order (single linear history)
    assert np.array_equal(conn.read_variable("x"), _replay(updates))

    # snapshot reads at intermediate bounds == replay prefixes
    vids = sorted(u["version"] for u in updates)
    for bound in (vids[3], vids[8], vids[12]):
        assert np.array_equal(
            conn.read_variable("x", version=bound), _replay(updates, upto=bound)
        ), f"snapshot at {bound} diverges from linear replay"
