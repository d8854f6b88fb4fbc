"""The reference's experimental benchmark, as a PASSING test.

hbase_test.clj:158-191 defines (commented out, `^:experimental`, and
still referencing the SQLite store it was copied from) a concurrent
chunk-write benchmark: 100 chunks x 64,000 random bytes, SHA-1 hex ids,
ref-count in [0,10), `pmap` concurrency, asserting the upper-quantile
write latency stays under 1.0 s (threshold at :185). The reference never
ran it; this engine meets the threshold.

`pmap`'s analog here is a thread pool — chunk writes are single
parquet-file appends with no shared state beyond the directory, so
they need no lock and genuinely overlap.
"""

from __future__ import annotations

import hashlib
import random
import time
from concurrent.futures import ThreadPoolExecutor

N_CHUNKS = 100
PAYLOAD = 64_000
THRESHOLD_S = 1.0  # hbase_test.clj:185


def test_concurrent_chunk_write_upper_quantile_latency(store):
    rng = random.Random(42)
    payloads = [bytes(rng.getrandbits(8) for _ in range(PAYLOAD)) for _ in range(N_CHUNKS)]
    jobs = [
        (hashlib.sha1(p).hexdigest(), rng.randrange(0, 10), p) for p in payloads
    ]
    cs = store.chunk_store()

    def write(job):
        h, refs, data = job
        t0 = time.perf_counter()
        cs.write_chunk(h, refs, data)
        return time.perf_counter() - t0

    with ThreadPoolExecutor(max_workers=16) as pool:
        latencies = sorted(pool.map(write, jobs))

    p95 = latencies[int(0.95 * len(latencies))]
    assert p95 < THRESHOLD_S, f"p95 chunk-write latency {p95:.3f}s >= {THRESHOLD_S}s"
    assert latencies[-1] < THRESHOLD_S  # even the max meets the bar here

    # round-trip: every chunk readable, content-addressing intact
    for h, _, data in jobs[:5]:
        assert cs.read_chunk(h) == data
