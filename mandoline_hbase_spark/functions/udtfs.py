"""Python user-defined table functions (Spark 4 UDTF surface).

UDTFs close the last expressiveness gap in the SQL front door: a table
function invoked as ``FROM f(TABLE(t) PARTITION BY k ORDER BY o)``
receives each partition's rows IN ORDER through one class instance —
per-group sequential logic (state machines, custom sessionization,
legacy parsers) written in Python yet callable from plain SQL.

They are the SLOW path by design: row-at-a-time Python. Everything this
engine ships in the hot path is JVM expressions or Arrow-batched
(pandas/arrow) operators; use a UDTF only when the logic is genuinely
sequential/stateful AND must be callable from SQL by non-Python users.
The test suite pins the semantics by proving the sessionizer UDTF
matches the engine's window-based (JVM) sessionization exactly.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="user_id bigint, event_id bigint, session_seq int")
class SessionizeUDTF:
    """Gap-based sessionizer: consumes one user's events in time order
    (``PARTITION BY user_id ORDER BY ts, event_id``) and numbers each
    user's sessions 1..n — a new session starts when the gap from the
    previous event exceeds ``gap_seconds``.

    SQL:
        SELECT * FROM sessionize_udtf(
            TABLE(events) PARTITION BY user_id ORDER BY (ts, event_id),
            1800
        )
    """

    def __init__(self):
        self._user = None
        self._last_ts = None
        self._seq = 0

    def eval(self, row, gap_seconds: int = 1800):
        user = row["user_id"]
        ts = row["ts"]
        if user != self._user:
            # defensive: Spark gives one instance per partition key, but
            # resetting on key change keeps the logic correct either way
            self._user = user
            self._last_ts = None
            self._seq = 0
        if self._last_ts is None or (ts - self._last_ts).total_seconds() > gap_seconds:
            self._seq += 1
        self._last_ts = ts
        yield user, row["event_id"], self._seq


def register_udtfs(spark) -> None:
    """Expose the UDTF surface to SQL users on this session."""
    spark.udtf.register("sessionize_udtf", SessionizeUDTF)
