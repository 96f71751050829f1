"""Liveness signal (SURVEY.md §2.1 S9, §2.9 X8): the reference's
heartbeat file (consumer.py:40-47) + the dashboard's ONLINE/LAGGING/
OFFLINE classification (main.py:63-84), on Spark's native progress
events instead of a write-per-message."""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener


class HeartbeatListener(StreamingQueryListener):
    """Writes epoch seconds to ``path`` on every micro-batch progress
    event — one write per trigger, not per message."""

    def __init__(self, path: str):
        self.path = path

    def onQueryStarted(self, event) -> None:
        self._touch()

    def onQueryProgress(self, event) -> None:
        self._touch()

    def onQueryIdle(self, event) -> None:
        self._touch()

    def onQueryTerminated(self, event) -> None:
        pass

    def _touch(self) -> None:
        try:
            with open(self.path, "w") as f:
                f.write(str(time.time()))
        except OSError:
            pass


def health_status(path: str, now: float | None = None) -> str:
    """main.py:69-84 parity: ONLINE < 120 s, LAGGING < 600 s, else
    OFFLINE; missing/unreadable heartbeat → OFFLINE."""
    now = time.time() if now is None else now
    try:
        with open(path) as f:
            beat = float(f.read().strip())
    except (OSError, ValueError):
        return "OFFLINE"
    age = now - beat
    if age < 120:
        return "ONLINE"
    if age < 600:
        return "LAGGING"
    return "OFFLINE"
