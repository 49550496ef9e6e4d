"""Message-log record and playback over the pub/sub transport.

The reference records LCM traffic with DrakeLcmLog (lcm/drake_lcm_log.h —
write mode timestamps each publish; read mode replays by timestamp) and
replays it into a simulation via LcmLogPlaybackSystem
(systems/lcm/lcm_log_playback_system.h).  Same roles here, over the native
pub/sub transport (drake_tpu/io/pubsub.py):

  - ``MessageLog`` — append-only binary log of (t, channel, payload)
    records; write mode wraps a PubSub node and tees every publish; read
    mode iterates records in timestamp order.
  - ``playback`` — replays a log into a PubSub node, mapping log time to a
    simulation clock (the LcmLogPlaybackSystem role, minus the wall-clock
    pacing: simulation-stepped replay is the deterministic TPU-side need).

Log format (little-endian, per record):
    f64 timestamp | u32 channel_len | u32 payload_len | channel | payload
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

_HEADER = struct.Struct("<dII")
_MAGIC = b"DTPULOG1"


class MessageLog:
    """Record/playback log of pub/sub messages (DrakeLcmLog role)."""

    def __init__(self, path: str, mode: str = "w"):
        if mode not in ("w", "r"):
            raise ValueError("mode must be 'w' or 'r'")
        self._mode = mode
        self._path = path
        if mode == "w":
            self._f = open(path, "wb")
            self._f.write(_MAGIC)
        else:
            self._f = open(path, "rb")
            magic = self._f.read(len(_MAGIC))
            if magic != _MAGIC:
                raise ValueError(f"{path} is not a drake_tpu message log")

    # ------------------------------ write ----------------------------------

    def write(self, t: float, channel: str, payload: bytes) -> None:
        if self._mode != "w":
            raise RuntimeError("log opened read-only")
        ch = channel.encode()
        self._f.write(_HEADER.pack(float(t), len(ch), len(payload)))
        self._f.write(ch)
        self._f.write(payload)

    def attach(self, node, clock=None):
        """Tee every ``node.publish`` into this log.  ``clock`` is a
        zero-arg callable giving the current sim time (default 0.0)."""
        orig_publish = node.publish
        clock = clock or (lambda: 0.0)

        def publish(channel: str, data: bytes) -> None:
            self.write(clock(), channel, data)
            orig_publish(channel, data)

        node.publish = publish
        return node

    # ------------------------------- read ----------------------------------

    def records(self) -> Iterator[Tuple[float, str, bytes]]:
        if self._mode != "r":
            raise RuntimeError("log opened write-only")
        self._f.seek(len(_MAGIC))
        while True:
            head = self._f.read(_HEADER.size)
            if len(head) < _HEADER.size:
                return
            t, ch_len, p_len = _HEADER.unpack(head)
            channel = self._f.read(ch_len).decode()
            payload = self._f.read(p_len)
            yield t, channel, payload

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def playback(
    log: MessageLog,
    node,
    t_end: float,
    t_start: float = 0.0,
    channels: Optional[List[str]] = None,
) -> int:
    """Replay records with t_start <= t < t_end into ``node``
    (LcmLogPlaybackSystem role, simulation-stepped).  Returns the number of
    messages published.  Call repeatedly with advancing windows to drive a
    discrete sim loop."""
    n = 0
    for t, channel, payload in log.records():
        if t < t_start or t >= t_end:
            continue
        if channels is not None and channel not in channels:
            continue
        node.publish(channel, payload)
        n += 1
    return n
