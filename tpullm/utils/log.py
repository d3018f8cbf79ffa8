"""Logging subsystem (reference: common/log.cpp).

The reference keeps a ring-buffered async logger with levels, timestamps and
colors, controlled by CLI flags and environment variables. Python's stdlib
logger already gives async-safe leveled output; this module adds the missing
pieces so the rest of the framework has ONE logging surface:

- ``get_logger(name)``: namespaced logger under the ``tpullm`` root.
- env control: ``TPULLM_LOG_LEVEL`` (debug|info|warn|error|none),
  ``TPULLM_LOG_FILE`` (also log to file), ``TPULLM_LOG_TIMESTAMPS=0/1``,
  ``TPULLM_LOG_COLORS=0/1`` (mirrors common/log.cpp's LOG_COLORS/--log-*).
- ``ring(n)``: the last n formatted records (the reference's ring buffer,
  used by /props and crash dumps).
- ``setup(...)``: programmatic configuration for tools' --log-* flags.
"""
from __future__ import annotations

import collections
import logging
import os
import sys
import threading
import time

_LEVELS = {
    "debug": logging.DEBUG, "info": logging.INFO, "warn": logging.WARNING,
    "warning": logging.WARNING, "error": logging.ERROR,
    "none": logging.CRITICAL + 10,
}

_COLORS = {
    logging.DEBUG: "\x1b[90m", logging.INFO: "",
    logging.WARNING: "\x1b[33m", logging.ERROR: "\x1b[31m",
}
_RESET = "\x1b[0m"

_RING_MAX = 256
_ring: "collections.deque[str]" = collections.deque(maxlen=_RING_MAX)
_lock = threading.Lock()
_configured = False


class _RingHandler(logging.Handler):
    def emit(self, record):
        try:
            with _lock:
                _ring.append(self.format(record))
        except Exception:
            pass


class _ConsoleFormatter(logging.Formatter):
    def __init__(self, timestamps: bool, colors: bool):
        super().__init__()
        self.timestamps = timestamps
        self.colors = colors
        self.t0 = time.time()

    def format(self, record):
        msg = record.getMessage()
        if record.exc_info:
            msg += "\n" + self.formatException(record.exc_info)
        lvl = {logging.DEBUG: "D", logging.INFO: "I",
               logging.WARNING: "W", logging.ERROR: "E"}.get(record.levelno, "?")
        ts = f"{time.time() - self.t0:10.2f} " if self.timestamps else ""
        line = f"{ts}{lvl} {record.name.removeprefix('tpullm.')}: {msg}"
        if self.colors:
            c = _COLORS.get(record.levelno, "")
            if c:
                line = c + line + _RESET
        return line


def setup(level: str | None = None, file: str | None = None,
          timestamps: bool | None = None, colors: bool | None = None) -> None:
    """(Re)configure the tpullm root logger. Env vars fill in unset args."""
    global _configured
    level = level or os.environ.get("TPULLM_LOG_LEVEL", "info")
    file = file or os.environ.get("TPULLM_LOG_FILE")
    if timestamps is None:
        timestamps = os.environ.get("TPULLM_LOG_TIMESTAMPS", "0") == "1"
    if colors is None:
        colors = (os.environ.get("TPULLM_LOG_COLORS", "auto") == "1"
                  or (os.environ.get("TPULLM_LOG_COLORS", "auto") == "auto"
                      and sys.stderr.isatty()))
    root = logging.getLogger("tpullm")
    root.setLevel(_LEVELS.get(str(level).lower(), logging.INFO))
    root.propagate = False
    for h in list(root.handlers):
        root.removeHandler(h)
    con = logging.StreamHandler(sys.stderr)
    con.setFormatter(_ConsoleFormatter(timestamps, colors))
    root.addHandler(con)
    rh = _RingHandler()
    rh.setFormatter(_ConsoleFormatter(True, False))
    root.addHandler(rh)
    if file:
        fh = logging.FileHandler(file)
        fh.setFormatter(_ConsoleFormatter(True, False))
        root.addHandler(fh)
    _configured = True


def get_logger(name: str = "") -> logging.Logger:
    if not _configured:
        setup()
    return logging.getLogger(f"tpullm.{name}" if name else "tpullm")


def ring(n: int = _RING_MAX) -> list[str]:
    """Last n formatted log lines (common/log.cpp ring buffer analogue)."""
    with _lock:
        return list(_ring)[-n:]
