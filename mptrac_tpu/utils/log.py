"""Leveled logging (reference LOG/WARN macros and LOGLEV,
/root/reference/src/mptrac.h:2092-2162).

Levels: 0 = none, 1 = basic, 2 = detailed (default), 3 = debug.
Level-1 messages print flush-left, level >= 2 indented by two spaces,
matching the reference log layout.  The level comes from the LOGLEV
environment variable and can be changed at runtime with
:func:`set_level` (drivers whose stdout is machine-parsed — bench.py,
the workflow entry — set it to 0).
"""

from __future__ import annotations

import os
import sys

_level = int(os.environ.get("LOGLEV", "2"))


def set_level(level: int) -> None:
    global _level
    _level = int(level)


def get_level() -> int:
    return _level


def LOG(level: int, fmt: str, *args) -> None:
    """Print a message when ``level <= LOGLEV`` (reference h:2110)."""
    if level <= _level:
        msg = (fmt % args) if args else fmt
        print(("  " + msg) if level >= 2 else msg, flush=True)


def WARN(fmt: str, *args) -> None:
    """Warning to stderr (reference WARN, h:2136; always printed)."""
    msg = (fmt % args) if args else fmt
    print(f"Warning: {msg}", file=sys.stderr, flush=True)
