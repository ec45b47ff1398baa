"""Terminal console helpers: ANSI color + UTF-8-safe streaming output.

Reference analog: /root/reference/cpp/common/console.cpp (terminal color
and UTF-8 input handling) and the Go Colorize helper
(/root/reference/pkg/booster/booster.go) — reduced to what a modern
UTF-8 POSIX terminal actually needs.
"""

from __future__ import annotations

import os
import sys

RESET = "\x1b[0m"
BOLD = "\x1b[1m"
DIM = "\x1b[2m"
CYAN = "\x1b[36m"
GREEN = "\x1b[32m"
YELLOW = "\x1b[33m"
MAGENTA = "\x1b[35m"


def color_enabled(stream=None) -> bool:
    stream = stream or sys.stdout
    if os.environ.get("NO_COLOR"):
        return False
    if os.environ.get("FORCE_COLOR"):
        return True
    return hasattr(stream, "isatty") and stream.isatty()


def colorize(text: str, *codes: str, stream=None) -> str:
    if not codes or not color_enabled(stream):
        return text
    return "".join(codes) + text + RESET


def stream_print(text: str, *codes: str) -> None:
    """Print a streamed delta without a newline, colorized when a tty."""
    sys.stdout.write(colorize(text, *codes))
    sys.stdout.flush()
