"""Timestamped, leveled logger (port of /root/reference/src/Logger.jl:19-38).

``configure_logger()`` installs a formatter showing wall-clock offset,
level and source — the analog of OceananigansLogger's
"[ XX.XXX s ] Info ..." lines.
"""
from __future__ import annotations

import logging
import time

_START = time.monotonic()


class _ElapsedFormatter(logging.Formatter):
    def format(self, record):
        dt = time.monotonic() - _START
        record.elapsed = f"{dt:10.3f} s"
        return super().format(record)


def configure_logger(level=logging.INFO, show_source=False):
    logger = logging.getLogger("clima_oceananigans_jl_tpu")
    logger.setLevel(level)
    handler = logging.StreamHandler()
    fmt = "[ %(elapsed)s ] %(levelname)s %(message)s"
    if show_source:
        fmt += "  (%(name)s:%(lineno)d)"
    handler.setFormatter(_ElapsedFormatter(fmt))
    logger.handlers[:] = [handler]
    logger.propagate = False
    return logger
