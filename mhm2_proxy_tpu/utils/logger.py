"""Logging (reference upcxx-utils log.hpp SLOG/LOG macro family).

Rank-0 console + per-run log file; verbosity mirrors SLOG vs SLOG_VERBOSE.
"""

from __future__ import annotations

import logging
import sys

_logger = None


def get_logger(log_file: str | None = None, verbose: bool = False):
    global _logger
    if _logger is None:
        _logger = logging.getLogger("mhm2_proxy_tpu")
        _logger.setLevel(logging.DEBUG)
        h = logging.StreamHandler(sys.stdout)
        h.setLevel(logging.DEBUG if verbose else logging.INFO)
        h.setFormatter(logging.Formatter("%(asctime)s %(message)s", "%H:%M:%S"))
        _logger.addHandler(h)
    if log_file and not any(isinstance(h, logging.FileHandler) for h in _logger.handlers):
        fh = logging.FileHandler(log_file)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        _logger.addHandler(fh)
    return _logger


def SLOG(*args):
    get_logger().info(" ".join(str(a) for a in args))
