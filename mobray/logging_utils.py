"""Logging helpers (import-compat shim for the reference's
``MOBPY/logging_utils.py:1-120`` surface: ``get_logger``,
``set_verbosity``, ``BinningProgressLogger``).

The engine itself reports progress through per-partition metrics records
(see SURVEY.md §7) rather than driver-side log lines — on a cluster the
interesting events happen inside Ray workers, whose stdout is already
collected by Ray's own log machinery. This module exists so code written
against the reference's logging API ports without edits.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

_ROOT = "mobray"


def get_logger(name: str, level: Optional[int] = None) -> logging.Logger:
    """Return a configured logger, attaching a stdout handler on first
    use for that name (repeat calls never stack handlers)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(
            logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s: %(message)s",
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        logger.addHandler(h)
        logger.setLevel(logging.WARNING if level is None else level)
    return logger


def set_verbosity(level: str) -> None:
    """Apply a named logging level to every mobray logger."""
    numeric = getattr(logging, level.upper(), None)
    if not isinstance(numeric, int):
        raise ValueError(f"unknown logging level {level!r}")
    logging.getLogger(_ROOT).setLevel(numeric)
    for name in logging.Logger.manager.loggerDict:
        if name.startswith(_ROOT):
            logging.getLogger(name).setLevel(numeric)


class BinningProgressLogger:
    """Context manager mirroring the reference's stage-progress logger:
    logs stage entry/exit (or failure) and counts ``update`` calls."""

    def __init__(self, stage: str, logger: Optional[logging.Logger] = None):
        self.stage = stage
        self.logger = logger or get_logger(f"{_ROOT}.progress")
        self.steps_completed = 0

    def __enter__(self) -> "BinningProgressLogger":
        self.logger.info("stage %s: begin", self.stage)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> bool:
        if exc_type is None:
            self.logger.info(
                "stage %s: done after %d steps", self.stage, self.steps_completed
            )
        else:
            self.logger.error("stage %s: raised %s", self.stage, exc_val)
        return False

    def update(self, message: str) -> None:
        self.steps_completed += 1
        self.logger.debug("stage %s: %s", self.stage, message)
