"""Leveled logger — functional mirror of ``Verbose::PrintMess``
(reference ``System.h:47-72``: QUIET/NORMAL/VERBOSE/VERY_VERBOSE/DEBUG,
set to QUIET at startup ``System.cc:247``)."""

from __future__ import annotations

import sys

QUIET = 0
NORMAL = 1
VERBOSE = 2
VERY_VERBOSE = 3
DEBUG = 4

_level = QUIET


def set_level(level: int):
    global _level
    _level = level


def log(msg: str, level: int = NORMAL, file=sys.stderr):
    if level <= _level:
        print(msg, file=file)
