"""Termination statuses (reference Core/InteriorPointMethod/TerminationStatus.hpp:10-12)."""
from __future__ import annotations

import enum


class TerminationStatus(enum.Enum):
    SUCCESSFUL_TERMINATION = 0
    NOT_FINISHED = 1
    MAX_ITS_EXCEEDED = 2
    INFEASIBLE = 3
    UNKNOWN = 4
    DID_NOT_RUN = 5
