"""Gate registry: the reference's 14 logical ops (README.md:85,
cufhe_gpu.cuh:218-313) with their linear-combination constants
(bootstrap_gpu.cu:424-512)."""
from __future__ import annotations

from ..golden import GATE_CONSTANTS, PLAIN_GATES  # re-export single source

#: two-input bootstrapped gates
TWO_INPUT = tuple(GATE_CONSTANTS)
#: three-input (double-rotation) gates
MUX_GATES = ("mux", "nmux")
#: linear (non-bootstrapped) gates
LINEAR = ("not", "copy")

ALL_GATES = TWO_INPUT + MUX_GATES + LINEAR

__all__ = ["GATE_CONSTANTS", "PLAIN_GATES", "TWO_INPUT", "MUX_GATES",
           "LINEAR", "ALL_GATES"]
