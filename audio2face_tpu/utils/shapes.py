"""Shared shape arithmetic.

One definition of the ceil-to-multiple helper used across the kernels,
serving, data and parallelism modules (it previously existed as seven
private copies that could drift independently).
"""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x`` (non-negative ints)."""
    return ((x + m - 1) // m) * m
