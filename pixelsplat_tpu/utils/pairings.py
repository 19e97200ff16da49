"""Heterogeneous view-pair index helpers.

Static (trace-time) integer index tables for "each view vs all other
views" gathers and their transpose, mirroring
/root/reference/src/misc/heterogeneous_pairings.py. Computed in numpy at
trace time (shapes are static), consumed as constants by XLA.
"""

from __future__ import annotations

import numpy as np


def generate_heterogeneous_index(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(index_self, index_other), each (n, n-1): for row v, the other views."""
    arange = np.arange(n)
    index_self = np.repeat(arange[:, None], n - 1, axis=1)
    index_other = np.repeat(arange[None, :], n, axis=0) + np.triu(
        np.ones((n, n), dtype=np.int64)
    )
    index_other = index_other[:, :-1]
    return index_self, index_other


def generate_heterogeneous_index_transpose(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Index tables that transpose a (view, other_view) table; applying the
    transpose twice is the identity."""
    arange = np.arange(n)
    ones = np.ones((n, n), dtype=np.int64)
    index_self = np.repeat(arange[None, :], n, axis=0) + np.triu(ones)
    index_other = np.repeat(arange[:, None], n, axis=1) - (1 - np.triu(ones))
    return index_self[:, :-1], index_other[:, :-1]
