"""Constellations and bit <-> symbol mapping (QA-grade, not throughput-grade).

Parity target: /root/reference/python/pygfdm/symbolmapping.py:20-47.
"""
from __future__ import annotations

import numpy as np

__all__ = ["constellation", "bits_to_symbols", "symbols_to_bits", "hard_decide"]

_CONSTELLATIONS = {
    1: np.array([1.0 + 0.0j, -1.0 + 0.0j]),
    2: np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2.0),
}


def constellation(order: int) -> np.ndarray:
    """Constellation points for 2**order points (1=BPSK, 2=QPSK)."""
    return _CONSTELLATIONS[order].copy()


def bits_to_symbols(bits: np.ndarray, points: np.ndarray) -> np.ndarray:
    order = int(np.log2(points.size))
    b = np.asarray(bits).reshape(-1, order)
    idx = b.dot(1 << np.arange(order - 1, -1, -1))
    return points[idx]


def hard_decide(symbols: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Nearest-constellation-point decision (returns points, not indices)."""
    d = np.abs(symbols.reshape(-1, 1) - points.reshape(1, -1)) ** 2
    return points[np.argmin(d, axis=1)].reshape(np.shape(symbols))


def symbols_to_bits(symbols: np.ndarray, points: np.ndarray) -> np.ndarray:
    order = int(np.log2(points.size))
    d = np.abs(np.asarray(symbols).reshape(-1, 1) - points.reshape(1, -1)) ** 2
    idx = np.argmin(d, axis=1)
    shifts = np.arange(order - 1, -1, -1)
    return ((idx.reshape(-1, 1) >> shifts) & 1).flatten()
