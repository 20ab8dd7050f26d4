"""Constellations and bit <-> symbol mapping (QA-grade, not throughput-grade).

Parity target: /root/reference/python/pygfdm/symbolmapping.py:20-47.
"""
from __future__ import annotations

import numpy as np

__all__ = ["constellation", "bits_to_symbols", "symbols_to_bits", "hard_decide"]

def _gray_16qam() -> np.ndarray:
    """Gray-coded 16-QAM, unit average energy, index = 4 bits (I msb pair,
    Q lsb pair is NOT the layout: bits [b3 b2 b1 b0] map b3b2 -> I level,
    b1b0 -> Q level with Gray order 00,01,11,10 -> -3,-1,+1,+3)."""
    gray_levels = {0b00: -3.0, 0b01: -1.0, 0b11: 1.0, 0b10: 3.0}
    pts = np.empty(16, dtype=np.complex128)
    for idx in range(16):
        i_lvl = gray_levels[(idx >> 2) & 0b11]
        q_lvl = gray_levels[idx & 0b11]
        pts[idx] = i_lvl + 1j * q_lvl
    return pts / np.sqrt(10.0)  # E[|x|^2] = (2/4)(1+9) = 10 before scaling


_CONSTELLATIONS = {
    1: np.array([1.0 + 0.0j, -1.0 + 0.0j]),
    2: np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2.0),
    4: _gray_16qam(),
}


def constellation(order: int) -> np.ndarray:
    """Points for 2**order-ary mapping (1=BPSK, 2=QPSK, 4=Gray 16-QAM)."""
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
