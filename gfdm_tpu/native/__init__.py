"""ctypes bindings for the native host runtime (native/gfdm_host.cpp).

Provides wire-format conversion (sc16/cf32 <-> planar float32), payload bit
packing, and a stream ring buffer that frames continuous IQ into extended
chunk batches for the TPU receiver. Falls back to NumPy implementations when
the shared library is missing (build it with ``make -C native``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "available",
    "sc16_to_planar",
    "planar_to_sc16",
    "bits_to_qpsk_planar",
    "qpsk_planar_to_bits",
    "StreamBuffer",
    "StreamBank",
    "FileIngest",
    "UdpIngest",
]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libgfdm_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # best-effort build (g++ is in the image)
        native_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(native_dir)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64, f32p, i16p, u8p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_uint8),
    )
    lib.gfdm_sc16_to_planar.argtypes = [i16p, f32p, f32p, i64, ctypes.c_float]
    lib.gfdm_planar_to_sc16.argtypes = [f32p, f32p, i16p, i64, ctypes.c_float]
    lib.gfdm_bits_to_qpsk_planar.argtypes = [u8p, f32p, f32p, i64]
    lib.gfdm_qpsk_planar_to_bits.argtypes = [f32p, f32p, u8p, i64]
    lib.gfdm_stream_create.restype = ctypes.c_void_p
    lib.gfdm_stream_create.argtypes = [i64, i64, i64]
    lib.gfdm_stream_destroy.argtypes = [ctypes.c_void_p]
    lib.gfdm_stream_push.restype = i64
    lib.gfdm_stream_push.argtypes = [ctypes.c_void_p, f32p, f32p, i64]
    lib.gfdm_stream_available_chunks.restype = i64
    lib.gfdm_stream_available_chunks.argtypes = [ctypes.c_void_p]
    lib.gfdm_stream_dropped.restype = i64
    lib.gfdm_stream_dropped.argtypes = [ctypes.c_void_p]
    lib.gfdm_stream_pull.restype = i64
    lib.gfdm_stream_pull.argtypes = [
        ctypes.c_void_p, f32p, i64, ctypes.POINTER(i64)
    ]
    lib.gfdm_stream_push_sc16.restype = i64
    lib.gfdm_stream_push_sc16.argtypes = [
        ctypes.c_void_p, i16p, i64, ctypes.c_float
    ]
    lib.gfdm_bank_create.restype = ctypes.c_void_p
    lib.gfdm_bank_create.argtypes = [i64, i64, i64, i64]
    lib.gfdm_bank_destroy.argtypes = [ctypes.c_void_p]
    lib.gfdm_bank_push.restype = i64
    lib.gfdm_bank_push.argtypes = [ctypes.c_void_p, i64, f32p, f32p, i64]
    lib.gfdm_bank_push_sc16.restype = i64
    lib.gfdm_bank_push_sc16.argtypes = [
        ctypes.c_void_p, i64, i16p, i64, ctypes.c_float
    ]
    lib.gfdm_bank_available_chunks.restype = i64
    lib.gfdm_bank_available_chunks.argtypes = [ctypes.c_void_p]
    lib.gfdm_bank_dropped.restype = i64
    lib.gfdm_bank_dropped.argtypes = [ctypes.c_void_p]
    lib.gfdm_bank_pull.restype = i64
    lib.gfdm_bank_pull.argtypes = [
        ctypes.c_void_p, f32p, i64, ctypes.POINTER(i64)
    ]
    lib.gfdm_ingest_start_sc16.restype = ctypes.c_void_p
    lib.gfdm_ingest_start_sc16.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_float, i64
    ]
    lib.gfdm_ingest_start_udp.restype = ctypes.c_void_p
    lib.gfdm_ingest_start_udp.argtypes = [
        ctypes.c_uint16, ctypes.c_void_p, ctypes.c_float, i64
    ]
    lib.gfdm_ingest_request_stop.argtypes = [ctypes.c_void_p]
    lib.gfdm_ingest_poll.restype = i64
    lib.gfdm_ingest_poll.argtypes = [ctypes.c_void_p]
    lib.gfdm_ingest_finish.restype = i64
    lib.gfdm_ingest_finish.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


SC16_SCALE = float(2**15 - 1)


def sc16_to_planar(raw: np.ndarray, scale: float = SC16_SCALE) -> np.ndarray:
    """Interleaved int16 IQ -> (2, n) planar float32."""
    raw = np.ascontiguousarray(raw, dtype=np.int16)
    n = raw.size // 2
    out = np.empty((2, n), dtype=np.float32)
    lib = _load()
    if lib is None:
        f = raw.astype(np.float32).reshape(-1, 2) / scale
        out[0], out[1] = f[:, 0], f[:, 1]
        return out
    lib.gfdm_sc16_to_planar(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        _f32(out[0]), _f32(out[1]), n, scale,
    )
    return out


def planar_to_sc16(planar: np.ndarray, scale: float = SC16_SCALE) -> np.ndarray:
    """(2, n) planar float32 -> interleaved int16 IQ."""
    planar = np.ascontiguousarray(planar, dtype=np.float32)
    n = planar.shape[-1]
    out = np.empty(2 * n, dtype=np.int16)
    lib = _load()
    if lib is None:
        out[0::2] = np.clip(np.round(planar[0] * scale), -32768, 32767)
        out[1::2] = np.clip(np.round(planar[1] * scale), -32768, 32767)
        return out
    lib.gfdm_planar_to_sc16(
        _f32(planar[0]), _f32(planar[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, scale,
    )
    return out


def bits_to_qpsk_planar(bits: np.ndarray) -> np.ndarray:
    """(n, 2) 0/1 bits -> (2, n) planar unit-energy QPSK."""
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    n = bits.shape[0]
    out = np.empty((2, n), dtype=np.float32)
    lib = _load()
    if lib is None:
        a = 1.0 / np.sqrt(2.0)
        out[0] = np.where(bits[:, 0] > 0, -a, a)
        out[1] = np.where(bits[:, 1] > 0, -a, a)
        return out
    lib.gfdm_bits_to_qpsk_planar(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _f32(out[0]), _f32(out[1]), n,
    )
    return out


def qpsk_planar_to_bits(planar: np.ndarray) -> np.ndarray:
    """(2, n) planar symbols -> (n, 2) hard bits."""
    planar = np.ascontiguousarray(planar, dtype=np.float32)
    n = planar.shape[-1]
    out = np.empty((n, 2), dtype=np.uint8)
    lib = _load()
    if lib is None:
        out[:, 0] = planar[0] < 0
        out[:, 1] = planar[1] < 0
        return out
    lib.gfdm_qpsk_planar_to_bits(
        _f32(planar[0]), _f32(planar[1]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
    )
    return out


class StreamBuffer:
    """Native SPSC ring buffer framing IQ streams into extended chunks.

    push() planar samples from the radio thread; pull() returns batches of
    shape (n_chunks, 2, chunk_len + halo) ready for the batched TPU receiver
    (the role GNU Radio's ring buffers + set_output_multiple played in the
    reference). Overflow drops the oldest whole chunks.
    """

    def __init__(self, capacity: int, chunk_len: int, halo: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native library unavailable; build it with `make -C native`"
            )
        self._lib = lib
        self.chunk_len = int(chunk_len)
        self.halo = int(halo)
        self._h = ctypes.c_void_p(
            lib.gfdm_stream_create(int(capacity), int(chunk_len), int(halo))
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.gfdm_stream_destroy(h)
            self._h = None

    def push(self, planar: np.ndarray) -> int:
        """Push (2, n) planar samples; returns total dropped samples."""
        planar = np.ascontiguousarray(planar, dtype=np.float32)
        return int(
            self._lib.gfdm_stream_push(
                self._h, _f32(planar[0]), _f32(planar[1]), planar.shape[-1]
            )
        )

    @property
    def available_chunks(self) -> int:
        return int(self._lib.gfdm_stream_available_chunks(self._h))

    @property
    def dropped(self) -> int:
        """Cumulative samples dropped to ring overflow since creation."""
        return int(self._lib.gfdm_stream_dropped(self._h))

    def push_sc16(self, raw: np.ndarray, scale: float = SC16_SCALE) -> int:
        """Push interleaved int16 IQ (converted natively in one fused pass)."""
        raw = np.ascontiguousarray(raw, dtype=np.int16)
        return int(
            self._lib.gfdm_stream_push_sc16(
                self._h,
                raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                raw.size // 2,
                float(scale),
            )
        )

    def pull(self, max_chunks: int):
        """-> ((n, 2, chunk_len+halo) float32, absolute sample offset)."""
        ext = self.chunk_len + self.halo
        out = np.empty((max_chunks, 2, ext), dtype=np.float32)
        base = ctypes.c_int64(0)
        n = int(
            self._lib.gfdm_stream_pull(
                self._h, _f32(out.reshape(-1)), int(max_chunks), ctypes.byref(base)
            )
        )
        return out[:n], int(base.value)


class StreamBank:
    """Bank of per-channel rings with time-aligned multi-channel pulls.

    Each RF channel (antenna port) pushes independently from its own producer
    thread; ``pull`` returns (n, n_channels, 2, chunk_len+halo) batches whose
    chunks are sample-aligned across channels - the input layout for
    multi-antenna / cyclic-delay-diversity reception.
    """

    def __init__(self, n_channels: int, capacity: int, chunk_len: int, halo: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native library unavailable; build it with `make -C native`"
            )
        self._lib = lib
        self.n_channels = int(n_channels)
        self.chunk_len = int(chunk_len)
        self.halo = int(halo)
        self._h = ctypes.c_void_p(
            lib.gfdm_bank_create(
                int(n_channels), int(capacity), int(chunk_len), int(halo)
            )
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.gfdm_bank_destroy(h)
            self._h = None

    def push(self, channel: int, planar: np.ndarray) -> int:
        planar = np.ascontiguousarray(planar, dtype=np.float32)
        return int(
            self._lib.gfdm_bank_push(
                self._h, int(channel), _f32(planar[0]), _f32(planar[1]),
                planar.shape[-1],
            )
        )

    def push_sc16(self, channel: int, raw: np.ndarray,
                  scale: float = SC16_SCALE) -> int:
        raw = np.ascontiguousarray(raw, dtype=np.int16)
        return int(
            self._lib.gfdm_bank_push_sc16(
                self._h, int(channel),
                raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                raw.size // 2, float(scale),
            )
        )

    @property
    def available_chunks(self) -> int:
        return int(self._lib.gfdm_bank_available_chunks(self._h))

    @property
    def dropped(self) -> int:
        """Cumulative samples dropped across all channels (overflow + realign)."""
        return int(self._lib.gfdm_bank_dropped(self._h))

    def pull(self, max_chunks: int):
        """-> ((n, n_channels, 2, chunk_len+halo) float32, sample offset)."""
        ext = self.chunk_len + self.halo
        out = np.empty((max_chunks, self.n_channels, 2, ext), dtype=np.float32)
        base = ctypes.c_int64(0)
        n = int(
            self._lib.gfdm_bank_pull(
                self._h, _f32(out.reshape(-1)), int(max_chunks), ctypes.byref(base)
            )
        )
        return out[:n], int(base.value)


class FileIngest:
    """Background-thread sc16 file reader feeding a StreamBuffer.

    The native reader thread converts and pushes without Python in the loop
    (the io_uring/UHD-recv-thread role in a production deployment).
    """

    def __init__(self, path: str, stream: StreamBuffer,
                 scale: float = SC16_SCALE, block_samples: int = 65536):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = ctypes.c_void_p(
            lib.gfdm_ingest_start_sc16(
                path.encode(), stream._h, float(scale), int(block_samples)
            )
        )

    @property
    def running(self) -> bool:
        return int(self._lib.gfdm_ingest_poll(self._h)) < 0

    def finish(self) -> int:
        """Join the reader thread; returns total samples ingested."""
        if self._h is None:
            return 0
        n = int(self._lib.gfdm_ingest_finish(self._h))
        self._h = None
        return n


class UdpIngest:
    """Background-thread UDP sc16 receiver feeding a StreamBuffer.

    The NIC-ingest analogue of a UHD/VITA-49 recv thread (the reference's
    OTA demo sources samples from uhd_usrp_source,
    /root/reference/examples/gfdm_ota_demo.grc): interleaved sc16 IQ
    datagrams sent to 127.0.0.1:``port`` are converted and pushed into the
    ring without Python in the loop. A zero-length datagram marks
    end-of-stream; :meth:`stop` also ends the loop.

    The socket is bound synchronously in the constructor: once this returns,
    the port is live (senders may probe it with sub-sample-size datagrams,
    which are discarded). Raises OSError if the bind fails.
    """

    def __init__(self, port: int, stream: StreamBuffer,
                 scale: float = SC16_SCALE, max_datagram_bytes: int = 65536):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.port = int(port)
        h = lib.gfdm_ingest_start_udp(
            self.port, stream._h, float(scale), int(max_datagram_bytes)
        )
        if not h:
            raise OSError(f"could not bind udp:{self.port}")
        self._h = ctypes.c_void_p(h)

    @property
    def running(self) -> bool:
        return int(self._lib.gfdm_ingest_poll(self._h)) < 0

    def stop(self) -> None:
        """Request the receive loop to exit (seen within ~100 ms)."""
        if self._h is not None:
            self._lib.gfdm_ingest_request_stop(self._h)

    def finish(self) -> int:
        """Join the receiver thread; returns total samples ingested."""
        if self._h is None:
            return 0
        n = int(self._lib.gfdm_ingest_finish(self._h))
        self._h = None
        return n
