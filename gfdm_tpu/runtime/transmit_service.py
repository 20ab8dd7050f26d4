"""Persistent streaming transmit service: the Tx mirror of StreamingReceiver.

The reference's transmit direction is a free-running flowgraph: payload
source -> transmitter_cc -> short_burst_shaper (padding/scale + timed USRP
bursts) -> radio sink (/root/reference/examples/gfdm_ota_demo.grc). Here one
jitted batched Tx step replaces the scheduler threads, and the service
assembles the timed burst train into a continuous planar sample stream that
any sink consumes: a native StreamBuffer (full-duplex loopback with
StreamingReceiver over the rings), an sc16 file/socket writer, or a custom
callable. Burst timing comes from runtime.timing.BurstScheduler - the same
cycle-grid quantization the reference's timed-Tx path uses
(/root/reference/lib/short_burst_shaper_impl.cc:184-233).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GfdmConfig

__all__ = ["TxStats", "StreamingTransmitter", "UdpSink"]


class UdpSink:
    """Datagram sc16 IQ sender: the uhd_usrp_sink analogue over UDP.

    Accepts (2, n) planar float32 sample blocks (the StreamingTransmitter
    sink contract via ``push``), converts them to interleaved sc16 (native
    SIMD when built) and sends them as datagrams of at most
    ``samples_per_datagram`` samples to ``host:port`` - the wire format
    gfdm_tpu.native.UdpIngest ingests on the receive side, so a
    StreamingTransmitter -> UdpSink -> UdpIngest -> StreamingReceiver chain
    is a full-duplex modem over a real socket (the executable software
    analogue of the reference's USRP OTA loop,
    /root/reference/examples/gfdm_ota_demo.grc). ``close()`` sends the
    zero-length end-of-stream datagram UdpIngest understands.
    """

    def __init__(self, port: int, host: str = "127.0.0.1",
                 samples_per_datagram: int = 4096, gain: float = 1.0):
        import socket

        from ..native import SC16_SCALE

        self.addr = (host, int(port))
        self.samples_per_datagram = int(samples_per_datagram)
        self.gain = float(gain)
        self.scale = SC16_SCALE
        self.samples_sent = 0
        self.datagrams_sent = 0
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def push(self, planar: np.ndarray) -> None:
        """Send a (2, n) planar float32 block as sc16 datagrams."""
        from ..native import planar_to_sc16

        planar = np.ascontiguousarray(planar, np.float32)
        if self.gain != 1.0:
            planar = planar * np.float32(self.gain)
        raw = planar_to_sc16(planar, self.scale)
        step = 2 * self.samples_per_datagram
        for i in range(0, raw.size, step):
            self._sock.sendto(raw[i : i + step].tobytes(), self.addr)
            self.datagrams_sent += 1
        self.samples_sent += planar.shape[-1]

    def close(self, end_of_stream: bool = True) -> None:
        if self._sock is not None:
            if end_of_stream:
                self._sock.sendto(b"", self.addr)
            self._sock.close()
            self._sock = None


@lru_cache(maxsize=16)
def _tx_fn(cfg: GfdmConfig, shift_idx: int):
    from ..ops.planar_pipeline import transmit_planar

    @jax.jit
    def fn(payloads, scale):
        # (B, 2, n_data) planar payload symbols -> (B, 2, frame_len)
        return transmit_planar(cfg, payloads)[:, shift_idx, :, :] * scale

    return fn


@dataclass
class TxStats:
    batches: int = 0
    bursts: int = 0
    samples: int = 0


@dataclass
class StreamingTransmitter:
    """Batched burst transmitter emitting a timed continuous sample stream.

    One ``step`` modulates a payload batch in a single jitted program (the
    planar Tx chain: map -> modulate -> CP/window -> preamble); ``serve``
    pulls payload batches from a source, places each burst on the
    ``cycle_samples`` grid (one burst per cycle, zero-filled gaps - the
    short_burst_shaper's padding contract) and hands the assembled stream to
    the sink together with per-burst ``tx_time`` stamps.
    """

    cfg: GfdmConfig
    batch_bursts: int = 64
    scale: float = 1.0
    cyclic_shift_index: int = 0
    sample_rate: float = 3.125e6
    # grid period between burst starts, in samples; must hold a whole burst.
    # default: the padded power-of-two frame (configurator padding contract)
    cycle_samples: int | None = None
    timing_advance_secs: float = 0.0
    stats: TxStats = field(default_factory=TxStats)

    def __post_init__(self):
        from ..ops.planar_pipeline import prepare
        from .timing import BurstScheduler

        if self.cycle_samples is None:
            self.cycle_samples = self.cfg.padded_frame_len
        if self.cycle_samples < self.cfg.frame_len:
            raise ValueError(
                f"cycle_samples {self.cycle_samples} cannot hold a "
                f"{self.cfg.frame_len}-sample burst"
            )
        if not 0 <= self.cyclic_shift_index < len(self.cfg.cyclic_shifts):
            raise ValueError(
                f"cyclic_shift_index {self.cyclic_shift_index} out of range "
                f"for {len(self.cfg.cyclic_shifts)} configured shifts"
            )
        prepare(self.cfg)
        self._fn = _tx_fn(self.cfg, int(self.cyclic_shift_index))
        self.scheduler = BurstScheduler(
            cycle_interval_secs=self.cycle_samples / self.sample_rate,
            timing_advance_secs=self.timing_advance_secs,
        )
        self._next_slot = 0  # absolute sample index of the next burst start

    def step(self, payloads: np.ndarray) -> np.ndarray:
        """(B, 2, n_data) planar payload symbols -> (B, 2, frame_len)."""
        payloads = np.ascontiguousarray(payloads, np.float32)
        out = self._fn(jnp.asarray(payloads), jnp.float32(self.scale))
        return np.asarray(out)

    def _assemble(self, bursts: np.ndarray):
        """Place bursts on the cycle grid -> (2, n*cycle) stream + stamps."""
        n = bursts.shape[0]
        cyc = self.cycle_samples
        stream = np.zeros((2, n * cyc), np.float32)
        stamps = []
        for i in range(n):
            start = i * cyc
            stream[:, start : start + bursts.shape[-1]] = bursts[i]
            abs_start = self._next_slot + start
            stamps.append(
                (abs_start / self.sample_rate - self.timing_advance_secs,
                 abs_start)
            )
        self._next_slot += n * cyc
        return stream, stamps

    def serve(self, source, sink, max_batches: int | None = None) -> TxStats:
        """Run the transmit loop until the source is exhausted.

        ``source``: callable returning a (B, 2, n_data) planar payload batch
        or None when done. ``sink``: callable receiving a dict with
        ``samples`` (2, T) float32 planar, ``tx_times`` [(secs, abs_sample)],
        and ``bursts`` (the modulated burst batch). A native StreamBuffer is
        accepted directly as sink (its push() ingests the planar stream -
        the rings-loopback deployment).
        """
        push = getattr(sink, "push", None)

        def emit(out):
            if push is not None:
                push(out["samples"])
            else:
                sink(out)

        batches = 0
        while max_batches is None or batches < max_batches:
            payloads = source()
            if payloads is None:
                break
            bursts = self.step(payloads)
            stream, stamps = self._assemble(bursts)
            self.stats.batches += 1
            self.stats.bursts += bursts.shape[0]
            self.stats.samples += stream.shape[-1]
            emit({"samples": stream, "tx_times": stamps, "bursts": bursts})
            batches += 1
        return self.stats
