"""CLI modem tests: file-to-file roundtrip, simulation loopback, info.

Covers the application layer the reference ships as GRC flowgraphs
(examples/gfdm_ota_demo.grc's CRC32 + repack-bits payload path).
"""
import json

import numpy as np
import pytest

from gfdm_tpu import GfdmConfig
from gfdm_tpu.cli import (
    main,
    payload_to_symbols,
    rx_file,
    simulate,
    symbols_to_payloads,
    tx_file,
)
from gfdm_tpu.utils.framing import payload_capacity_bytes


@pytest.fixture(scope="module")
def cfg():
    return GfdmConfig()


def test_payload_symbol_roundtrip(cfg):
    rng = np.random.default_rng(7)
    cap = payload_capacity_bytes(cfg.n_data_symbols)
    payload = rng.integers(0, 256, 3 * cap, dtype=np.uint8).tobytes()
    syms, n = payload_to_symbols(cfg, payload)
    assert n == 3 and syms.shape == (3, cfg.n_data_symbols)
    np.testing.assert_allclose(np.abs(syms), 1.0, atol=1e-6)
    decoded = symbols_to_payloads(cfg, syms)
    assert all(ok for ok, _ in decoded)
    assert b"".join(p for _, p in decoded) == payload


def test_file_roundtrip_clean(cfg):
    rng = np.random.default_rng(3)
    cap = payload_capacity_bytes(cfg.n_data_symbols)
    payload = rng.integers(0, 256, 2 * cap + 11, dtype=np.uint8).tobytes()
    stream = tx_file(cfg, payload)
    assert stream.size % cfg.padded_frame_len == 0
    got, stats = rx_file(cfg, stream)
    assert stats["crc_ok"] == stats["bursts"] == 3
    assert got[: len(payload)] == payload  # final burst is zero-padded


def test_cli_end_to_end(cfg, tmp_path):
    rng = np.random.default_rng(5)
    cap = payload_capacity_bytes(cfg.n_data_symbols)
    payload = rng.integers(0, 256, cap, dtype=np.uint8).tobytes()
    pin = tmp_path / "payload.bin"
    pin.write_bytes(payload)

    for fmt in ("cf32", "sc16"):
        iq = tmp_path / f"iq.{fmt}"
        out = tmp_path / f"out.{fmt}.bin"
        assert main(["tx", "--infile", str(pin), "--outfile", str(iq),
                     "--iq-format", fmt]) == 0
        assert main(["rx", "--infile", str(iq), "--outfile", str(out),
                     "--iq-format", fmt]) == 0
        assert out.read_bytes() == payload


def test_truncated_and_clipping_captures(cfg, tmp_path, capsys):
    """Truncated sc16 files parse; tail drop and clipping are reported."""
    from gfdm_tpu.cli import _read_iq, _write_iq

    rng = np.random.default_rng(9)
    cap = payload_capacity_bytes(cfg.n_data_symbols)
    payload = rng.integers(0, 256, cap, dtype=np.uint8).tobytes()
    stream = tx_file(cfg, payload)

    # odd-length sc16 file (capture cut mid-sample) must not crash
    raw = (np.repeat(stream, 2).real * 1000).astype(np.int16)[:-1]
    p = tmp_path / "trunc.sc16"
    raw.tofile(p)
    got = _read_iq(str(p), "sc16")
    assert got.size == raw.size // 2

    # rx_file reports discarded tail samples
    _, stats = rx_file(cfg, np.concatenate([stream, stream[:17]]))
    assert stats["discarded_samples"] == 17
    assert "warning: discarding 17 trailing samples" in capsys.readouterr().err

    # clipping warning on over-scaled sc16 writes
    _write_iq(str(tmp_path / "clip.sc16"), stream * 40.0, "sc16")
    assert "sc16 clipping" in capsys.readouterr().err
    _write_iq(str(tmp_path / "ok.sc16"), stream, "sc16")
    assert "clipping" not in capsys.readouterr().err


def test_qam16_roundtrip_and_capacity(cfg):
    """16-QAM doubles the per-burst byte capacity and survives the full
    file chain (tx -> rx with CRC framing) plus a clean-channel simulate."""
    rng = np.random.default_rng(11)
    cap16 = payload_capacity_bytes(cfg.n_data_symbols, 4)
    cap4 = payload_capacity_bytes(cfg.n_data_symbols, 2)
    assert cap16 == 2 * cap4 + 4  # twice the bits, one CRC instead of two

    payload = rng.integers(0, 256, 2 * cap16 - 5, dtype=np.uint8).tobytes()
    syms, n = payload_to_symbols(cfg, payload, constellation="qam16")
    assert n == 2
    decoded = symbols_to_payloads(cfg, syms, constellation="qam16")
    assert all(ok for ok, _ in decoded)

    stream = tx_file(cfg, payload, constellation="qam16")
    assert stream.size == 2 * cfg.padded_frame_len  # half the QPSK airtime
    got, stats = rx_file(cfg, stream, constellation="qam16")
    assert stats["crc_ok"] == stats["bursts"] == 2
    assert got[: len(payload)] == payload

    sim = simulate(cfg, n_bursts=4, snr_db=25.0, ic_iterations=2, seed=2,
                   constellation="qam16")
    assert sim["crc_ok"] == 4 and sim["payload_intact"]


def test_qam64_roundtrip_and_capacity(cfg):
    """64-QAM triples the per-burst bit capacity and survives the full
    file chain (tx -> rx with CRC framing) plus a clean-channel simulate."""
    rng = np.random.default_rng(12)
    cap64 = payload_capacity_bytes(cfg.n_data_symbols, 6)
    cap4 = payload_capacity_bytes(cfg.n_data_symbols, 2)
    assert cap64 > 3 * cap4  # three times the bits, one CRC instead of three

    payload = rng.integers(0, 256, 2 * cap64 - 7, dtype=np.uint8).tobytes()
    syms, n = payload_to_symbols(cfg, payload, constellation="qam64")
    assert n == 2
    decoded = symbols_to_payloads(cfg, syms, constellation="qam64")
    assert all(ok for ok, _ in decoded)

    stream = tx_file(cfg, payload, constellation="qam64")
    assert stream.size == 2 * cfg.padded_frame_len
    got, stats = rx_file(cfg, stream, constellation="qam64")
    assert stats["crc_ok"] == stats["bursts"] == 2
    assert got[: len(payload)] == payload

    sim = simulate(cfg, n_bursts=4, snr_db=40.0, ic_iterations=2, seed=2,
                   constellation="qam64")
    assert sim["crc_ok"] == 4 and sim["payload_intact"]


def test_cli_qam16_flag(cfg, tmp_path, capsys):
    cap16 = payload_capacity_bytes(cfg.n_data_symbols, 4)
    payload = np.arange(cap16, dtype=np.uint8).tobytes()
    pin = tmp_path / "p.bin"
    pin.write_bytes(payload)
    iq = tmp_path / "iq.cf32"
    out = tmp_path / "out.bin"
    assert main(["tx", "--constellation", "qam16", "--infile", str(pin),
                 "--outfile", str(iq)]) == 0
    assert main(["rx", "--constellation", "qam16", "--infile", str(iq),
                 "--outfile", str(out)]) == 0
    assert out.read_bytes() == payload
    capsys.readouterr()
    assert main(["info", "--constellation", "qam16"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["payload_bytes_per_burst"] == cap16


def test_simulate_awgn(cfg):
    stats = simulate(cfg, n_bursts=4, snr_db=20.0, ic_iterations=2, seed=1)
    assert stats["crc_ok"] == stats["bursts"] == 4
    assert stats["payload_intact"]
    # the estimate is per-active-bin SNR (reference tag convention) — a
    # fixed offset above the padded-chunk nominal; assert dB-for-dB tracking
    lo = simulate(cfg, n_bursts=4, snr_db=12.0, ic_iterations=2, seed=1)
    assert abs((stats["snr_db_est"] - lo["snr_db_est"]) - 8.0) <= 1.0


def test_info_json(capsys):
    assert main(["info", "-K", "64", "-M", "9"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["block_len"] == 576
    assert info["payload_bytes_per_burst"] == payload_capacity_bytes(
        GfdmConfig().n_data_symbols
    )


def test_rx_udp_live_capture(cfg, tmp_path):
    """Live UDP receive mode: sender thread blasts the tx IQ stream as sc16
    datagrams; rx recovers the payload (the OTA-demo analogue)."""
    import socket
    import threading
    import time

    from gfdm_tpu import native
    from gfdm_tpu.utils.converter import cf64_to_sc16

    if not native.available():
        import pytest as _pytest

        _pytest.skip("native runtime unavailable")

    rng = np.random.default_rng(21)
    cap = payload_capacity_bytes(cfg.n_data_symbols)
    payload = rng.integers(0, 256, 2 * cap, dtype=np.uint8).tobytes()
    stream = tx_file(cfg, payload)
    raw = cf64_to_sc16(stream.astype(np.complex128))
    # pick a port that is free right now (the ingest socket no longer sets
    # SO_REUSEADDR, so a stale listener would make the bind fail loudly)
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as free:
        free.bind(("127.0.0.1", 0))
        port = free.getsockname()[1]
    errors = []

    def send():
        # Probe until the receiver has bound the port: a connected UDP
        # socket surfaces the ICMP port-unreachable as ECONNREFUSED while
        # nothing is listening. 2-byte probes are below one sc16 sample so
        # the native ingest discards them.
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("127.0.0.1", port))
        deadline = time.monotonic() + 30
        bound = False
        while time.monotonic() < deadline:
            try:
                # THREE consecutive sends with sleeps between: each sleep
                # gives a pre-bind ICMP port-unreachable time to arrive and
                # raise on the next send, so a clean triple means the port
                # was live for the whole window and no stale ICMP is in
                # flight to kill the first data send.
                s.send(b"\x00\x00")
                time.sleep(0.05)
                s.send(b"\x00\x00")
                time.sleep(0.05)
                s.send(b"\x00\x00")
                bound = True
                break
            except ConnectionRefusedError:
                time.sleep(0.05)
        if not bound:
            errors.append("receiver never bound the UDP port within 30 s")
            s.close()
            return
        try:
            step = 2 * 512
            for attempt in range(100):  # belt and braces for the first chunk
                try:
                    s.send(raw[:step].tobytes())
                    break
                except ConnectionRefusedError:
                    time.sleep(0.05)
            else:
                errors.append("first data send kept getting refused")
                return
            for i in range(step, raw.size, step):
                s.send(raw[i : i + step].tobytes())
                time.sleep(0.001)
            s.send(b"")
        except OSError as exc:  # fail the test, not just the thread
            errors.append(f"sender thread died: {exc!r}")
        finally:
            s.close()

    t = threading.Thread(target=send)
    t.start()
    out = tmp_path / "udp_out.bin"
    rc = main(["rx", "--udp-port", str(port), "--udp-timeout", "15",
               "--outfile", str(out)])
    t.join()
    assert not errors, errors
    assert rc == 0
    assert out.read_bytes() == payload

    # neither source given -> usage error
    assert main(["rx", "--outfile", str(out)]) == 2


def test_fec_payload_roundtrip_and_capacity(cfg):
    """--fec conv: rate-1/2 coded bursts roundtrip cleanly; capacity is
    roughly half the uncoded one."""
    from gfdm_tpu.cli import burst_capacity_bytes

    cap = burst_capacity_bytes(cfg, 2, "conv")
    cap_un = burst_capacity_bytes(cfg, 2, "none")
    assert 0 < cap < cap_un and cap >= cap_un // 2 - 8
    rng = np.random.default_rng(17)
    payload = rng.integers(0, 256, 2 * cap, dtype=np.uint8).tobytes()
    syms, n = payload_to_symbols(cfg, payload, fec="conv")
    assert n == 2
    decoded = symbols_to_payloads(cfg, syms, fec="conv")
    assert all(ok for ok, _ in decoded)
    assert b"".join(p for _, p in decoded) == payload


def test_fec_coding_gain_in_simulate(cfg):
    """At 4 dB through the multipath channel the coded modem recovers every
    burst while the uncoded one recovers none - the CLI-level coding gain
    (one honest step past the reference's uncoded CRC OTA chain)."""
    coded = simulate(cfg, n_bursts=6, snr_db=4.0, fec="conv", seed=3)
    uncoded = simulate(cfg, n_bursts=6, snr_db=4.0, seed=3)
    assert coded["crc_ok"] == 6 and coded["payload_intact"]
    assert uncoded["crc_ok"] < 3


def test_cli_fec_file_roundtrip(cfg, tmp_path):
    rng = np.random.default_rng(23)
    payload = rng.integers(0, 256, 900, dtype=np.uint8).tobytes()
    pin = tmp_path / "p.bin"
    pin.write_bytes(payload)
    iq = tmp_path / "x.cf32"
    pout = tmp_path / "out.bin"
    assert main(["tx", "--infile", str(pin), "--outfile", str(iq),
                 "--fec", "conv"]) == 0
    assert main(["rx", "--infile", str(iq), "--outfile", str(pout),
                 "--fec", "conv"]) == 0
    assert pout.read_bytes()[: len(payload)] == payload


def test_fec_with_dense_constellations(cfg):
    """FEC composes with qam16/qam64 payloads: the max-log LLRs feed the
    same Viterbi regardless of constellation order (generic labeled-
    constellation soft demapper), and the coded multipath loopback is
    payload-intact at moderate SNR."""
    q16 = simulate(cfg, n_bursts=4, snr_db=12.0, fec="conv",
                   constellation="qam16", seed=2)
    assert q16["crc_ok"] == 4 and q16["payload_intact"]
    q64 = simulate(cfg, n_bursts=4, snr_db=18.0, fec="conv",
                   constellation="qam64", seed=2)
    assert q64["crc_ok"] == 4 and q64["payload_intact"]
