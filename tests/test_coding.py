"""Channel coding + coded-link tests (round-3 verdict item 7).

The LLR path (ops.softbits) finally has a consumer: a rate-1/2 K=7
convolutional code decoded with batched soft-decision Viterbi. Asserts the
decoder's correctness properties and the end-to-end coding gain at equal
Eb/N0 - one honest step beyond the reference's uncoded CRC32-framed OTA
chain (/root/reference/examples/gfdm_ota_demo.grc)."""
import numpy as np

from gfdm_tpu import GfdmConfig
from gfdm_tpu.coding import (
    CONV_TAIL_BITS,
    coded_bits_per_block,
    conv_encode,
    info_bits_for_block,
    interleaver,
    viterbi_decode,
)
from gfdm_tpu.eval.coded import coded_ber_point, coded_vs_uncoded

CFG = GfdmConfig()


def test_encode_shapes_and_termination():
    bits = np.random.default_rng(0).integers(0, 2, (3, 50)).astype(np.uint8)
    coded = conv_encode(bits)
    assert coded.shape == (3, coded_bits_per_block(50))
    assert coded_bits_per_block(50) == 2 * (50 + CONV_TAIL_BITS)
    assert info_bits_for_block(coded.shape[-1]) == 50
    # zero termination: the trailing tail drives the encoder back to state 0,
    # so an all-zero message gives an all-zero codeword
    assert not conv_encode(np.zeros((5,), np.uint8)).any()


def test_viterbi_noiseless_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (8, 120)).astype(np.uint8)
    llrs = (1.0 - 2.0 * conv_encode(bits).astype(np.float32)) * 4.0
    dec = np.asarray(viterbi_decode(llrs, 120))
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_corrects_heavy_channel_errors():
    """Soft-decision Viterbi through an AWGN channel with ~10% raw bit
    errors decodes to (near-)zero BER - the standard K=7 behavior."""
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, (16, 200)).astype(np.uint8)
    coded = conv_encode(bits)
    llrs = (1.0 - 2.0 * coded.astype(np.float32)) * 2.0
    noisy = llrs + rng.normal(0.0, 1.6, llrs.shape).astype(np.float32)
    raw_ber = np.mean((noisy < 0) != coded)
    assert raw_ber > 0.05  # the channel is genuinely bad (~10% raw errors)
    dec_ber = np.mean(np.asarray(viterbi_decode(noisy, 200)) != bits)
    # ~Eb/N0 3 dB: >20x below the raw channel error rate (measured 4.7e-3)
    assert dec_ber < raw_ber / 20


def test_interleaver_is_a_permutation():
    perm = interleaver(936)
    assert np.array_equal(np.sort(perm), np.arange(936))
    x = np.random.default_rng(3).standard_normal(936)
    np.testing.assert_array_equal(x[perm][np.argsort(perm)], x)


def test_interleaver_is_version_stable_and_spreading():
    """The permutation is arithmetic (golden-ratio stride), NOT a NumPy
    PRNG stream: a tx and rx on different NumPy versions over a real link
    must derive the identical table (advisor round-4 finding). Pinned
    values guard the contract; the stride guarantees adjacent coded bits
    land far apart (burst-error spreading)."""
    perm = interleaver(936)
    # stride: round(936/phi)=578 shares a factor 2 with 936 -> 577 (coprime)
    np.testing.assert_array_equal(
        perm[:5], [(7855 + j * 577) % 936 for j in range(5)]
    )
    gaps = np.abs(np.diff(perm.astype(np.int64)))
    circ = np.minimum(gaps, 936 - gaps)
    assert circ.min() >= 936 // 3  # every adjacent pair lands >= n/3 apart
    # odd lengths work too (stride adjusts to stay coprime)
    p = interleaver(937)
    assert np.array_equal(np.sort(p), np.arange(937))


def test_windowed_viterbi_parity_with_full():
    """Block-parallel windowed decoding (scan length 128 instead of T)
    matches the full maximum-likelihood decoder: bit-identical on clean
    input, and within statistical parity on a heavily-noised ensemble
    (the >= 38-step overlap exceeds the 5*K truncation depth, so window-
    boundary decisions coincide with the ML path essentially always)."""
    rng = np.random.default_rng(7)
    n_info = 462  # canonical burst: long enough for the windowed path
    bits = rng.integers(0, 2, (96, n_info)).astype(np.uint8)
    coded = conv_encode(bits).astype(np.float32)
    clean = (1.0 - 2.0 * coded) * 4.0
    np.testing.assert_array_equal(
        np.asarray(viterbi_decode(clean, n_info, mode="windowed")), bits
    )
    noisy = (1.0 - 2.0 * coded) * 2.0 + rng.normal(
        0.0, 2.0, coded.shape
    ).astype(np.float32)
    full = np.asarray(viterbi_decode(noisy, n_info, mode="full"))
    win = np.asarray(viterbi_decode(noisy, n_info, mode="windowed"))
    ber_full = np.mean(full != bits)
    ber_win = np.mean(win != bits)
    assert ber_full > 0.005  # the ensemble genuinely stresses the decoder
    # << 0.1 dB equivalent: allow 15% relative + a 2-sigma counting margin
    n = bits.size
    assert ber_win <= ber_full * 1.15 + 2.0 * np.sqrt(ber_full / n)


def test_radix_viterbi_is_exact_ml():
    """Radix-2^k collapsed ACS (the production decoder) is bit-identical to
    the one-step reference scan: collapsing trellis steps is just max-plus
    associativity, so the ML path is unchanged - even on a heavily-noised
    ensemble where the windowed decoder's truncation can differ."""
    rng = np.random.default_rng(9)
    for n_info in (462, 120, 57):  # T = 468 (k=4), 126 (k=3), 63 (k=3)
        bits = rng.integers(0, 2, (32, n_info)).astype(np.uint8)
        llrs = (1.0 - 2.0 * conv_encode(bits).astype(np.float32)) * 2.0
        llrs += rng.normal(0.0, 2.2, llrs.shape).astype(np.float32)
        full = np.asarray(viterbi_decode(llrs, n_info, mode="full"))
        radix = np.asarray(viterbi_decode(llrs, n_info, mode="radix"))
        np.testing.assert_array_equal(radix, full)


def test_viterbi_auto_and_sm_are_exact():
    """auto = radix (exact collapsed ACS) when available; the state-major
    decoder is bit-identical to the batch-major reference scan (same ACS,
    same tie rule, different data layout) even on a heavily-noised
    ensemble."""
    rng = np.random.default_rng(8)
    # 462 -> T=468 (k=4), 50 -> T=56 (k=4), 55 -> T=61 prime (auto falls
    # back to the full scan; explicit radix raises)
    for n_info in (462, 50, 55):
        if n_info == 55:
            import pytest as _pytest

            bits = rng.integers(0, 2, (4, n_info)).astype(np.uint8)
            llrs = (1.0 - 2.0 * conv_encode(bits).astype(np.float32)) * 2.0
            auto = np.asarray(viterbi_decode(llrs, n_info))
            full = np.asarray(viterbi_decode(llrs, n_info, mode="full"))
            np.testing.assert_array_equal(auto, full)
            with _pytest.raises(ValueError):
                viterbi_decode(llrs, n_info, mode="radix")
            continue
        bits = rng.integers(0, 2, (16, n_info)).astype(np.uint8)
        llrs = (1.0 - 2.0 * conv_encode(bits).astype(np.float32)) * 2.0
        llrs += rng.normal(0.0, 2.2, llrs.shape).astype(np.float32)
        auto = np.asarray(viterbi_decode(llrs, n_info))
        radix = np.asarray(viterbi_decode(llrs, n_info, mode="radix"))
        sm = np.asarray(viterbi_decode(llrs, n_info, mode="sm"))
        full = np.asarray(viterbi_decode(llrs, n_info, mode="full"))
        np.testing.assert_array_equal(auto, radix)
        np.testing.assert_array_equal(sm, full)
        np.testing.assert_array_equal(radix, full)


def test_coded_link_coding_gain_awgn():
    """At equal Eb/N0 the coded GFDM link beats the uncoded one by orders
    of magnitude once past the waterfall (~2 dB for K=7 soft decision)."""
    res = coded_vs_uncoded(CFG, [3.0], bursts=128, seed=1)
    assert res["coded_ber"][0] < res["uncoded_ber"][0] / 10


def test_coded_link_multipath_mmse_cnr_beats_zf():
    """Under the frequency-selective channel the CNR-weighted MMSE
    equalizer produces better LLRs than ZF (which amplifies faded-bin
    noise), and the coded BER shows it - the measurable payoff of the
    soft-output + mmse_cnr receiver capabilities (measured at 384 bursts:
    ~40% fewer decoded errors at 12 dB)."""
    zf = coded_ber_point(CFG, 9.0, bursts=256, equalizer="zf",
                         channel="multipath", seed=11)
    cnr = coded_ber_point(CFG, 9.0, bursts=256, equalizer="mmse_cnr",
                          channel="multipath", seed=11)
    assert cnr < zf


def test_interleaver_valid_across_codeword_sizes():
    """The arithmetic stride stays coprime (a true permutation) for every
    realistic codeword length - including the qam16/qam64 service sizes
    (1872, 2808) and a sample of arbitrary lengths."""
    for n in (936, 1872, 2808, 2, 3, 17, 100, 1024, 4095):
        p = interleaver(n)
        assert np.array_equal(np.sort(p), np.arange(n)), n
