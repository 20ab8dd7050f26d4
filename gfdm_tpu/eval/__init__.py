"""Link evaluation harnesses (BER sweeps, SNR studies)."""
from .ber import ber_sweep  # noqa: F401
