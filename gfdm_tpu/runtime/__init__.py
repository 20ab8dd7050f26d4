"""Tx/Rx chain composites and channel simulation — the streaming/runtime
layer replacing the reference's GNU Radio block graph (SURVEY.md section 2.2)."""
from . import channel, receiver, service, transmit_service, transmitter  # noqa: F401
