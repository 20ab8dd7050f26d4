#!/usr/bin/env python3
"""Multi-chip sharded receive demo (virtual CPU mesh if no multi-chip TPU).

Shards bursts over 'dp' and the stream sample axis over 'sp' with a ppermute
halo exchange - run with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/multichip_sharding.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


if __name__ == "__main__":
    main()
