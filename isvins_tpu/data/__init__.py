"""Dataset IO: EuRoC MAV format loaders (replaces test/run_euroc.cpp CSV
parsing, without the artificial real-time throttle sleeps)."""

from .euroc import EurocDataset  # noqa: F401
