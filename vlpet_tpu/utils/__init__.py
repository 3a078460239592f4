"""Shared utilities: logging, metering, profiling."""

from vlpet_tpu.utils.logging import LossMeter, MetricsLogger
