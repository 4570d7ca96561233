"""Utilities: profiling/tracing + publication figures."""

from qpp_fusion_rag_tpu.utils.profiling import StageTimer, block_and_time, device_trace

__all__ = ["StageTimer", "device_trace", "block_and_time"]
