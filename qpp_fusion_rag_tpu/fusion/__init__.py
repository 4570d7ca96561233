"""Rank fusion: the 9 reference methods + oracle/ProbFuse/argmax baselines."""

from qpp_fusion_rag_tpu.fusion.engine import (
    combmnz,
    combsum,
    learned_fusion,
    rrf,
    run_fusion,
    weighted_combmnz,
    weighted_combsum,
    weighted_rrf,
)
from qpp_fusion_rag_tpu.fusion.oracle import oracle_report, oracle_run
from qpp_fusion_rag_tpu.fusion.probfuse import ProbFuse

__all__ = [
    "combsum", "combmnz", "rrf",
    "weighted_combsum", "weighted_combmnz", "weighted_rrf",
    "learned_fusion", "run_fusion",
    "oracle_report", "oracle_run", "ProbFuse",
]
