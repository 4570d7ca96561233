"""Query-performance prediction: engine, research metrics, variants."""

from qpp_fusion_rag_tpu.qpp.engine import (
    compute_qpp,
    compute_qpp_dir,
    compute_qpp_for_res_file,
    compute_qpp_for_runtensor,
    qpp_tensor_to_dict,
)

__all__ = [
    "compute_qpp", "compute_qpp_for_res_file", "compute_qpp_for_runtensor",
    "compute_qpp_dir", "qpp_tensor_to_dict",
]
