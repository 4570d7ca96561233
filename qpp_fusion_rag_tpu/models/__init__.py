"""Learned fusion-weight models.

Registry mirrors the reference's model-type naming
(reference scripts/04_train_fusion.py:160-281: per_retriever / multioutput /
mlp) with TPU-native implementations.
"""

from qpp_fusion_rag_tpu.models.base import (
    BaseFusionModel,
    build_features,
    compute_targets,
    load_model,
)
from qpp_fusion_rag_tpu.models.gbdt import Booster, MultiOutputGBDT, PerRetrieverGBDT
from qpp_fusion_rag_tpu.models.mlp import FusionMLP

MODEL_REGISTRY = {
    "per_retriever": PerRetrieverGBDT,
    "multioutput": MultiOutputGBDT,
    "mlp": FusionMLP,
}


def get_model_class(name: str):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model type {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


__all__ = [
    "BaseFusionModel", "build_features", "compute_targets", "load_model",
    "Booster", "PerRetrieverGBDT", "MultiOutputGBDT", "FusionMLP",
    "MODEL_REGISTRY", "get_model_class",
]
