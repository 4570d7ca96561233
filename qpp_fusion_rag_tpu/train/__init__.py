"""Training pipelines (learned fusion)."""

from qpp_fusion_rag_tpu.train.fusion_trainer import (
    build_training_data,
    evaluate_weights,
    train_fusion_models,
)

__all__ = ["build_training_data", "evaluate_weights", "train_fusion_models"]
