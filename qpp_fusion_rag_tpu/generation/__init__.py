"""LLM generation: client, task generators, RAG evaluation harness."""

from qpp_fusion_rag_tpu.generation.client import (
    EmbeddingOperation,
    FactVerificationGenerator,
    GenerationError,
    GenerationOperation,
    QAGenerator,
    ValidateOperation,
    get_generator,
)
from qpp_fusion_rag_tpu.generation.local_lm import (
    BPETokenizer,
    GPTConfig,
    LocalLMTransport,
    greedy_generate,
    load_hf_gpt2,
)
from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness

__all__ = [
    "GenerationOperation", "GenerationError", "EmbeddingOperation",
    "QAGenerator", "FactVerificationGenerator", "get_generator",
    "ValidateOperation", "RAGEvaluationHarness",
    "GPTConfig", "BPETokenizer", "LocalLMTransport", "greedy_generate",
    "load_hf_gpt2",
]
