"""Neural encoders (JAX forward passes over the shared BERT core).

Replaces the reference's sentence-transformers / Pyserini encoder stack
(reference src/retrievers/bge.py:31-84, splade.py:25-80,
bm25_monot5.py:37-61) with jitted JAX encoders sharing one weight format.
"""

from qpp_fusion_rag_tpu.encoders.bert import (
    BertConfig,
    bert_encode,
    classifier_logits,
    l2_normalize,
    load_hf_bert,
    load_hf_tokenizer,
    load_tokenizer,
    mlm_logits,
    params_from_hf_state_dict,
    pool_cls,
    pool_mean,
)
from qpp_fusion_rag_tpu.encoders.heads import (
    CrossEncoderScorer,
    DenseEncoder,
    SpladeEncoder,
)

__all__ = [
    "BertConfig", "bert_encode", "params_from_hf_state_dict", "load_hf_bert", "load_hf_tokenizer", "load_tokenizer",
    "pool_cls", "pool_mean", "l2_normalize", "mlm_logits", "classifier_logits",
    "DenseEncoder", "SpladeEncoder", "CrossEncoderScorer",
]
