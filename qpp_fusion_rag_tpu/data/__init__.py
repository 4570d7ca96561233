from qpp_fusion_rag_tpu.data.loaders import (  # noqa: F401
    LazyCorpus,
    load_corpus,
    load_queries,
    load_qrels,
    load_run_file,
    load_run_as_dict,
    load_qpp_file,
    load_qpp_scores,
    load_gold_answers,
    write_qpp_file,
)
from qpp_fusion_rag_tpu.data.vocab import DocVocab  # noqa: F401
from qpp_fusion_rag_tpu.data.runtensor import RunTensor, load_runs_dir  # noqa: F401
