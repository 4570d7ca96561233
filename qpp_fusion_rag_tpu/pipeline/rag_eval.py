"""Stage 07 — RAG end-task evaluation CLI.

`python -m qpp_fusion_rag_tpu.pipeline.rag_eval --dataset-dir data/<ds>
 --fused-run data/<ds>/fused/learned_multioutput.res --output-dir
 data/<ds>/results [--fusion-name learned --model-name qwen3-4b]`

Reference: scripts/07_rag_eval.py:213-424. Requires a reachable
OpenAI-compatible LLM server (config models.llm.base_url).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="RAG end-task evaluation")
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--fused-run", required=True, help="TREC .res file to evaluate")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--dataset", default=None, help="dataset name (auto-detected)")
    ap.add_argument("--fusion-name", default=None)
    ap.add_argument("--model-name", default=None)
    ap.add_argument("--k-shots", nargs="*", type=int, default=None)
    ap.add_argument("--max-queries", type=int, default=None)
    ap.add_argument("--checkpoint-every", type=int, default=10)
    ap.add_argument("--local-lm", default=None,
                    help="serve answers from an on-device JAX LM saved by "
                         "generation.lm_trainer.save_lm (no HTTP server)")
    ap.add_argument("--max-new", type=int, default=16,
                    help="--local-lm: max generated tokens per answer")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.config import config, detect_dataset
    from qpp_fusion_rag_tpu.data.loaders import (
        LazyCorpus,
        load_qrels,
        load_queries,
        load_run_pairs,
    )
    from qpp_fusion_rag_tpu.evaluation.base import get_task_type
    from qpp_fusion_rag_tpu.generation.client import GenerationOperation, get_generator
    from qpp_fusion_rag_tpu.generation.rag_harness import RAGEvaluationHarness

    ds_dir = Path(args.dataset_dir)
    dataset = args.dataset or detect_dataset(ds_dir) or "nq"
    queries = load_queries(ds_dir)
    qrels = load_qrels(ds_dir / "qrels" / "test.tsv")
    corpus = LazyCorpus(ds_dir / "corpus.jsonl")
    run2 = load_run_pairs(args.fused_run)

    if args.local_lm:
        from qpp_fusion_rag_tpu.generation.lm_trainer import load_lm
        from qpp_fusion_rag_tpu.generation.local_lm import LocalLMTransport

        params, lm_cfg, tok = load_lm(args.local_lm)
        if tok is None:
            raise SystemExit(f"--local-lm {args.local_lm}: no vocab.json "
                             "(save with a tokenizer)")
        transport = LocalLMTransport(params, lm_cfg, tok,
                                     max_new=args.max_new)
        op = GenerationOperation(model=args.model_name or "local-jax-lm",
                                 transport=transport,
                                 max_tokens=args.max_new)
    else:
        op = GenerationOperation(model=args.model_name)
    generator = get_generator(get_task_type(dataset), op)

    fusion_name = args.fusion_name or Path(args.fused_run).stem
    model_name = (args.model_name or op.model).replace("/", "_")
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = out_dir / f".ckpt_{fusion_name}__{model_name}.json"

    harness = RAGEvaluationHarness(
        generator, corpus, qrels,
        k_shots=args.k_shots, checkpoint_path=ckpt,
        checkpoint_every=args.checkpoint_every,
    )
    results = harness.run(queries, run2, max_queries=args.max_queries)

    out_path = out_dir / f"{fusion_name}__{model_name}.json"
    out_path.write_text(json.dumps({
        "dataset": dataset,
        "fusion": fusion_name,
        "model": model_name,
        **results,
    }, indent=2))
    print(f"[rag_eval] {results['n_queries']} queries -> {out_path}")
    for k, d in sorted(results["diagnostics_by_k"].items(), key=lambda x: int(x[0])):
        print(f"[rag_eval]   k={k}: recall={d.get('recall_at_k', 0):.3f} "
              f"rr={d.get('reciprocal_rank', 0):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
