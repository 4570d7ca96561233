"""Stage 05 — fusion CLI.

`python -m qpp_fusion_rag_tpu.pipeline.fuse --runs-dir data/<ds>/runs
 --qpp-dir data/<ds>/qpp --output-dir data/<ds>/fused --method all`

Reference: scripts/05_fusion.py:56-235 (`--method all` runs 3 unweighted +
3 RSD-weighted + learned per available model pickle). Output file naming
follows the reference's `<method>.res` convention.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Fuse run files")
    ap.add_argument("--runs-dir", required=True)
    ap.add_argument("--qpp-dir", default=None)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--method", default="all",
                    help="all | combsum | combmnz | rrf | wcombsum | wcombmnz | wrrf | learned")
    ap.add_argument("--qpp-model", default=None, help="weight source (e.g. RSD)")
    ap.add_argument("--qpp-layout", default="kernel", choices=["kernel", "reference"],
                    help="column layout of the .qpp files: this framework's "
                         "(kernel) or the reference's (reference)")
    ap.add_argument("--model-path", default=None, help="learned-fusion model pickle")
    ap.add_argument("--models-dir", default=None,
                    help="with --method all: fuse once per fusion_*.pkl found here")
    ap.add_argument("--rrf-k", type=int, default=None)
    ap.add_argument("--k-out", type=int, default=None)
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.data.loaders import load_qpp_scores
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.fusion.engine import run_fusion
    from qpp_fusion_rag_tpu.models import load_model

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rt = RunTensor.from_trec_dir(args.runs_dir, use_normalized=True)
    qpp_data = load_qpp_scores(args.qpp_dir) if args.qpp_dir else None
    qpp_model = args.qpp_model or config.qpp.default_method

    if args.method != "all":
        t0 = time.time()
        run_fusion(
            args.method, rt, qpp=qpp_data, qpp_model=qpp_model,
            qpp_layout=args.qpp_layout,
            model_path=args.model_path, rrf_k=args.rrf_k, k_out=args.k_out,
            output_path=out_dir / f"{args.method.lower()}.res",
        )
        print(f"[fuse] {args.method}: {time.time() - t0:.2f}s")
        return 0

    methods = ["combsum", "combmnz", "rrf"]
    if qpp_data is not None:
        methods += ["wcombsum", "wcombmnz", "wrrf"]
    t0 = time.time()
    for method in methods:
        run_fusion(
            method, rt, qpp=qpp_data, qpp_model=qpp_model,
            qpp_layout=args.qpp_layout,
            rrf_k=args.rrf_k, k_out=args.k_out,
            output_path=out_dir / f"{method}.res",
        )
        print(f"[fuse] {method} done")
    if qpp_data is not None:
        models_dir = Path(args.models_dir) if args.models_dir else None
        if models_dir and models_dir.is_dir():
            for pkl in sorted(models_dir.glob("fusion_*.pkl")):
                name = pkl.stem.replace("fusion_", "learned_")
                model = load_model(pkl)
                run_fusion(
                    "learned", rt, qpp=qpp_data, model=model, k_out=args.k_out,
                    output_path=out_dir / f"{name}.res",
                )
                print(f"[fuse] {name} done")
    print(f"[fuse] all methods: {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
