"""Stage 01 — index build CLI.

`python -m qpp_fusion_rag_tpu.pipeline.index --corpus data/<ds>/corpus.jsonl
 --output data/<ds>/index/bm25`

Reference: scripts/01_index.py (PyTerrier IterDictIndexer + segmented HNSW
build). The TPU build needs only (a) the native sparse index and (b) dense
embedding matrices (.npy), which the dense retriever memory-maps — no ANN
graph construction (brute-force matmul is the TPU idiom, SURVEY §7).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def iter_corpus_jsonl(path):
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            title = d.get("title") or ""
            text = d.get("text") or ""
            yield str(d["_id"]), f"{title} {text}".strip()


def iter_corpus_tsv(path):
    """MS MARCO-style `docid\\ttext` TSV (reference indexing/MsMarcoIndexer)."""
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                yield parts[0], " ".join(parts[1:])


def iter_corpus(path):
    return iter_corpus_tsv(path) if str(path).endswith(".tsv") else iter_corpus_jsonl(path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Build a sparse (BM25) index")
    ap.add_argument("--corpus", required=True, help="BEIR corpus.jsonl")
    ap.add_argument("--output", required=True, help="index output directory")
    ap.add_argument("--k1", type=float, default=None)
    ap.add_argument("--b", type=float, default=None)
    ap.add_argument("--quantize", action="store_true",
                    help="uint8 impact quantization (4x smaller postings)")
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.index.sparse import SparseIndex

    t0 = time.time()
    idx = SparseIndex.build_bm25(iter_corpus(args.corpus), k1=args.k1, b=args.b)
    if args.quantize:
        idx.quantize()
    build_s = time.time() - t0
    idx.save(args.output)
    print(
        f"[index] {idx.num_docs} docs, {idx.num_terms} terms, "
        f"{idx.num_postings} postings in {build_s:.1f}s -> {args.output}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
