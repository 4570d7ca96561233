"""Stage 01b — corpus encoding CLI (dense index construction).

`python -m qpp_fusion_rag_tpu.pipeline.encode --corpus data/<ds>/corpus.jsonl
 --output data/<ds>/index/bge --model BAAI/bge-base-en-v1.5 --pooling cls`

Reference: src/retrievers/tct_colbert.py:33-102 — chunked corpus encoding
with per-chunk .npy disk cache and resume. Each chunk writes
`parts/emb_<i>.npy`; finalize concatenates into the DenseIndex layout
(embeddings.npy + docnos.txt). Re-running skips completed chunks.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def iter_chunks(corpus_path, chunk_docs: int):
    docnos, texts = [], []
    with open(corpus_path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            docnos.append(str(d["_id"]))
            title = d.get("title") or ""
            texts.append(f"{title} {d.get('text') or ''}".strip())
            if len(texts) >= chunk_docs:
                yield docnos, texts
                docnos, texts = [], []
    if texts:
        yield docnos, texts


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Encode a corpus into a dense index")
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--output", required=True, help="dense index directory")
    ap.add_argument("--model", required=True, help="HF checkpoint (must be local/cached)")
    ap.add_argument("--pooling", default="cls", choices=["cls", "mean"])
    ap.add_argument("--normalize", action="store_true", default=None)
    ap.add_argument("--chunk-docs", type=int, default=10000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-len", type=int, default=256)
    args = ap.parse_args(argv)

    from qpp_fusion_rag_tpu.config import config
    from qpp_fusion_rag_tpu.encoders import DenseEncoder, load_hf_bert

    normalize = args.normalize if args.normalize is not None else (args.pooling == "cls")
    params, cfg = load_hf_bert(args.model)
    import transformers

    hf_tok = transformers.AutoTokenizer.from_pretrained(args.model)
    tokenizer = lambda t: hf_tok(t, truncation=True, max_length=args.max_len)["input_ids"]
    encoder = DenseEncoder(params, cfg, pooling=args.pooling, normalize=normalize,
                           tokenizer=tokenizer, max_len=args.max_len)
    batch_size = args.batch_size or int(config.processing.batch_sizes.encoding)

    out = Path(args.output)
    parts = out / "parts"
    parts.mkdir(parents=True, exist_ok=True)
    all_docnos = []
    t0 = time.time()
    for ci, (docnos, texts) in enumerate(iter_chunks(args.corpus, args.chunk_docs)):
        all_docnos.extend(docnos)
        part = parts / f"emb_{ci:05d}.npy"
        if part.exists():  # resume (reference .npy cache semantics)
            # validate the cached part: a kill mid-save leaves a
            # truncated file, and a changed corpus silently misaligns
            # rows with docnos — row count is a cheap header read
            try:
                cached = np.load(part, mmap_mode="r")
                if cached.shape[0] == len(docnos):
                    continue
                print(f"[encode] chunk {ci}: cached part has "
                      f"{cached.shape[0]} rows, corpus chunk has "
                      f"{len(docnos)} — re-encoding")
            except Exception:
                print(f"[encode] chunk {ci}: cached part unreadable — "
                      "re-encoding")
        embs = []
        for i in range(0, len(texts), batch_size):
            embs.append(encoder(texts[i : i + batch_size]))
        # tmp keeps the .npy suffix (np.save appends it otherwise) and a
        # prefix the finalize glob (emb_*.npy) does NOT match, so a kill
        # between save and replace cannot leak a tmp into the concat
        tmp = part.with_name("tmp_" + part.name)
        np.save(tmp, np.concatenate(embs).astype(np.float16))
        tmp.replace(part)          # atomic: no truncated parts on kill
        print(f"[encode] chunk {ci}: {len(texts)} docs "
              f"({len(all_docnos) / max(time.time() - t0, 1e-9):.0f} docs/s)")

    # finalize: concatenate parts -> embeddings.npy
    part_files = sorted(parts.glob("emb_*.npy"))
    embs = np.concatenate([np.load(p) for p in part_files])
    assert len(embs) == len(all_docnos), (len(embs), len(all_docnos))
    np.save(out / "embeddings.npy", embs)
    (out / "docnos.txt").write_text("\n".join(all_docnos) + "\n")
    print(f"[encode] {len(embs)} x {embs.shape[1]} -> {out} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
