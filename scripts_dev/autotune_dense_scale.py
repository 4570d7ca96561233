"""Dense-engine autotune artifact at serving scale (VERDICT r4 item #4
acceptance): sweep the int8 / int8r engines against the f32-exact stream
baseline on a 2.62M-doc embedding table and commit the chosen config.
Real encoder checkpoints are unobtainable offline (docs/
fetch_weights.json), so the table is synthetic unit-norm Gaussian — the
distribution docs/quality_int8.json characterizes as the WORST case for
int8 recall (real embedding spectra are lower-rank and quantize
better), making the tuned config conservative.

Writes docs/autotune_dense.json. Run on TPU.
"""
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from qpp_fusion_rag_tpu.index.autotune import autotune_dense  # noqa: E402
from qpp_fusion_rag_tpu.retrievers.dense import DenseIndex  # noqa: E402

N, D, B = 2_621_440, 768, 64
OUT = REPO / "docs/autotune_dense.json"


def main():
    t0 = time.time()
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx = DenseIndex(emb, [f"d{i}" for i in range(N)], shuffle=False)
    # queries near real docs (retrieval-like geometry), plus noise
    sel = rng.choice(N, B, replace=False)
    q = emb[sel] + 0.25 * rng.standard_normal((B, D)).astype(np.float32)
    print(f"[dense-tune] index built {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    cfg = autotune_dense(idx, q, k=10, target_recall=0.99,
                         rescore_pools=(128, 256, 512, 1024), max_sample=B)
    print(f"[dense-tune] sweep in {time.time()-t0:.0f}s", flush=True)
    for s in cfg.sweep:
        print(f"[dense-tune] {s['engine']:6s} pool={s['rescore_pool']:<6d} "
              f"recall@10={s['recall']:.4f}", flush=True)
    out = {
        "n_docs": N, "dim": D, "sample_queries": B, "k": 10,
        "target_recall": 0.99,
        "embedding_model": "synthetic unit-norm Gaussian (worst case for "
                           "int8 — docs/quality_int8.json; real "
                           "checkpoints unobtainable offline)",
        "chosen": {"engine": cfg.engine, "rescore_pool": cfg.rescore_pool,
                   "recall": round(cfg.recall, 4),
                   "meets_target": cfg.meets_target},
        "sweep": cfg.sweep,
    }
    OUT.write_text(json.dumps(out, indent=1))
    print(f"[dense-tune] chosen: {out['chosen']}")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
