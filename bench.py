"""Benchmark: fused-retrieval throughput (queries/sec/chip).

Workload = the BASELINE.json north star: the full 5-retriever
retrieve → QPP → fuse path over an NQ-scale corpus (2.68M passages × 768
dims, reference data/nq: BGE embedding matrix) on one chip. Target
≥ 10,000 fused queries/sec/chip; `vs_baseline` is value / 10k.

Speed-of-light framing (measured on this v5e): the batch does
2·R·B·N·D ≈ 20.6 TFLOP. At the bf16 nominal peak (197 TF/s) the zero-
overhead bound is ~105 ms/batch ≈ 9.8k q/s — BELOW the 10k target, so the
production path stores the corpus index int8-quantized (symmetric per-doc
scales, ScaNN-style) and contracts on the MXU's int8 mode: the packed
group-max kernel measures 251 TOP/s (82 ms) vs 155 TF/s (133 ms) bf16.
Quality: recall@100 vs f32 exact stays ≥0.97 of the bf16 path's (see
docs/QUALITY_NOTES.md + tests/test_pallas_dense.py int8 tests).

Everything (corpus, queries, projections) is generated on device; the
timed region is the jitted pipeline step with a final device sync.
Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compile cache: first-ever compile of the big fused program
# costs minutes (remote-compile warmup); subsequent bench runs hit this cache.
jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# NQ scale (reference: 2.68M passages, 768-dim BGE embeddings)
N_DOCS = 2_621_440          # 40 * 65536
DIM = 768
R_VIEWS = 5                 # 5-retriever ensemble
BATCH = 1024
TOP_K = 100
CHUNK = 131_072
NORTH_STAR_QPS = 10_000.0


def main() -> None:
    from qpp_fusion_rag_tpu.pipeline.engine import fused_retrieval_step

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        # CPU smoke mode: tiny shapes, still exercises the full path.
        n_docs, batch, chunk = 65_536, 64, 8192
    else:
        n_docs, batch, chunk = N_DOCS, BATCH, CHUNK

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # corpus stored [D, N] on TPU: the packed Pallas kernel contracts without
    # an in-kernel transpose; int8-quantized with per-doc scales (the
    # production index format — quantization runs once at index build).
    q_emb = jax.random.normal(k2, (batch, DIM), dtype=jnp.float32)
    view_proj = jax.random.normal(k3, (R_VIEWS, DIM, DIM), dtype=jnp.float32) * 0.05
    text_feats = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (batch, 1))

    if on_tpu:
        from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows

        corpus_f = jax.random.normal(k1, (DIM, n_docs), dtype=jnp.float32)
        corpus, corpus_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
        corpus_scale = corpus_scale.reshape(1, n_docs)
        del corpus_f
        jax.block_until_ready(corpus)

        def step():
            return fused_retrieval_step(
                q_emb, view_proj, corpus, text_feats,
                k=TOP_K, chunk=chunk, k_out=TOP_K,
                corpus_scale=corpus_scale,
            )
    else:
        corpus = jax.random.normal(k1, (n_docs, DIM), dtype=jnp.bfloat16)
        jax.block_until_ready(corpus)

        def step():
            return fused_retrieval_step(
                q_emb, view_proj, corpus, text_feats,
                k=TOP_K, chunk=chunk, k_out=TOP_K,
            )

    # Warmup/compile
    t0 = time.perf_counter()
    out = step()
    # full sync through any async dispatch tunnel: read one host value
    _ = np.asarray(out[1])[0, 0]
    compile_s = time.perf_counter() - t0
    print(f"[bench] compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    reps = 5 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    _ = np.asarray(out[1])[0, 0]
    dt = (time.perf_counter() - t0) / reps
    qps = batch / dt

    flops = 2.0 * R_VIEWS * batch * n_docs * DIM
    print(
        f"[bench] {batch} queries x {n_docs} docs x {R_VIEWS} views: "
        f"{dt * 1e3:.1f} ms/batch, {flops / dt / 1e12:.1f} TF/s, {qps:.0f} q/s "
        f"({dev.device_kind})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "fused_retrieval_qps_per_chip",
        "value": round(qps, 1),
        "unit": f"queries/sec (5-retriever retrieve+qpp+fuse, {n_docs/1e6:.2f}M-doc corpus)",
        "vs_baseline": round(qps / NORTH_STAR_QPS, 4),
    }))


if __name__ == "__main__":
    main()
