"""END-TO-END fused-quality retention of the production config vs exact.

VERDICT r2 task 2: per-view retention (docs/quality_{int8,q8,rescore}.json)
does not bound the FUSED result — QPP weights feed on the approximated
score shapes. This measures the full pipeline at NQ scale (2.62M docs):

  EXACT pipeline      f32 full-top-k dense, full-depth f64 host sparse,
                      f32 rerank — the rank-exact reference
  PRODUCTION pipeline int8 Pallas dense + q8r rank-safe sparse
                      (q8 candidates + exact doc-vector rescore) + int8
                      rerank — what bench.py/serving run

Both feed the SAME QPP kernel + fusion tail; all 9 fusion methods
(3 unweighted, 3 RSD-weighted, 3 learned-MLP over the 13x5 features)
are fused from each pipeline's views and compared:

  ndcg10_retention — nDCG@10 of the production fused list against the
                     exact pipeline's fused top-10 (binary gains)
  recall100        — |prod fused top-100 ∩ exact fused top-100| / 100

Writes docs/quality_e2e.json. Run on TPU (the exact dense pass needs the
f32 corpus on device).
"""
import json
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from qpp_fusion_rag_tpu.data.synthetic import (
    exact_sparse_scores_host,
    zipf_bm25_csr,
    zipf_queries,
)
from qpp_fusion_rag_tpu.ops import fusion as F

ON_TPU = jax.devices()[0].platform == "tpu"
N_DOCS = 2_621_440 if ON_TPU else 65_536
DIM = 768 if ON_TPU else 64
B, K = 256, 100
P_CAP = 2048 if ON_TPU else 64
CANDIDATES = 2048 if ON_TPU else 128


def log(msg):
    print(f"[e2e] {msg}", file=sys.stderr, flush=True)


t0 = time.time()
bo, bd, bw, _ = zipf_bm25_csr(
    N_DOCS, vocab_size=100_000, avg_doc_len=30.0, seed=0,
    max_postings=80_000_000 if ON_TPU else 2_000_000)
so, sd, sw, _ = zipf_bm25_csr(
    N_DOCS, vocab_size=30_000, avg_doc_len=40.0, seed=7,
    max_postings=60_000_000 if ON_TPU else 1_500_000)
log(f"sparse indexes built {time.time()-t0:.0f}s "
    f"({len(bd)/1e6:.0f}M + {len(sd)/1e6:.0f}M postings)")

bm25_t, bm25_w = zipf_queries(bo, B, n_terms=8, seed=1)
splade_t, splade_w = zipf_queries(so, B, n_terms=16, seed=2)

# ---- exact sparse (full-depth f64 host scoring) -------------------------
t0 = time.time()
exb_s, exb_i = exact_sparse_scores_host(bo, bd, bw, bm25_t, bm25_w, N_DOCS, k=K)
exs_s, exs_i = exact_sparse_scores_host(so, sd, sw, splade_t, splade_w, N_DOCS, k=K)
log(f"exact sparse host scoring {time.time()-t0:.0f}s")

# ---- dense: exact f32 pass, then int8 production arrays -----------------
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
corpus_rows_f = jax.random.normal(k1, (N_DOCS, DIM), jnp.float32)
q_emb = jax.random.normal(k2, (B, DIM), jnp.float32)
proj = jax.random.normal(k3, (2, DIM, DIM), jnp.float32) * 0.05
tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))

from qpp_fusion_rag_tpu.ops.dense import dense_topk

t0 = time.time()
exd_s, exd_i = dense_topk(q_emb, corpus_rows_f, k=K,
                          chunk=131_072 if ON_TPU else 8192, exact=True)
exd_s.block_until_ready()
log(f"exact dense f32 top-k {time.time()-t0:.0f}s")

# exact rerank: f32 rows of the exact-BM25 candidates
qv = jnp.einsum("bd,vdw->vbw", q_emb, proj)


def exact_rerank(cand_ids):
    cand_ids = jnp.asarray(cand_ids)
    safe = jnp.maximum(cand_ids, 0)
    cand = corpus_rows_f[safe.reshape(-1)].reshape(B, K, DIM)
    s = jnp.einsum("vbd,bkd->vbk", qv, cand)
    s = jnp.where(cand_ids >= 0, s, -jnp.inf)
    order = jnp.argsort(-s, axis=-1)
    ids = jnp.broadcast_to(jnp.where(cand_ids >= 0, cand_ids, -1), s.shape)
    return (jnp.take_along_axis(s, order, axis=-1),
            jnp.take_along_axis(ids, order, axis=-1))


exr_s, exr_i = exact_rerank(exb_i)
exact_vals = np.stack([exb_s, exs_s, np.asarray(exd_s),
                       np.asarray(exr_s[0]), np.asarray(exr_s[1])])
exact_ids = np.stack([exb_i, exs_i, np.asarray(exd_i),
                      np.asarray(exr_i[0]), np.asarray(exr_i[1])])
del corpus_rows_f, exr_s, exr_i
log("exact views done")

# ---- production views (int8 dense + q8r sparse + int8 rerank) -----------
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.ops.sparse import (
    doc_vector_imp_bits,
    pack_doc_vectors,
    pack_postings,
)
from qpp_fusion_rag_tpu.pipeline.ensemble import (
    EnsembleIndexes,
    dense_view_rescored,
    dense_view_topk,
    make_sparse_scorer,
    rerank_candidates,
)

t0 = time.time()
corpus_rows_f = jax.random.normal(k1, (N_DOCS, DIM), jnp.float32)
rows_int, row_scale = jax.jit(lambda c: quantize_rows(c, axis=-1))(corpus_rows_f)
rows_bf16 = jax.jit(lambda c: c.astype(jnp.bfloat16))(corpus_rows_f)
rows_int.block_until_ready()
del corpus_rows_f
corpus_int = jnp.transpose(rows_int)
d_scale = row_scale.reshape(1, N_DOCS)
DENSE_POOL = 512 if ON_TPU else 64

bp, bs = pack_postings(bd, bw, bo)
sp, ss = pack_postings(sd, sw, so)
IMP_BITS = doc_vector_imp_bits(len(bo) - 1)
bdp, bds, _ = pack_doc_vectors(bo, bd, bw, N_DOCS, imp_bits=IMP_BITS)
sdp, sds, _ = pack_doc_vectors(so, sd, sw, N_DOCS, imp_bits=IMP_BITS)
idx = EnsembleIndexes(
    bm25_packed=jnp.asarray(bp), bm25_scales=jnp.asarray(bs),
    bm25_offsets=jnp.asarray(bo.astype(np.int32)),
    splade_packed=jnp.asarray(sp), splade_scales=jnp.asarray(ss),
    splade_offsets=jnp.asarray(so.astype(np.int32)),
    corpus_int=corpus_int, corpus_rows=rows_int, d_scale=d_scale,
    bm25_doc_packed=jnp.asarray(bdp), bm25_doc_scale=jnp.asarray(bds),
    splade_doc_packed=jnp.asarray(sdp), splade_doc_scale=jnp.asarray(sds),
)
log(f"production arrays built {time.time()-t0:.0f}s")

def production_views(mode):
    """q8 = the throughput config (int8 everything); q8r = the RANK-SAFE
    config (sparse doc-vector rescore + dense pool rescore + bf16 rows).
    CANDIDATES is rebound by the sweep loop below."""
    scorer = make_sparse_scorer(mode, CANDIDATES if mode == "q8r" else 0,
                                K, P_CAP, imp_bits=IMP_BITS)
    pb_s, pb_i = scorer(idx.bm25_packed, idx.bm25_offsets, idx.bm25_scales,
                        jnp.asarray(bm25_t), jnp.asarray(bm25_w),
                        idx.bm25_doc_packed, idx.bm25_doc_scale)
    ps_s, ps_i = scorer(idx.splade_packed, idx.splade_offsets,
                        idx.splade_scales,
                        jnp.asarray(splade_t), jnp.asarray(splade_w),
                        idx.splade_doc_packed, idx.splade_doc_scale)
    if mode == "q8r":
        pd_s, pd_i = dense_view_rescored(
            q_emb, idx.corpus_int, idx.d_scale, rows_bf16, K, DENSE_POOL)
        pr_s, pr_i = rerank_candidates(qv, pb_i, rows_bf16, idx.d_scale)
    else:
        pd_s, pd_i = dense_view_topk(q_emb, idx.corpus_int, idx.d_scale, K)
        pr_s, pr_i = rerank_candidates(qv, pb_i, idx.corpus_rows, idx.d_scale)
    return (np.stack([np.asarray(pb_s), np.asarray(ps_s), np.asarray(pd_s),
                      np.asarray(pr_s[0]), np.asarray(pr_s[1])]),
            np.stack([np.asarray(pb_i), np.asarray(ps_i), np.asarray(pd_i),
                      np.asarray(pr_i[0]), np.asarray(pr_i[1])]))


CAND_LEVELS = (1024, 2048, 4096) if ON_TPU else (128,)
prod_by_cand = {}
for c in CAND_LEVELS:
    CANDIDATES = c
    prod_by_cand[c] = production_views("q8r")
    log(f"q8r views done at candidates={c}")
prod_vals, prod_ids = prod_by_cand[CAND_LEVELS[-1] if len(CAND_LEVELS) == 1
                                   else 2048]
q8_vals, q8_ids = production_views("q8")
log("production views done (q8r sweep + q8)")

# ---- per-view recall diagnostics ----------------------------------------
VIEWS = ["bm25", "splade", "dense", "rerank1", "rerank2"]
view_rows = {}
for v, name in enumerate(VIEWS):
    r10 = np.mean([len(set(prod_ids[v, i, :10]) & set(exact_ids[v, i, :10])) / 10
                   for i in range(B)])
    r100 = np.mean([len(set(prod_ids[v, i]) & set(exact_ids[v, i])) / 100
                    for i in range(B)])
    view_rows[name] = {"recall@10": round(float(r10), 4),
                       "recall@100": round(float(r100), 4)}
log(f"per-view: {view_rows}")

# ---- QPP + all 9 fusion methods on both pipelines -----------------------
from qpp_fusion_rag_tpu.models.mlp import init_mlp_params, mlp_apply
from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs

mlp_params = init_mlp_params(jax.random.PRNGKey(7), [5 * 13, 32, 16, 5])


CAL_STATS = None  # frozen from the exact pipeline below


def fuse_all(vals, ids):
    vals = jnp.asarray(vals)
    ids = jnp.asarray(ids)
    qpp = qpp_from_runs(vals, ids, tf, stats=CAL_STATS)
    norm = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)
    uniform = jnp.ones_like(qpp[..., 5])
    rsd = qpp[..., 5]
    R, Bq, M = qpp.shape
    feats = jnp.transpose(qpp, (1, 0, 2)).reshape(Bq, R * M)
    learned = jax.nn.softmax(mlp_apply(mlp_params, feats), axis=-1).T
    out = {}
    for wname, w in (("", uniform), ("w_", rsd), ("learned_", learned)):
        for mname, m in (("combsum", F.COMBSUM), ("combmnz", F.COMBMNZ),
                         ("rrf", F.RRF)):
            fid, _ = F.fuse_kernel(ids, norm, w, method=m,
                                   minmax_norm=False, k_out=K)
            out[wname + mname] = np.asarray(fid)
    return out, np.asarray(qpp)


# production recommendation (docs/qpp_norm_sensitivity.json): normalize
# QPP against FROZEN calibration stats, not the serving batch — freeze
# them from the exact pipeline's raw QPP and use for every variant
from qpp_fusion_rag_tpu.ops import qpp as Q

CAL_STATS = Q.qpp_calibration_stats(qpp_from_runs(
    jnp.asarray(exact_vals), jnp.asarray(exact_ids), tf, normalize=False))
exact_fused, exact_qpp = fuse_all(exact_vals, exact_ids)
prod_fused, prod_qpp = fuse_all(prod_vals, prod_ids)
fused_by_cand = {c: fuse_all(*prod_by_cand[c])[0] for c in prod_by_cand}
q8_fused, _q8_qpp = fuse_all(q8_vals, q8_ids)
log("fusion done")


def ndcg10_retention(prod, exact):
    rets = []
    disc = 1.0 / np.log2(np.arange(2, 12))
    ideal = float(disc.sum())
    for i in range(B):
        rel = set(int(d) for d in exact[i, :10] if d >= 0)
        gains = np.array([1.0 if int(d) in rel else 0.0 for d in prod[i, :10]])
        rets.append(float((gains * disc[: len(gains)]).sum()) / ideal)
    return float(np.mean(rets))


methods = {}
for name in exact_fused:
    exact = exact_fused[name]
    row = {}
    variants = [("q8", q8_fused[name])] + [
        (f"q8r_c{c}", fused_by_cand[c][name]) for c in sorted(fused_by_cand)]
    for tag, fused in variants:
        r100 = np.mean([len(set(fused[i]) & set(exact[i])) / 100
                        for i in range(B)])
        row[f"ndcg10_retention_{tag}"] = round(
            ndcg10_retention(fused, exact), 4)
        row[f"recall100_{tag}"] = round(float(r100), 4)
    methods[name] = row
    log(f"{name}: {row}")

qpp_drift = np.abs(prod_qpp - exact_qpp)
out = {
    "n_docs": N_DOCS, "dim": DIM, "batch": B,
    "p_cap": P_CAP, "candidates": CANDIDATES,
    "production": ("q8r = rank-safe config (sparse doc-vector rescore + "
                   "dense pool rescore + bf16 rows); q8 = throughput "
                   "config (int8 everything)"),
    "dense_pool": DENSE_POOL,
    "qpp_normalization": "frozen calibration stats (batch-invariant)",
    "exact": "f32 full top-k dense + full-depth f64 host sparse + f32 rerank",
    "platform": jax.devices()[0].device_kind,
    "per_view": view_rows,
    "per_method": methods,
    "qpp_weight_drift": {
        "mean_abs": round(float(qpp_drift.mean()), 5),
        "p99_abs": round(float(np.quantile(qpp_drift, 0.99)), 5),
        "rsd_mean_abs": round(float(qpp_drift[..., 5].mean()), 5),
    },
    "imp_bits": IMP_BITS,
    "min_ndcg10_retention": {
        tag: round(min(m[f"ndcg10_retention_{tag}"]
                       for m in methods.values()), 4)
        for tag in ["q8"] + [f"q8r_c{c}" for c in sorted(fused_by_cand)]
    },
}
if ON_TPU:
    with open("/root/repo/docs/quality_e2e.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote docs/quality_e2e.json")
print(json.dumps(out))
