"""QPP batch-normalization sensitivity (VERDICT r2 task 7).

The flagship serving steps min-max QPP across the SERVING batch; the
reference normalizes across the whole query set (src/qpp.py:340-374).
Since retrieval views are per-query deterministic, batch size affects the
fused output ONLY through the normalization extrema — so this measures
the drift exactly: compute raw QPP once for a full query set at NQ scale,
then fuse under (a) full-set normalization [reference semantics],
(b) per-batch normalization at B ∈ {64, 256, 1024}, (c) frozen
calibration stats (qpp_calibration_stats) — the batch-size-invariant
production option.

Reported per scheme: nDCG@10 retention of the fused list vs the full-set
reference (binary gains), fraction of queries with an identical fused
top-10, and mean |Δweight| on the RSD column. Writes
docs/qpp_norm_sensitivity.json.
"""
import json
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.ops import qpp as Q
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs, weight_and_fuse

ON_TPU = jax.devices()[0].platform == "tpu"
N_DOCS = 2_621_440 if ON_TPU else 16_384
DIM = 768 if ON_TPU else 32
R, K = 5, 100
Q_TOTAL = 3456 if ON_TPU else 256          # ~NQ query-set size (3452)
BATCHES = (64, 256, 1024) if ON_TPU else (16, 64)
QPP_IDX = 5  # RSD


def log(m):
    print(f"[qppnorm] {m}", file=sys.stderr, flush=True)


key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
corpus_f = jax.random.normal(k1, (DIM, N_DOCS), jnp.float32)
c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
d_scale = d_scale.reshape(1, N_DOCS)
del corpus_f
view_proj = jax.random.normal(k3, (R, DIM, DIM), jnp.float32) * 0.05
q_all = jax.random.normal(k2, (Q_TOTAL, DIM), jnp.float32)
tf_all = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (Q_TOTAL, 1))

# ---- views + RAW qpp for the whole set (chunked) ------------------------
t0 = time.time()
vals_l, ids_l, raw_l = [], [], []
CH = 1152 if ON_TPU else 64
for lo in range(0, Q_TOTAL, CH):
    q = q_all[lo:lo + CH]
    tf = tf_all[lo:lo + CH]
    if ON_TPU:
        from qpp_fusion_rag_tpu.ops.pallas.dense_topk import (
            pallas_multi_view_topk_int8,
        )

        v, i = pallas_multi_view_topk_int8(q, view_proj, c_int, d_scale, k=K)
    else:
        from qpp_fusion_rag_tpu.ops.dense import multi_view_topk

        v, i = multi_view_topk(
            q, view_proj, jnp.transpose(c_int).astype(jnp.float32)
            * d_scale.reshape(-1, 1), k=K, chunk=8192)
    raw = qpp_from_runs(v, i, tf, normalize=False)
    vals_l.append(np.asarray(v))
    ids_l.append(np.asarray(i))
    raw_l.append(np.asarray(raw))
vals = jnp.asarray(np.concatenate(vals_l, axis=1))
ids = jnp.asarray(np.concatenate(ids_l, axis=1))
qpp_raw = jnp.asarray(np.concatenate(raw_l, axis=1))      # [R, Q, 13]
log(f"views + raw QPP for {Q_TOTAL} queries: {time.time()-t0:.0f}s")

norm_scores = F._row_minmax(vals, ids >= 0, fill=-jnp.inf)


def fuse_with_weights(w):
    fid, _ = weight_and_fuse(ids, norm_scores, jnp.asarray(w), k_out=K)
    return np.asarray(fid)


# reference: full-set normalization
qpp_full = np.asarray(Q.normalize_qpp_with(qpp_raw, None))
ref_fused = fuse_with_weights(qpp_full[..., QPP_IDX])
ref_w = qpp_full[..., QPP_IDX]

disc = 1.0 / np.log2(np.arange(2, 12))
ideal = float(disc.sum())


def compare(fused, w):
    rets, same = [], 0
    for i in range(Q_TOTAL):
        rel = set(int(d) for d in ref_fused[i, :10] if d >= 0)
        gains = np.array([1.0 if int(d) in rel else 0.0
                          for d in fused[i, :10]])
        rets.append(float((gains * disc).sum()) / ideal)
        if np.array_equal(fused[i, :10], ref_fused[i, :10]):
            same += 1
    return {
        "ndcg10_retention_vs_fullset": round(float(np.mean(rets)), 5),
        "identical_top10_frac": round(same / Q_TOTAL, 4),
        "rsd_weight_mean_abs_drift": round(
            float(np.mean(np.abs(w - ref_w))), 5),
    }


rows = {}
for B in BATCHES:
    w = np.zeros_like(ref_w)
    for lo in range(0, Q_TOTAL, B):
        sl = np.asarray(
            Q.normalize_qpp_with(qpp_raw[:, lo:lo + B, :], None))
        w[:, lo:lo + B] = sl[..., QPP_IDX]
    rows[f"in_batch_B{B}"] = compare(fuse_with_weights(w), w)
    log(f"B={B}: {rows[f'in_batch_B{B}']}")

# frozen calibration stats from the full set -> invariant at ANY batch size
stats = Q.qpp_calibration_stats(qpp_raw)
w_cal = np.zeros_like(ref_w)
for B in (BATCHES[0],):                     # batch size provably irrelevant
    for lo in range(0, Q_TOTAL, B):
        sl = np.asarray(Q.normalize_qpp_with(qpp_raw[:, lo:lo + B, :], stats))
        w_cal[:, lo:lo + B] = sl[..., QPP_IDX]
rows["calibration_stats"] = compare(fuse_with_weights(w_cal), w_cal)
log(f"calibration: {rows['calibration_stats']}")

out = {
    "n_docs": N_DOCS, "dim": DIM, "q_total": Q_TOTAL,
    "platform": jax.devices()[0].device_kind,
    "reference": "full-query-set min-max (src/qpp.py:340-374 semantics)",
    "schemes": rows,
    "note": ("calibration_stats == full-set here by construction (stats "
             "frozen from the same set); its value is batch-size "
             "invariance at serving time — pass qpp_norm_stats to the "
             "serving steps"),
}
if ON_TPU:
    with open("/root/repo/docs/qpp_norm_sensitivity.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote docs/qpp_norm_sensitivity.json")
print(json.dumps(out))
