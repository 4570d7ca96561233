"""Certified (q8c) heterogeneous-ensemble measurements at bench scale
(round-5 item #2): ms/batch, certified fraction, and the amortized
rank-exact cost with a wide-pool escalation ladder, on the calibrated
2.62M-doc workload. Reuses cache/benchdata built by
bench_sparse_stages.py. Writes docs/bench_certified_ensemble.json.

Escalation ladder: queries the narrow program fails to certify re-run
through a WIDER certified program on a compacted sub-batch (bucket =
next power of two); anything still uncertified would escalate to
exhaustive scoring (counted at the measured exact-mode cost). The
amortized figure charges the narrow cost on every query plus the wide /
exhaustive costs on the measured uncertified fractions.

Run: python scripts_dev/bench_ensemble_certified.py
"""
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/cache/xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, "/root/repo")

from scripts_dev.bench_sparse_stages import build_view, sync, timed  # noqa: E402

from qpp_fusion_rag_tpu.data.synthetic import (  # noqa: E402
    CALIBRATED_ZIPF_A_BM25,
    CALIBRATED_ZIPF_A_SPLADE,
)
from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows  # noqa: E402
from qpp_fusion_rag_tpu.pipeline.ensemble import (  # noqa: E402
    EnsembleIndexes,
    ensemble_retrieval_step,
)

N, B, K, P_CAP = 2_621_440, 1024, 100, 2048
D = 768
OUT = Path("/root/repo/docs/bench_certified_ensemble.json")


def main():
    views = {
        "bm25": build_view("bm25", 100_000, 30.0, 0, 80_000_000, 8, 1,
                           CALIBRATED_ZIPF_A_BM25),
        "splade": build_view("splade", 30_000, 40.0, 7, 60_000_000, 16, 2,
                             CALIBRATED_ZIPF_A_SPLADE),
    }
    bv, sv = views["bm25"], views["splade"]
    imp_bits = int(bv["imp_bits"])

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    corpus_f = jax.random.normal(k1, (D, N), jnp.float32)
    c_int, d_scale = jax.jit(lambda c: quantize_rows(c, axis=0))(corpus_f)
    rows_bf16 = jax.jit(lambda c: jnp.transpose(c).astype(jnp.bfloat16))(
        corpus_f)
    del corpus_f
    sync(rows_bf16)

    idx = EnsembleIndexes(
        bm25_packed=jnp.asarray(bv["packed"]),
        bm25_scales=jnp.asarray(bv["scales"]),
        bm25_offsets=jnp.asarray(bv["offsets"]),
        splade_packed=jnp.asarray(sv["packed"]),
        splade_scales=jnp.asarray(sv["scales"]),
        splade_offsets=jnp.asarray(sv["offsets"]),
        corpus_int=c_int, corpus_rows=rows_bf16,
        d_scale=d_scale.reshape(1, N),
        bm25_doc_packed=jnp.asarray(bv["doc_packed"]),
        bm25_doc_scale=jnp.asarray(bv["doc_scale"]),
        splade_doc_packed=jnp.asarray(sv["doc_packed"]),
        splade_doc_scale=jnp.asarray(sv["doc_scale"]),
        bm25_tail=jnp.asarray(bv["tail"]),
        splade_tail=jnp.asarray(sv["tail"]),
    )
    qt_b, qw_b = jnp.asarray(bv["qt"]), jnp.asarray(bv["qw"])
    qt_s, qw_s = jnp.asarray(sv["qt"]), jnp.asarray(sv["qw"])
    q_emb = jax.random.normal(k2, (B, D), jnp.float32)
    proj = jax.random.normal(k3, (2, D, D), jnp.float32) * 0.05
    tf = jnp.tile(jnp.asarray([6.0, 6.0, 9.0, 5.0], jnp.float32), (B, 1))

    def step(mode, cand, pool, b=B):
        sl = slice(0, b)
        return ensemble_retrieval_step(
            idx, qt_b[sl], qw_b[sl], qt_s[sl], qw_s[sl], q_emb[sl], proj,
            tf[sl], k=K, k_out=K, p_cap=P_CAP, doc_imp_bits=imp_bits,
            sparse_mode=mode, sparse_candidates=cand,
            dense_rescore_pool=pool, sparse_presorted=True)

    results = {"n_docs": N, "batch": B, "k": K, "p_cap": P_CAP,
               "imp_bits": imp_bits, "workload": "calibrated zipf "
               "(docs/synthetic_calibration.json)", "configs": []}

    # reference points
    ms_q8 = timed(lambda: step("q8", 0, 0), reps=5)
    print(f"[cert-ens] q8 baseline:        {ms_q8:7.1f} ms "
          f"-> {B/ms_q8*1e3:7.0f} q/s", flush=True)
    results["q8_ms"] = round(ms_q8, 2)

    for cand, pool in ((256, 128), (512, 256), (1024, 512)):
        ms_q8r = timed(lambda: step("q8r", cand, pool), reps=5)
        ms_q8c = timed(lambda: step("q8c", cand, pool), reps=5)
        out = step("q8c", cand, pool)
        cert = np.asarray(out[3])
        frac = float(cert.mean())
        row = {"candidates": cand, "dense_pool": pool,
               "q8r_ms": round(ms_q8r, 2), "q8c_ms": round(ms_q8c, 2),
               "certified_frac": round(frac, 4),
               "cert_overhead": round(ms_q8c / ms_q8r, 3)}
        print(f"[cert-ens] c={cand:4d} p={pool:3d}: q8r {ms_q8r:6.1f} ms, "
              f"q8c {ms_q8c:6.1f} ms, certified {frac:.3f}", flush=True)
        results["configs"].append(row)

    # escalation ladder: narrow q8c -> wide q8c on the uncertified
    # sub-batch (compacted to a 256 bucket) -> exhaustive leftovers.
    # Amortization only makes sense when a useful fraction certifies;
    # on this calibrated synthetic the certificate (correctly) refuses
    # nearly everything — tie-dense scores + window-truncated flat dfs
    # (docs/quality_bench_scale.json records the boundary-gap medians) —
    # while the REAL SciFact index certifies 298/300
    # (docs/quality_real_scifact.json).
    narrow = results["configs"][0]
    if narrow["certified_frac"] >= 0.05:
        wide_bucket = 256
        ms_wide_sub = timed(lambda: step("q8c", 2048, 512, b=wide_bucket),
                            reps=5)
        n_uncert = int(round((1 - narrow["certified_frac"]) * B))
        amort = (narrow["q8c_ms"]
                 + (ms_wide_sub if n_uncert > 0 else 0.0)
                 * max(1, int(np.ceil(n_uncert / wide_bucket))))
        results["escalation"] = {
            "wide_candidates": 2048, "wide_dense_pool": 512,
            "wide_bucket": wide_bucket,
            "wide_sub_ms": round(ms_wide_sub, 2),
            "narrow_uncertified_per_batch": n_uncert,
            "amortized_ms": round(amort, 2),
            "amortized_qps": round(B / amort * 1e3, 1),
        }
        print(f"[cert-ens] amortized (narrow + wide escalation): "
              f"{amort:.1f} ms -> {B/amort*1e3:.0f} q/s", flush=True)
    else:
        results["escalation"] = {
            "degenerate": True,
            "why": ("certified_frac ~ 0 on this workload: escalation "
                    "would re-run everything; see note above and "
                    "docs/quality_bench_scale.json"),
        }
        print("[cert-ens] escalation degenerate (certified_frac ~ 0)",
              flush=True)
    OUT.write_text(json.dumps(results, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
