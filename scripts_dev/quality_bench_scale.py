"""Rank-safety evidence AT BENCH SCALE (closes the round-4 advisor note:
the q8r pool sizes were only shown rank-exact on the 5,183-doc real
SciFact index). Measures, per sparse view of the calibrated 2.62M-doc
bench corpus, each engine config's recall@10/@100 against full-depth
exact host scoring on a query subsample, plus the certified mode's
behavior at k=10 vs k=100 (the synthetic Zipf corpus is tie-dense at
k=100: docs/bench_certified_ensemble.json shows certified_frac 0 there,
while the real SciFact index certifies 298/300 — this artifact records
the boundary-gap distribution that explains the difference).

Reuses cache/benchdata (bench_sparse_stages.build_view).
Writes docs/quality_bench_scale.json.

Run: python scripts_dev/quality_bench_scale.py
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

sys.path.insert(0, "/root/repo")

from scripts_dev.bench_sparse_stages import build_view, sync  # noqa: E402

from qpp_fusion_rag_tpu.data.synthetic import (  # noqa: E402
    CALIBRATED_LOGNORMAL_SIGMA,
    CALIBRATED_ZIPF_A_BM25,
    CALIBRATED_ZIPF_A_SPLADE,
    exact_sparse_scores_host,
    zipf_bm25_csr,
)

N, P_CAP, SAMPLE = 2_621_440, 2048, 128
OUT = Path("/root/repo/docs/quality_bench_scale.json")


def recall(truth_ids, got_ids, k):
    r = []
    for b in range(truth_ids.shape[0]):
        t = set(truth_ids[b, :k].tolist()) - {-1}
        g = set(got_ids[b, :k].tolist()) - {-1}
        if t:
            r.append(len(t & g) / len(t))
    return float(np.mean(r))


def main():
    from qpp_fusion_rag_tpu.ops.sparse import (
        sparse_score_topk_q8,
        sparse_score_topk_q8_certified,
        sparse_score_topk_q8_rescored,
    )

    results = {"n_docs": N, "p_cap": P_CAP, "sample_queries": SAMPLE,
               "workload": "calibrated zipf (docs/synthetic_calibration"
                           ".json)", "views": {}}
    specs = {
        "bm25": (100_000, 30.0, 0, 80_000_000, 8, 1,
                 CALIBRATED_ZIPF_A_BM25),
        "splade": (30_000, 40.0, 7, 60_000_000, 16, 2,
                   CALIBRATED_ZIPF_A_SPLADE),
    }
    for name, (vocab, alen, seed, maxp, tq, qseed, za) in specs.items():
        v = build_view(name, vocab, alen, seed, maxp, tq, qseed, za)
        imp_bits = int(v["imp_bits"])
        qt = np.asarray(v["qt"])[:SAMPLE]
        qw = np.asarray(v["qw"])[:SAMPLE]

        # full-depth exact truth needs the raw CSR (deterministic rebuild)
        t0 = time.time()
        o, dd, w, _ = zipf_bm25_csr(
            N, vocab_size=vocab, avg_doc_len=alen, seed=seed,
            max_postings=maxp, zipf_a=za,
            lognormal_sigma=CALIBRATED_LOGNORMAL_SIGMA)
        # 101 deep: the k=100 boundary gap the certificate tests is
        # scores[99] vs scores[100] (the 101st doc)
        ts, ti = exact_sparse_scores_host(o, dd, w, qt, qw, N, k=101)
        print(f"[qbs] {name}: host truth in {time.time()-t0:.0f}s",
              flush=True)
        del o, dd, w

        packed = jnp.asarray(v["packed"])
        offs = jnp.asarray(v["offsets"])
        scales = jnp.asarray(v["scales"])
        dp, ds = jnp.asarray(v["doc_packed"]), jnp.asarray(v["doc_scale"])
        tail = jnp.asarray(v["tail"])
        qtj, qwj = jnp.asarray(qt), jnp.asarray(qw)

        view = {"boundary_gap_k100_median": float(np.median(
                    (ts[:, 99] - ts[:, 100]) / np.maximum(ts[:, 0], 1e-9))),
                "boundary_gap_k10_median": float(np.median(
                    (ts[:, 9] - ts[:, 10]) / np.maximum(ts[:, 0], 1e-9))),
                "configs": {}}

        _, gi = sparse_score_topk_q8(packed, offs, scales, qtj, qwj,
                                     k=100, p_cap=P_CAP, exact_topk=True,
                                     presorted=True)
        gi = np.asarray(gi)
        view["configs"]["q8"] = {"recall@10": recall(ti, gi, 10),
                                 "recall@100": recall(ti, gi, 100)}
        for cand in (256, 512):
            _, gi = sparse_score_topk_q8_rescored(
                packed, offs, scales, dp, ds, qtj, qwj, k=100,
                p_cap=P_CAP, candidates=cand, imp_bits=imp_bits,
                presorted=True)
            gi = np.asarray(gi)
            view["configs"][f"q8r_c{cand}"] = {
                "recall@10": recall(ti, gi, 10),
                "recall@100": recall(ti, gi, 100)}
        for k in (10, 100):
            _, gi, cert, _ = sparse_score_topk_q8_certified(
                packed, offs, scales, dp, ds, qtj, qwj, k=k,
                p_cap=P_CAP, candidates=512, imp_bits=imp_bits,
                presorted=True, tail_max=tail)
            view["configs"][f"q8c_c512_k{k}"] = {
                "certified_frac": float(np.asarray(cert).mean()),
                f"recall@{k}": recall(ti, np.asarray(gi), k)}
        print(f"[qbs] {name}: "
              f"{json.dumps(view['configs'], sort_keys=True)}", flush=True)
        results["views"][name] = view

    OUT.write_text(json.dumps(results, indent=1))
    print("wrote", OUT)


if __name__ == "__main__":
    main()
