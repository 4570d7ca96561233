"""QPP kernel vs a pure-Python oracle transcribing the closed forms of the
reference bridge (reference src/qpp/java/qpp/QPPBridge.java:134-453),
including all edge conditions."""

import math

import numpy as np
import pytest

from qpp_fusion_rag_tpu.ops import qpp as Q
from qpp_fusion_rag_tpu.qpp.engine import compute_qpp, compute_qpp_for_res_file


# ---------------------------------------------------------------------------
# Oracle (direct transcription of the closed forms)
# ---------------------------------------------------------------------------

def _nqc(rsvs):
    if len(rsvs) == 0:
        return 0.0
    mean = sum(rsvs) / len(rsvs)
    return sum((r - mean) ** 2 for r in rsvs) / len(rsvs)


def oracle_qpp(query_text, scores, cutoff=50):
    if len(scores) == 0:
        return [0.0] * 13
    rsvs = scores[: min(cutoff, len(scores))]
    n = len(rsvs)
    mean = sum(rsvs) / n

    nqc = _nqc(rsvs)

    mu = mean if mean > 0 else 1.0
    smv = sum(r * abs(math.log(r / mu)) for r in rsvs if r > 0) / n

    terms = query_text.lower().split() or [""]
    num_terms = max(1, len(terms))
    baseline = 1.0 / max(0.01, mean)
    wig = sum(r - baseline for r in rsvs) / (num_terms * n)

    if n < 2:
        sigma_max = 0.0
    else:
        mx = 0.0
        for j in range(2, n + 1):
            pre = rsvs[:j]
            pm = sum(pre) / j
            mx = max(mx, math.sqrt(sum((x - pm) ** 2 for x in pre) / j))
        sigma_max = mx / math.sqrt(max(1, num_terms))

    if n < 2:
        sigma_x = 0.0
    else:
        thr = rsvs[0] * 0.5
        filt = [r for r in rsvs if r >= thr]
        if len(filt) < 2:
            sigma_x = 0.0
        else:
            fm = sum(filt) / len(filt)
            sigma_x = math.sqrt(sum((x - fm) ** 2 for x in filt) / len(filt))

    if n < 3:
        rsd = 0.0
    else:
        std = math.sqrt(nqc)
        rsd = 0.0 if std < 1e-10 else sum(((r - mean) / std) ** 3 for r in rsvs) / n

    k20 = min(20, n)
    ws = [1.0 / (math.log(i + 2) / math.log(2)) for i in range(k20)]
    uef = sum(r * w for r, w in zip(rsvs, ws)) / sum(ws)

    unique = set(terms)
    max_idf = math.log(1 + len(unique)) + math.log(1 + max(len(t) for t in unique)) * 0.5
    avg_len = sum(len(t) for t in terms) / len(terms) if terms else 3.0
    avgidf = math.log(1 + avg_len) * (len(unique) / len(terms))

    if n < 2:
        cumnqc = 0.0
    else:
        cumnqc = sum(_nqc(rsvs[:k]) for k in range(2, n + 1)) / (n - 1)

    if mean <= 0:
        snqc = 0.0
    else:
        a = b = g = 0.33
        acc = 0.0
        for r in rsvs:
            if r <= 0:
                continue
            f2 = (r - mean) ** 2 / r
            acc += (1.0**a * f2**b) ** g
        snqc = acc / n

    if n < 2:
        dense = 0.0
    else:
        rng = max(rsvs) - min(rsvs)
        dense = math.log(1 + 1.0 / rng) if rng > 0 else 0.0

    return [nqc, smv, wig, sigma_max, sigma_x, rsd, uef, max_idf, avgidf, cumnqc, snqc, dense, dense]


def kernel_one(query_text, scores, cutoff=50, K=None):
    # fixed-size bucket so jit compilation is reused across trials
    K = K or max(128, len(scores))
    mat = np.zeros((1, K), dtype=np.float32)
    mat[0, : len(scores)] = sorted(scores, reverse=True)
    n = np.array([len(scores)], dtype=np.int32)
    feats = Q.text_features_batch([query_text])
    return np.asarray(Q.qpp_kernel(mat, n, feats, cutoff=cutoff))[0]


QUERIES = [
    "what is the capital of france",
    "einstein",
    "a a a repeated terms here",
    "",
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_kernel_matches_oracle_random(rng, qi):
    q = QUERIES[qi]
    for trial in range(8):
        n = int(rng.integers(1, 80))
        scores = sorted(rng.uniform(0.01, 10.0, size=n).tolist(), reverse=True)
        ours = kernel_one(q, scores)
        ref = oracle_qpp(q, scores)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_edge_cases():
    q = "test query"
    # single score: SigmaMax/SigmaX/RSD/cumnqc/dense all 0
    ours = kernel_one(q, [5.0])
    ref = oracle_qpp(q, [5.0])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)
    assert ours[3] == 0 and ours[4] == 0 and ours[5] == 0 and ours[9] == 0 and ours[11] == 0

    # two equal scores: variance 0, dense range 0
    ours = kernel_one(q, [2.0, 2.0])
    ref = oracle_qpp(q, [2.0, 2.0])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)

    # scores containing zeros / negatives (smv & snqc skip non-positive)
    scores = [3.0, 1.0, 0.0, -1.0]
    np.testing.assert_allclose(kernel_one(q, scores), oracle_qpp(q, scores), rtol=1e-4, atol=1e-5)

    # all-negative mean -> snqc 0
    scores = [-1.0, -2.0, -3.0]
    ours, ref = kernel_one(q, scores), oracle_qpp(q, scores)
    assert ours[10] == 0.0
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=1e-5)  # f32 log precision


def test_cutoff_truncation(rng):
    q = "cutoff check"
    scores = sorted(rng.uniform(0, 1, 120).tolist(), reverse=True)
    ours = kernel_one(q, scores, cutoff=50)
    ref = oracle_qpp(q, scores, cutoff=50)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    # cutoff actually bites: differs from uncut
    ref_uncut = oracle_qpp(q, scores, cutoff=200)
    assert not np.allclose(ref, ref_uncut)


def test_text_features_empty_and_java_split():
    assert Q.text_features("") == (1.0, 1.0, 0.0, 0.0)
    nt, nu, ml, al = Q.text_features("Hello hello WORLD")
    assert (nt, nu, ml) == (3.0, 2.0, 5.0)
    assert al == pytest.approx(5.0)


@pytest.mark.slow
def test_engine_normalization_and_files(tmp_path, rng):
    # build a fake .res with 3 queries
    lines = []
    for qid in ["1", "2", "3"]:
        for i in range(30):
            lines.append(f"{qid} Q0 d{i} {i + 1} {float(30 - i) + rng.uniform(0, .1):.4f} run")
    res = tmp_path / "X.res"
    res.write_text("\n".join(lines) + "\n")
    out = tmp_path / "X.res.mmnorm.qpp"
    results = compute_qpp_for_res_file(res, out)
    assert out.exists()
    arr = np.array([results[q] for q in results])
    assert arr.shape == (3, 13)
    assert arr.min() >= 0.0 and arr.max() <= 1.0 + 1e-6  # minmax normalized

    raw = compute_qpp({"1": [3.0, 2.0, 1.0]}, normalize="none")
    np.testing.assert_allclose(raw["1"], oracle_qpp("1", [3.0, 2.0, 1.0]), rtol=5e-4, atol=1e-5)


def test_runtensor_path_matches_file_path(rng):
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.qpp.engine import compute_qpp_for_runtensor, qpp_tensor_to_dict

    runs = {}
    for r in range(2):
        run = {}
        for q in range(1, 5):
            n = int(rng.integers(3, 20))
            ss = sorted(rng.uniform(0, 5, n).tolist(), reverse=True)
            run[str(q)] = [(f"d{i}", s, i + 1) for i, s in enumerate(ss)]
        runs[f"R{r}"] = run
    rt = RunTensor.from_run_dicts(runs)
    texts = {str(q): f"query {q}" for q in range(1, 5)}
    qpp3 = compute_qpp_for_runtensor(rt, texts)
    assert qpp3.shape == (2, 4, 13)

    # same numbers as the per-file path
    for r, name in enumerate(rt.retrievers):
        per_file = compute_qpp({q: [s for _, s, _ in runs[name][q]] for q in texts}, texts)
        for qi, qid in enumerate(rt.qids):
            np.testing.assert_allclose(qpp3[r, qi], per_file[qid], rtol=2e-4, atol=1e-5)

    d = qpp_tensor_to_dict(qpp3, rt.qids, rt.retrievers)
    assert d["1"]["R0"] == qpp3[0, 0].tolist()
