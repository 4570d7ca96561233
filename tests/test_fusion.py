"""Fusion kernel tests: device segmented-aggregation vs a pure-Python oracle
implementing the reference's per-query dict accumulation semantics
(reference src/fusion.py:170-380)."""

import numpy as np
import pytest

from qpp_fusion_rag_tpu.data.runtensor import RunTensor
from qpp_fusion_rag_tpu.fusion import engine as E


# ---------------------------------------------------------------------------
# Pure-python oracle (dict accumulation, reference semantics)
# ---------------------------------------------------------------------------

def oracle_fuse(runs, weights, method, rrf_k=60, minmax=False):
    """runs: {ranker: {qid: [(doc, score, rank)]}}; weights: {(qid, ranker): w}."""
    qids = sorted({q for r in runs.values() for q in r})
    out = {}
    for qid in qids:
        doc_scores, doc_counts = {}, {}
        for ranker, run in sorted(runs.items()):
            entries = run.get(qid, [])
            if minmax and entries:
                ss = [s for _, s, _ in entries]
                mn, mx = min(ss), max(ss)
                rng = mx - mn if mx > mn else 1.0
                entries = [(d, (s - mn) / rng, r) for d, s, r in entries]
            w = weights.get((qid, ranker), 1.0)
            for doc, score, rank in entries:
                if method == "rrf":
                    doc_scores[doc] = doc_scores.get(doc, 0.0) + w / (rrf_k + rank)
                else:
                    doc_scores[doc] = doc_scores.get(doc, 0.0) + w * score
                doc_counts[doc] = doc_counts.get(doc, 0) + 1
        if method == "combmnz":
            doc_scores = {d: s * doc_counts[d] for d, s in doc_scores.items()}
        out[qid] = sorted(doc_scores.items(), key=lambda x: (-x[1], x[0]))
    return out


def random_runs(rng, R=4, Q=6, max_k=8, n_docs=15):
    runs = {}
    for r in range(R):
        run = {}
        for q in range(1, Q + 1):
            k = int(rng.integers(1, max_k + 1))
            docs = rng.choice(n_docs, size=k, replace=False)
            scores = np.sort(rng.uniform(0, 1, size=k))[::-1]
            run[str(q)] = [(f"d{d}", float(s), i + 1) for i, (d, s) in enumerate(zip(docs, scores))]
        runs[f"R{r}"] = run
    return runs


def assert_matches_oracle(fused_rt, oracle, atol=1e-5):
    got = fused_rt.to_run_dict(0)
    for qid, expected in oracle.items():
        g = got[qid]
        assert len(g) == len(expected), f"qid {qid}: {len(g)} vs {len(expected)}"
        exp_scores = {d: s for d, s in expected}
        for doc, score in g:
            assert score == pytest.approx(exp_scores[doc], abs=atol), f"qid {qid} doc {doc}"
        # rank order by score must match (modulo ties)
        gs = [s for _, s in g]
        assert all(gs[i] >= gs[i + 1] - 1e-6 for i in range(len(gs) - 1))


@pytest.mark.parametrize("method", ["combsum", "combmnz", "rrf"])
def test_unweighted_matches_oracle(rng, method):
    runs = random_runs(rng)
    rt = RunTensor.from_run_dicts(runs)
    fused = getattr(E, method)(rt)
    # unweighted sum/mnz apply ranx-style per-run min-max norm
    oracle = oracle_fuse(runs, {}, method, minmax=(method != "rrf"))
    assert_matches_oracle(fused, oracle)


@pytest.mark.parametrize("method", ["combsum", "combmnz", "rrf"])
def test_weighted_matches_oracle(rng, method):
    runs = random_runs(rng)
    rt = RunTensor.from_run_dicts(runs)
    qpp_data = {
        str(q): {f"R{r}": list(rng.uniform(0, 1, 13)) for r in range(4)}
        for q in range(1, 7)
    }
    idx = 5
    weights = {
        (qid, ranker): qpp_data[qid][ranker][idx]
        for qid in qpp_data
        for ranker in qpp_data[qid]
    }
    fn = {"combsum": E.weighted_combsum, "combmnz": E.weighted_combmnz, "rrf": E.weighted_rrf}[method]
    fused = fn(rt, qpp_data, qpp_index=idx)
    oracle = oracle_fuse(runs, weights, method, minmax=False)
    assert_matches_oracle(fused, oracle)


def test_fusion_mode_average_weight():
    qpp = {"1": {"A": [0.2] * 13, "B": [0.6] * 13}}
    assert E.get_qpp_weight("1", "A", qpp, qpp_index=-1) == pytest.approx(0.2)
    assert E.get_qpp_weight("1", "B", qpp, fusion_mode=True) == pytest.approx(0.6)
    with pytest.raises(KeyError):
        E.get_qpp_weight("2", "A", qpp)
    with pytest.raises(KeyError):
        E.get_qpp_weight("1", "C", qpp)
    with pytest.raises(IndexError):
        E.get_qpp_weight("1", "A", qpp, qpp_index=13)


def test_rrf_known_values():
    # Two rankers, one query. d1 rank1 in both; d2 rank2 in R1 only.
    runs = {
        "R1": {"1": [("d1", 0.9, 1), ("d2", 0.1, 2)]},
        "R2": {"1": [("d1", 0.8, 1)]},
    }
    rt = RunTensor.from_run_dicts(runs)
    fused = E.rrf(rt, k=60).to_run_dict(0)["1"]
    scores = dict(fused)
    assert scores["d1"] == pytest.approx(2 / 61, abs=1e-6)
    assert scores["d2"] == pytest.approx(1 / 62, abs=1e-6)


def test_learned_fusion_uniform_model():
    class UniformModel:
        def predict(self, X):
            return np.full((X.shape[0], 2), 0.5, dtype=np.float32)

    runs = {
        "A": {"1": [("d1", 1.0, 1), ("d2", 0.5, 2)]},
        "B": {"1": [("d2", 1.0, 1)]},
    }
    rt = RunTensor.from_run_dicts(runs)
    qpp = {"1": {"A": [0.1] * 13, "B": [0.2] * 13}}
    fused = E.learned_fusion(rt, qpp, UniformModel()).to_run_dict(0)["1"]
    scores = dict(fused)
    # d2: 0.5*0.5 + 0.5*1.0 = 0.75 ; d1: 0.5*1.0 = 0.5
    assert scores["d2"] == pytest.approx(0.75)
    assert scores["d1"] == pytest.approx(0.5)
    assert fused[0][0] == "d2"


def test_run_fusion_dispatcher(tmp_path, rng):
    runs = random_runs(rng, R=2, Q=3)
    rt = RunTensor.from_run_dicts(runs)
    qpp = {
        str(q): {f"R{r}": list(rng.uniform(0, 1, 13)) for r in range(2)}
        for q in range(1, 4)
    }
    out = tmp_path / "fused.res"
    fused = E.run_fusion("wcombsum", rt, qpp, qpp_model="RSD", output_path=out)
    assert out.exists()
    assert fused.retrievers == ["wcombsum-rsd"]
    lines = out.read_text().splitlines()
    assert lines[0].split()[3] == "1"  # rank column re-assigned

    with pytest.raises(ValueError):
        E.run_fusion("wrrf", rt, None)
    with pytest.raises(ValueError):
        E.run_fusion("nope", rt, qpp)


def test_padding_ignored():
    # A query missing from one ranker must not contribute phantom docs.
    runs = {
        "A": {"1": [("d1", 1.0, 1)], "2": [("d9", 1.0, 1)]},
        "B": {"1": [("d1", 0.5, 1)]},
    }
    rt = RunTensor.from_run_dicts(runs)
    fused = E.combsum(rt).to_run_dict(0)
    assert [d for d, _ in fused["2"]] == ["d9"]
    assert len(fused["1"]) == 1  # only d1


def test_fuse_edge_shapes():
    """K=1, R=1, and all-padding rows flow through the fusion kernel."""
    import jax.numpy as jnp

    from qpp_fusion_rag_tpu.ops import fusion as F

    # R=1, K=1: identity fusion
    ids = jnp.asarray([[[3]], [[5]]]).transpose(1, 0, 2)  # [R=1, Q=2, K=1]
    scores = jnp.asarray([[[0.5]], [[0.7]]]).transpose(1, 0, 2)
    fi, fs = F.fuse(ids, scores, method="combsum", k_out=1)
    assert np.asarray(fi).tolist() == [[3], [5]]

    # one query entirely padded
    ids2 = np.full((2, 2, 3), -1, np.int32)
    ids2[:, 0, :] = [[1, 2, 3], [2, 3, 4]]
    sc2 = np.where(ids2 >= 0, 0.5, -np.inf).astype(np.float32)
    fi2, fs2 = F.fuse(jnp.asarray(ids2), jnp.asarray(sc2), method="rrf", k_out=4)
    assert np.all(np.asarray(fi2)[1] == -1)      # padded query -> no results
    assert np.asarray(fi2)[0, 0] >= 0
