import pytest
import numpy as np

from qpp_fusion_rag_tpu.data import (
    DocVocab,
    LazyCorpus,
    RunTensor,
    load_qpp_scores,
    load_queries,
    load_qrels,
    load_run_file,
)
from qpp_fusion_rag_tpu.data.loaders import write_run_file, write_qpp_file, load_qpp_file


def test_lazy_corpus(tmp_dataset):
    corpus = LazyCorpus(tmp_dataset / "corpus.jsonl")
    assert len(corpus) == 20
    assert corpus.get("d3")["text"].startswith("body text number 3")
    assert corpus.get_text("d3").startswith("title 3 body")
    many = corpus.get_many(["d7", "d1", "d19"])
    assert set(many) == {"d7", "d1", "d19"}
    assert corpus.get("nope") is None


def test_queries_split_filter(tmp_dataset):
    qs = load_queries(tmp_dataset, split="test")
    assert set(qs) == {"1", "2", "3", "4", "5"}
    assert qs["2"] == "query about number 2"


def test_qrels(tmp_dataset):
    qrels = load_qrels(tmp_dataset / "qrels" / "test.tsv")
    assert qrels["1"]["d1"] == 1
    assert qrels["1"]["d6"] == 2
    assert len(qrels) == 5


def test_trec_roundtrip(tmp_path):
    run = {
        "2": [("dB", 0.5), ("dA", 1.5)],
        "10": [("dC", 3.0)],
        "1": [("dA", 2.0), ("dC", 0.25)],
    }
    path = tmp_path / "x.res"
    write_run_file(run, path, tag="t")
    text = path.read_text().splitlines()
    # numeric qid order, rank re-assigned by score desc
    assert text[0] == "1 Q0 dA 1 2.000000 t"
    assert text[1] == "1 Q0 dC 2 0.250000 t"
    assert text[2] == "2 Q0 dA 1 1.500000 t"
    assert text[4] == "10 Q0 dC 1 3.000000 t"
    back = load_run_file(path)
    assert back["2"][0] == ("dA", 1.5, 1)
    assert back["2"][1] == ("dB", 0.5, 2)


def test_qpp_file_roundtrip(tmp_path):
    results = {"3": [0.1] * 13, "1": list(np.linspace(0, 1, 13))}
    path = tmp_path / "R.res.mmnorm.qpp"
    write_qpp_file(results, path)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("1\t")
    back = load_qpp_file(path)
    assert len(back["1"]) == 13
    np.testing.assert_allclose(back["3"], results["3"], atol=1e-6)
    # directory loader keys by retriever name
    data = load_qpp_scores(tmp_path)
    assert data["1"]["R"][0] == back["1"][0]


def test_reference_qpp_files_parse():
    data = load_qpp_scores("/root/reference/data/scifact/qpp")
    assert len(data) == 300
    some_qid = next(iter(data))
    assert set(data[some_qid]) == {"BGE", "BM25", "BM25_MonoT5", "BM25_TCT", "Splade"}
    assert all(len(v) == 13 for v in data[some_qid].values())
    # minmax-normalized: all within [0, 1]
    arr = np.array([v for q in data.values() for v in q.values()])
    assert arr.min() >= 0.0 and arr.max() <= 1.0 + 1e-9


def test_docvocab():
    v = DocVocab(["a", "b"])
    assert v.id_of("a") == 0
    assert v.add("b") == 1
    assert v.add("c") == 2
    ids = v.encode(["c", "missing"], add=False)
    assert ids.tolist() == [2, -1]
    assert v.decode([2, -1, 0]) == ["c", "", "a"]


def test_runtensor_build_and_export(tmp_path):
    runs = {
        "R1": {"1": [("a", 3.0, 1), ("b", 2.0, 2)], "2": [("c", 9.0, 1)]},
        "R2": {"1": [("b", 5.0, 1)], "2": [("a", 1.0, 1), ("d", 0.5, 2)]},
    }
    rt = RunTensor.from_run_dicts(runs)
    assert rt.R == 2 and rt.Q == 2 and rt.K == 2
    assert rt.retrievers == ["R1", "R2"]
    assert rt.valid_counts.tolist() == [[2, 1], [1, 2]]
    # padding
    assert rt.doc_ids[0, 1, 1] == -1
    assert rt.scores[0, 1, 1] == -np.inf

    norm = rt.minmax_normalized()
    assert norm.scores[0, 0, 0] == 1.0 and norm.scores[0, 0, 1] == 0.0
    # single-entry row -> (s - s)/1 = 0
    assert norm.scores[0, 1, 0] == 0.0

    # TREC round trip preserves content
    out = tmp_path / "R1.res"
    rt.write_trec("R1", out)
    rt2 = RunTensor.from_run_dicts({"R1": load_run_file(out)}, vocab=rt.vocab)
    assert rt2.to_run_dict("R1") == rt.to_run_dict("R1")


def test_runtensor_trec_dir(tmp_path):
    write_run_file({"1": [("a", 1.0), ("b", 0.5)]}, tmp_path / "X.norm.res")
    write_run_file({"1": [("b", 2.0)]}, tmp_path / "Y.norm.res")
    write_run_file({"1": [("zz", 9.0)]}, tmp_path / "Y.res")  # must be ignored
    rt = RunTensor.from_trec_dir(tmp_path, use_normalized=True)
    assert rt.retrievers == ["X", "Y"]
    assert rt.Q == 1 and rt.K == 2
    assert "zz" not in rt.vocab


def test_load_run_file_accepts_tagless_lines(tmp_path):
    p = tmp_path / "r.res"
    p.write_text("q1 Q0 d1 1 2.5\nq1 Q0 d2 2 1.5 tagged\n")
    from qpp_fusion_rag_tpu.data.loaders import load_run_file

    run = load_run_file(p)
    assert run["q1"] == [("d1", 2.5, 1), ("d2", 1.5, 2)]


def test_load_queries_rejects_empty_qrels(tmp_path):
    import json

    (tmp_path / "qrels").mkdir()
    (tmp_path / "queries.jsonl").write_text(json.dumps({"_id": "1", "text": "x"}) + "\n")
    (tmp_path / "qrels" / "test.tsv").write_text("query-id\tcorpus-id\tscore\n")
    from qpp_fusion_rag_tpu.data.loaders import load_queries

    with pytest.raises(ValueError, match="no qids"):
        load_queries(tmp_path)


def test_runtensor_enforces_score_desc(tmp_path):
    """Rows re-sort by score desc even if the rank column disagrees."""
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor

    runs = {"r0": {"q1": [("a", 0.2, 1), ("b", 0.9, 2), ("c", 0.5, 3)]}}
    rt = RunTensor.from_run_dicts(runs)
    np.testing.assert_allclose(rt.scores[0, 0], [0.9, 0.5, 0.2])
    assert rt.vocab.decode(rt.doc_ids[0, 0]) == ["b", "c", "a"]


def test_minmax_no_warning_on_padded_rows(recwarn):
    from qpp_fusion_rag_tpu.data.runtensor import RunTensor
    from qpp_fusion_rag_tpu.data.vocab import DocVocab

    vocab = DocVocab()
    vocab.add("d0")
    doc_ids = np.array([[[0, -1], [-1, -1]]], np.int32)   # second row all pad
    scores = np.array([[[1.0, -np.inf], [-np.inf, -np.inf]]], np.float32)
    rt = RunTensor(doc_ids, scores, ["q1", "q2"], ["r0"], vocab)
    rt.minmax_normalized()
    assert not [w for w in recwarn if "All-NaN" in str(w.message)]
