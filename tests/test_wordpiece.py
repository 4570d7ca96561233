"""Self-contained WordPiece tokenizer: parity with transformers.BertTokenizer
(id-exact) plus standalone behavior checks."""

import numpy as np
import pytest

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "un", "##aff", "##able", "##ly",
    "hello", "world", ",", ".", "!", "?", "'", '"', "-", "$", "1", "2",
    "##1", "##2", "##3", "co", "##ffee", "cafe", "na", "##ive",
    "中", "国", "a", "b", "##c", "don", "t",
]

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Hello, world! unaffable?",
    "don't",
    'he said "hello"',
    "$12 123 21",
    "café naïve",                       # accent stripping
    "中国 hello",                        # CJK isolation
    "ZZZZZZ unknownword hello",          # UNK paths
    "a" * 150,                           # over max_chars_per_word -> UNK
    "  multiple   spaces\tand\nnewlines  ",
    "",
    "....",
    "MIXED case TEXT",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("wp") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n", encoding="utf-8")
    return p


def test_wordpiece_matches_transformers(vocab_file):
    transformers = pytest.importorskip("transformers")

    from qpp_fusion_rag_tpu.encoders.wordpiece import WordPieceTokenizer

    ours = WordPieceTokenizer.from_vocab_file(vocab_file, max_length=64)
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    for text in TEXTS:
        want = hf(text, truncation=True, max_length=64)["input_ids"]
        got = ours(text, max_length=64)
        assert got == want, (text, got, want)


def test_wordpiece_truncation_matches_transformers(vocab_file):
    transformers = pytest.importorskip("transformers")

    from qpp_fusion_rag_tpu.encoders.wordpiece import WordPieceTokenizer

    ours = WordPieceTokenizer.from_vocab_file(vocab_file, max_length=8)
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    text = "the quick brown fox jumps over the lazy dog hello world"
    want = hf(text, truncation=True, max_length=8)["input_ids"]
    got = ours(text)
    assert got == want and len(got) == 8


def test_wordpiece_standalone(vocab_file):
    """Behavior that must hold without transformers present at all."""
    from qpp_fusion_rag_tpu.encoders.wordpiece import WordPieceTokenizer

    tok = WordPieceTokenizer.from_vocab_file(vocab_file)
    v = tok.vocab
    # greedy longest match with continuations
    assert tok.tokenize_ids("jumps") == [v["jump"], v["##s"]]
    assert tok.tokenize_ids("unaffable") == [v["un"], v["##aff"], v["##able"]]
    # unmatchable span -> whole-word UNK
    assert tok.tokenize_ids("jumpzz") == [v["[UNK]"]]
    # punctuation split + CJK isolation
    assert tok.tokenize_ids("hello,world") == [v["hello"], v[","], v["world"]]
    assert tok.tokenize_ids("中国") == [v["中"], v["国"]]
    # accents stripped under lowercase
    assert tok.tokenize_ids("Café") == [v["cafe"]]
    # specials wrap the sequence
    assert tok("hello")[0] == v["[CLS]"] and tok("hello")[-1] == v["[SEP]"]


def test_from_pretrained_dir_respects_case_flag(tmp_path):
    import json

    from qpp_fusion_rag_tpu.encoders.wordpiece import WordPieceTokenizer

    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    (tmp_path / "tokenizer_config.json").write_text(
        json.dumps({"do_lower_case": False}))
    tok = WordPieceTokenizer.from_pretrained_dir(tmp_path)
    assert tok.lowercase is False
    # cased: "Hello" has no cased vocab entry -> UNK, lowercase "hello" hits
    assert tok.tokenize_ids("Hello") == [tok.vocab["[UNK]"]]
    assert tok.tokenize_ids("hello") == [tok.vocab["hello"]]


def test_load_tokenizer_resolves_local_dir_without_transformers(tmp_path, monkeypatch):
    """encoders.load_tokenizer must use the self-contained WordPiece path
    (no transformers import) when vocab.txt is present."""
    import sys

    from qpp_fusion_rag_tpu.encoders import load_tokenizer

    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    # poison transformers to prove it is not touched
    monkeypatch.setitem(sys.modules, "transformers", None)
    tok = load_tokenizer(str(tmp_path), max_length=16)
    ids = tok("hello world")
    assert ids[0] == VOCAB.index("[CLS]") and ids[-1] == VOCAB.index("[SEP]")
    assert VOCAB.index("hello") in ids
