"""Self-contained WordPiece tokenizer (vocab.txt-driven, zero foreign deps).

Implements the BERT tokenization pipeline — clean → whitespace split →
basic tokenization (lowercase, NFD accent strip, punctuation split, CJK
isolation) → greedy longest-match WordPiece with "##" continuations —
from the vocab file alone, completing the "one JAX program + one C++
index builder" runtime collapse: SPLADE/BGE/cross-encoder retrievers no
longer import `transformers` at query time (the reference leans on
sentence-transformers/HF for this, reference src/retrievers/bge.py:31-84,
splade.py:40-56).

Parity: tests/test_wordpiece.py checks id-exact agreement with
transformers.BertTokenizer over punctuation/accents/CJK/unknown/long-word
inputs on a constructed vocab.
"""

from __future__ import annotations

import unicodedata
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges BERT treats as punctuation even when unicode says
    # otherwise (e.g. "$", "`", "~")
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


class WordPieceTokenizer:
    """BERT-style tokenizer over a vocab.txt (token per line, id = line no).

    `__call__(text)` returns input ids with [CLS]/[SEP] added and
    truncation to `max_length` — the exact contract of
    encoders.bert.load_hf_tokenizer's callable.
    """

    def __init__(
        self,
        vocab: Union[Dict[str, int], Sequence[str]],
        lowercase: bool = True,
        strip_accents: Optional[bool] = None,   # None = follow `lowercase`
        max_length: int = 256,
        max_chars_per_word: int = 100,
        unk_token: str = "[UNK]",
        cls_token: str = "[CLS]",
        sep_token: str = "[SEP]",
        pad_token: str = "[PAD]",
    ):
        if not isinstance(vocab, dict):
            vocab = {t: i for i, t in enumerate(vocab)}
        self.vocab = vocab
        self.lowercase = lowercase
        self.strip_accents = lowercase if strip_accents is None else strip_accents
        self.max_length = max_length
        self.max_chars_per_word = max_chars_per_word
        self.unk_token = unk_token
        for name, tok in (("unk", unk_token), ("cls", cls_token),
                          ("sep", sep_token), ("pad", pad_token)):
            if tok not in vocab:
                raise ValueError(f"{name} token {tok!r} missing from vocab")
        self.unk_id = vocab[unk_token]
        self.cls_id = vocab[cls_token]
        self.sep_id = vocab[sep_token]
        self.pad_id = vocab[pad_token]

    # -- construction ---------------------------------------------------
    @classmethod
    def from_vocab_file(cls, path, **kw) -> "WordPieceTokenizer":
        toks = Path(path).read_text(encoding="utf-8").splitlines()
        # vocab lines keep inner spaces but lose trailing newline only
        return cls([t.rstrip("\n") for t in toks], **kw)

    @classmethod
    def from_pretrained_dir(cls, path, max_length: int = 256) -> "WordPieceTokenizer":
        """Build from a HF checkpoint directory: vocab.txt +
        tokenizer_config.json's do_lower_case (defaults True, the BERT
        convention)."""
        import json

        path = Path(path)
        lowercase = True
        strip_accents = None       # None = follow `lowercase`, HF semantics
        cfg = path / "tokenizer_config.json"
        if cfg.exists():
            tc = json.loads(cfg.read_text())
            lowercase = bool(tc.get("do_lower_case", True))
            strip_accents = tc.get("strip_accents", None)
        return cls.from_vocab_file(path / "vocab.txt", lowercase=lowercase,
                                   strip_accents=strip_accents,
                                   max_length=max_length)

    # -- pipeline -------------------------------------------------------
    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            if _is_cjk(cp):
                out.append(f" {ch} ")
            elif _is_whitespace(ch):
                out.append(" ")
            else:
                out.append(ch)
        return "".join(out)

    def _basic_split(self, text: str) -> List[str]:
        tokens: List[str] = []
        for word in self._clean(text).split():
            if self.lowercase:
                word = word.lower()
            if self.strip_accents:
                word = "".join(
                    ch for ch in unicodedata.normalize("NFD", word)
                    if unicodedata.category(ch) != "Mn"
                )
            # split punctuation into standalone tokens
            cur: List[str] = []
            for ch in word:
                if _is_punctuation(ch):
                    if cur:
                        tokens.append("".join(cur))
                        cur = []
                    tokens.append(ch)
                else:
                    cur.append(ch)
            if cur:
                tokens.append("".join(cur))
        return tokens

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            piece_id = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                pid = self.vocab.get(sub)
                if pid is not None:
                    piece_id = pid
                    break
                end -= 1
            if piece_id is None:
                return [self.unk_id]       # any unmatchable span -> whole-word UNK
            ids.append(piece_id)
            start = end
        return ids

    def tokenize_ids(self, text: str) -> List[int]:
        """WordPiece ids WITHOUT special tokens."""
        ids: List[int] = []
        for word in self._basic_split(text):
            ids.extend(self._wordpiece(word))
        return ids

    def __call__(self, text: str, max_length: Optional[int] = None) -> List[int]:
        """-> [CLS] ids... [SEP], truncated to max_length (HF semantics:
        truncation keeps the leading pieces and always terminates with
        [SEP])."""
        max_length = max_length or self.max_length
        body = self.tokenize_ids(text)[: max(max_length - 2, 0)]
        return [self.cls_id, *body, self.sep_id]
