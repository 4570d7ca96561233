"""Lucene 9.x on-disk index reader (host side) — enough of the format to
import the reference's committed REAL SPLADE impact index
(/root/reference/data/scifact/index/splade, Lucene 9.5 segment, codec
"Lucene90" postings) into the TPU-native CSR layout without any JVM.

The reference serves SPLADE through Pyserini's LuceneImpactSearcher over
this index (reference src/retrievers/splade.py:75-80); its per-posting
FREQUENCY is the quantized SPLADE impact, so decoding the doc/freq
postings recovers the full impact index. Layers implemented (each
verified against the committed segment's own metadata):

``.tmd``  BlockTreeTermsMeta: per-field numTerms / sumDocFreq /
    sumTotalTermFreq / docCount / min-max term / root block pointer,
    with the per-field FST metadata blob skipped.
``.tim``  BlockTree blocks, decoded by recursive descent from the root
    block pointer (no FST needed): block entry counts, LZ4 or
    lowercase-ASCII suffix compression (the 6-bit scheme: the last
    len/4 values are rebuilt from the high bits of bytes i, s+i, 2s+i),
    suffix-length stream ((len<<1|isSubBlock) vints in non-leaf
    blocks, sub-block entries carrying a backward file-pointer delta),
    per-term stats (StatsWriter: vint bit0 set = run of (v>>1)+1
    df=1/ttf=1 singletons, else df=v>>1 + unconditional ttf-df vlong
    when the field has freqs) and
    Lucene90PostingsWriter term metadata (docStartFP vlong deltas,
    absolute at each block start; singleton-doc inlining incl. the
    consecutive-singleton zigzag-run optimization; skip offset present
    when docFreq > 128). Floor splits are handled by continuing at the
    block end until lastInFloor.
``.doc``  Lucene90 postings: full blocks of 128 PFOR-encoded deltas
    (token byte = numExceptions<<5 | bitsPerValue, ForUtil bit-packing,
    patch list), then VInt-coded tail ((delta<<1|freq==1) + optional
    freq); skip/impact data is skipped (we read exhaustively — the
    impacts ARE the freqs for an impact index).

The "id" field indexes each document's docno as a single term with one
posting, which recovers the docid->docno mapping without decoding
stored fields.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

CODEC_MAGIC = 0x3FD76C17
BLOCK_SIZE = 128


class Reader:
    """Lucene DataInput over a bytes buffer."""

    __slots__ = ("b", "pos")

    def __init__(self, b: bytes, pos: int = 0):
        self.b = b
        self.pos = pos

    def u8(self) -> int:
        v = self.b[self.pos]
        self.pos += 1
        return v

    def read(self, n: int) -> bytes:
        v = self.b[self.pos:self.pos + n]
        if len(v) != n:
            raise EOFError("lucene reader ran past buffer")
        self.pos += n
        return v

    def be32(self) -> int:
        v = struct.unpack_from(">i", self.b, self.pos)[0]
        self.pos += 4
        return v

    def le16(self) -> int:
        v = struct.unpack_from("<H", self.b, self.pos)[0]
        self.pos += 2
        return v

    def vint(self) -> int:
        out = shift = 0
        while True:
            x = self.u8()
            out |= (x & 0x7F) << shift
            if not x & 0x80:
                return out
            shift += 7

    vlong = vint

    def string(self) -> str:
        return self.read(self.vint()).decode("utf-8")

    def map_of_strings(self) -> Dict[str, str]:
        return {self.string(): self.string() for _ in range(self.vint())}

    def header(self, expect: Optional[str] = None) -> Tuple[str, int]:
        magic = self.be32()
        if magic != CODEC_MAGIC:
            raise ValueError(f"bad codec magic {magic:#x}")
        codec = self.string()
        version = self.be32()
        if expect and codec != expect:
            raise ValueError(f"codec {codec!r}, expected {expect!r}")
        return codec, version

    def index_header(self, expect: Optional[str] = None):
        codec, version = self.header(expect)
        self.read(16)                       # segment object id
        self.read(self.u8())                # segment suffix
        return codec, version


# ---------------------------------------------------------------------------
# Suffix decompression
# ---------------------------------------------------------------------------

def lowercase_ascii_decompress(r: Reader, n: int) -> bytes:
    """Lucene LowercaseAsciiCompression: n 6-bit values in n - n//4
    bytes — the first 3/4 are byte low bits, the last quarter value i is
    (b[i]>>6)<<4 | (b[s+i]>>6)<<2 | (b[2s+i]>>6); chars map back as
    v<0x20 -> v+0x1F else v+0x3F; then vint exception count + (position
    vint, byte) patches."""
    saved = n >> 2
    clen = n - saved
    packed = r.read(clen)
    vals = [x & 0x3F for x in packed]
    for i in range(saved):
        vals.append(((packed[i] >> 6) << 4)
                    | ((packed[saved + i] >> 6) << 2)
                    | (packed[2 * saved + i] >> 6))
    out = bytearray((v + 0x1F) if v < 0x20 else (v + 0x3F)
                    for v in vals[:n])
    for _ in range(r.vint()):
        pos = r.vint()
        out[pos] = r.u8()
    return bytes(out)


def lz4_decompress(r: Reader, n: int) -> bytes:
    """Standard LZ4 block format (Lucene's own LZ4 impl), stopping at n
    decompressed bytes."""
    out = bytearray()
    while len(out) < n:
        token = r.u8()
        lit = token >> 4
        if lit == 15:
            while True:
                x = r.u8()
                lit += x
                if x != 255:
                    break
        out += r.read(lit)
        if len(out) >= n:
            break
        off = r.le16()
        ml = token & 15
        if ml == 15:
            while True:
                x = r.u8()
                ml += x
                if x != 255:
                    break
        ml += 4
        for _ in range(ml):
            out.append(out[-off])
    return bytes(out)


def read_suffixes(r: Reader) -> Tuple[int, bool, bytes]:
    """-> (numEntries<<1|lastInFloor code, isLeaf, suffixBytes)."""
    code = r.vint()
    token = r.vlong()
    n = token >> 3
    is_leaf = bool(token & 0x04)
    comp = token & 0x03
    if comp == 0:
        suf = r.read(n)
    elif comp == 1:
        suf = lowercase_ascii_decompress(r, n)
    elif comp == 2:
        suf = lz4_decompress(r, n)
    else:
        raise ValueError(f"unknown suffix compression {comp}")
    return code, is_leaf, suf


# ---------------------------------------------------------------------------
# Metadata (.tmd)
# ---------------------------------------------------------------------------

class FieldMeta:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def read_tmd(path, freqs_by_field: Dict[int, bool]) -> Dict[int, FieldMeta]:
    """freqs_by_field: field number -> has freqs (fnm index_options >= 2);
    DOCS-only fields omit sumTotalTermFreq from the stream."""
    r = Reader(Path(path).read_bytes())
    r.index_header("BlockTreeTermsMeta")
    r.index_header("Lucene90PostingsWriterTerms")
    r.vint()                                # postings block size (128)
    fields: Dict[int, FieldMeta] = {}
    for _ in range(r.vint()):
        num = r.vint()
        n_terms = r.vlong()
        root_code = r.read(r.vint())
        if freqs_by_field[num]:
            sum_ttf = r.vlong()
            sum_df = r.vlong()
        else:
            sum_df = r.vlong()
            sum_ttf = sum_df
        doc_count = r.vint()
        min_term = r.read(r.vint())
        max_term = r.read(r.vint())
        index_start_fp = r.vlong()
        # skip the inline FST metadata blob
        r.header("FST")
        if r.u8() == 1:
            r.read(r.vint())                # empty output
        r.u8()                              # input type
        r.vlong()                           # start node
        r.vlong()                           # fst num bytes
        rc = Reader(root_code)
        code = rc.vlong()
        fields[num] = FieldMeta(
            number=num, num_terms=n_terms, sum_ttf=sum_ttf, sum_df=sum_df,
            doc_count=doc_count, min_term=min_term, max_term=max_term,
            root_fp=code >> 2, index_start_fp=index_start_fp)
    return fields


def read_fnm(path) -> Dict[int, Dict]:
    r = Reader(Path(path).read_bytes())
    r.index_header()
    fields = {}
    for _ in range(r.vint()):
        name = r.string()
        num = r.vint()
        bits = r.u8()
        index_opt = r.u8()
        dv_type = r.u8()
        r.read(8)                           # dv gen
        attrs = r.map_of_strings()
        point_dim = r.vint()
        if point_dim:
            r.vint()
            r.vint()
        r.vint()                            # vector dim
        r.u8()                              # vector encoding
        r.u8()                              # vector similarity
        fields[num] = {"name": name, "index_options": index_opt,
                       "bits": bits, "dv": dv_type, "attrs": attrs}
    return fields


# ---------------------------------------------------------------------------
# Term enumeration (.tim recursive descent)
# ---------------------------------------------------------------------------

class Term:
    __slots__ = ("text", "df", "ttf", "doc_fp", "singleton_doc")

    def __init__(self, text, df, ttf, doc_fp, singleton_doc):
        self.text = text
        self.df = df
        self.ttf = ttf
        self.doc_fp = doc_fp
        self.singleton_doc = singleton_doc


def _walk_block(tim: bytes, fp: int, prefix: bytes, has_freqs: bool,
                out: List[Term]):
    """Decode the block chain starting at fp (floor continuations are
    adjacent in the file) and recurse into sub-blocks."""
    while True:
        block_start = fp
        r = Reader(tim, fp)
        code, is_leaf, suf = read_suffixes(r)
        n_ent = code >> 1
        last_in_floor = bool(code & 1)

        lt = r.vint()
        if lt & 1:
            # all suffix lengths equal: one byte carries the length (and
            # in non-leaf blocks, implies every entry is a term)
            fixed = r.u8()
            lens_r = None
        else:
            fixed = -1
            lens_r = Reader(r.read(lt >> 1))
        entries = []                        # (suffix, is_sub, sub_fp)
        off = 0
        for _ in range(n_ent):
            if fixed >= 0:
                entries.append((suf[off:off + fixed], False, 0))
                off += fixed
                continue
            if is_leaf:
                ln = lens_r.vint()
                entries.append((suf[off:off + ln], False, 0))
            else:
                c = lens_r.vint()
                ln = c >> 1
                if c & 1:                   # sub-block: fp delta follows
                    delta = lens_r.vlong()
                    entries.append((suf[off:off + ln], True,
                                    block_start - delta))
                else:
                    entries.append((suf[off:off + ln], False, 0))
            off += ln

        n_terms = sum(1 for _, sub, _fp in entries if not sub)
        stats = Reader(r.read(r.vint()))
        metas = Reader(r.read(r.vint()))
        fp_after = None

        # Stats: BlockTree StatsWriter — vint bit0 set = a run of
        # (v>>1)+1 singleton terms (df=1, ttf=1); else df=v>>1 and, for
        # fields with freqs, an unconditional vlong ttf-df delta.
        # Metadata: Lucene90PostingsWriter.encodeTerm, absolute at block
        # start — vlong code; bit0 set = consecutive-singleton run
        # (zigzag doc-id delta, docStartFP unchanged); else
        # docStartFP += code>>1, a df==1 term inlines its doc id as a
        # vint, and a skip offset follows for df > BLOCK_SIZE.
        last_doc_fp = 0
        last_singleton = -1
        run = 0
        for text, sub, sub_fp in entries:
            if sub:
                _walk_block(tim, sub_fp, prefix + text, has_freqs, out)
                continue
            if run > 0:
                run -= 1
                df, ttf = 1, 1
            else:
                sc = stats.vint()
                if sc & 1:
                    run = sc >> 1           # this term + `run` more
                    df, ttf = 1, 1
                else:
                    df = sc >> 1
                    ttf = df + (stats.vlong() if has_freqs else 0)
            code = metas.vlong()
            if code & 1:
                delta = (code >> 2) ^ -((code >> 1) & 1)
                singleton = last_singleton + delta
                doc_fp = -1
            else:
                last_doc_fp += code >> 1
                if df == 1:
                    singleton = metas.vint()
                    doc_fp = -1
                else:
                    singleton = -1
                    doc_fp = last_doc_fp
                    if df > BLOCK_SIZE:
                        metas.vlong()       # skip offset (unused)
            last_singleton = singleton
            out.append(Term(prefix + text, df, ttf, doc_fp, singleton))
        if run != 0:
            raise ValueError(
                f"block at {block_start}: singleton run spills entries")
        if stats.pos != len(stats.b) or metas.pos != len(metas.b):
            raise ValueError(
                f"block at {block_start}: stats/meta not fully consumed "
                f"({stats.pos}/{len(stats.b)}, {metas.pos}/{len(metas.b)})")
        if last_in_floor:
            return
        fp = r.pos


def enumerate_terms(tim_path, meta: FieldMeta,
                    has_freqs: bool) -> List[Term]:
    tim = Path(tim_path).read_bytes()
    out: List[Term] = []
    _walk_block(tim, meta.root_fp, b"", has_freqs, out)
    if len(out) != meta.num_terms:
        raise ValueError(
            f"enumerated {len(out)} terms != meta {meta.num_terms}")
    return out


# ---------------------------------------------------------------------------
# Postings (.doc)
# ---------------------------------------------------------------------------

def pfor_decode_block(r: Reader) -> np.ndarray:
    """One PFOR block of 128 values: token = numExceptions<<5 | bits."""
    token = r.u8()
    bits = token & 0x1F
    n_exc = token >> 5
    if bits == 0:
        val = r.vlong()
        out = np.full(BLOCK_SIZE, val, np.int64)
    else:
        out = for_decode(r, bits)
    for _ in range(n_exc):
        pos = r.u8()
        patch = r.u8()
        out[pos] |= patch << bits
    return out


def for_decode(r: Reader, bits: int) -> np.ndarray:
    """ForUtil.decode: 128 bits-wide values from 16*bits bytes."""
    raw = np.frombuffer(r.read(16 * bits), np.uint8)
    return _for_unpack(raw, bits)


# -- ForUtil bit layout ------------------------------------------------------
# Lucene 9's ForUtil packs 128 b-bit values into 2b little-endian longs
# via a lane-parallel scheme: values collapse into P-bit lanes
# (P = 8/16/32 by b) across BLOCK*P/64 longs, the first 2b collapsed
# longs are lane-shifted into the output, and the remaining longs'
# lanes fill the leftover low bits lane-wise. Rather than hand-invert
# that arithmetic, `_encode_reference` implements the writer exactly and
# the decoder is derived as the inverse BIT PERMUTATION (the packing is
# a pure bit shuffle), cached per bit width. Verified against the
# committed index: every df>=128 term's doc/freq blocks decode to
# strictly increasing in-range doc ids with freq sums equal to the
# term's totalTermFreq (tests/test_lucene.py).

_M64 = (1 << 64) - 1


def _lane_mask(P: int, b: int) -> int:
    m, lane = 0, (1 << b) - 1
    for k in range(0, 64, P):
        m |= lane << k
    return m


def _encode_reference(values, b: int) -> bytes:
    """Faithful port of ForUtil.encode (used only to derive the decode
    permutation)."""
    P = 8 if b <= 8 else 16 if b <= 16 else 32
    n_longs = BLOCK_SIZE * P // 64
    lanes = 64 // P
    longs = [0] * n_longs
    for i in range(n_longs):
        acc = 0
        for j in range(lanes):
            acc |= (values[j * n_longs + i] & ((1 << P) - 1)) \
                << (64 - P * (j + 1))
        longs[i] = acc
    nps = b * 2
    tmp = [0] * nps
    idx = 0
    shift = P - b
    for i in range(nps):
        tmp[i] = (longs[idx] << shift) & _M64
        idx += 1
    shift -= b
    while shift >= 0:
        for i in range(nps):
            tmp[i] |= (longs[idx] << shift) & _M64
            idx += 1
        shift -= b
    rem = shift + b
    mask_rem = _lane_mask(P, rem) if rem else 0
    ti = 0
    rbv = b
    while idx < n_longs:
        if rbv >= rem:
            rbv -= rem
            tmp[ti] |= (longs[idx] >> rbv) & mask_rem
            ti += 1
            if rbv == 0:
                idx += 1
                rbv = b
        else:
            mask1 = _lane_mask(P, rbv)
            mask2 = _lane_mask(P, rem - rbv)
            tmp[ti] |= ((longs[idx] & mask1) << (rem - rbv)) & _M64
            idx += 1
            rbv = b - rem + rbv
            tmp[ti] |= (longs[idx] >> rbv) & mask2
            ti += 1
    out = bytearray()
    for t in tmp:
        out += int(t).to_bytes(8, "little")
    return bytes(out)


_FOR_TABLES: Dict[int, np.ndarray] = {}


def _for_table(b: int) -> np.ndarray:
    """stream-bit -> value_index*64 + value_bit inverse permutation."""
    tab = _FOR_TABLES.get(b)
    if tab is None:
        src = np.full(16 * b * 8, -1, np.int64)
        vals = [0] * BLOCK_SIZE
        for j in range(BLOCK_SIZE):
            for bit in range(b):
                vals[j] = 1 << bit
                arr = np.frombuffer(_encode_reference(vals, b), np.uint8)
                vals[j] = 0
                nz = np.nonzero(arr)[0]
                byte_i = int(nz[0])
                bit_i = int(arr[byte_i]).bit_length() - 1
                src[byte_i * 8 + bit_i] = j * 64 + bit
        _FOR_TABLES[b] = tab = src
    return tab


def _for_unpack(raw: np.ndarray, bits: int) -> np.ndarray:
    src = _for_table(bits)
    stream_bits = np.unpackbits(raw, bitorder="little")
    vals = np.zeros(BLOCK_SIZE, np.int64)
    mask = src >= 0
    np.add.at(vals, src[mask] >> 6,
              stream_bits[mask].astype(np.int64) << (src[mask] & 63))
    return vals


def decode_postings(doc: bytes, t: Term,
                    has_freqs: bool) -> Tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids [df], freqs [df]) for one term."""
    if t.singleton_doc >= 0:
        return (np.array([t.singleton_doc], np.int32),
                np.array([max(1, t.ttf)], np.int32))
    r = Reader(doc, t.doc_fp)
    docs = np.empty(t.df, np.int64)
    freqs = np.ones(t.df, np.int64)
    n_full = t.df // BLOCK_SIZE
    k = 0
    for _ in range(n_full):
        docs[k:k + BLOCK_SIZE] = pfor_decode_block(r)
        if has_freqs:
            freqs[k:k + BLOCK_SIZE] = pfor_decode_block(r)
        k += BLOCK_SIZE
    for i in range(t.df - k):
        if has_freqs:
            code = r.vint()
            docs[k + i] = code >> 1
            freqs[k + i] = 1 if code & 1 else r.vint()
        else:
            docs[k + i] = r.vint()
    return np.cumsum(docs).astype(np.int32), freqs.astype(np.int32)


def decode_postings_batch(doc: bytes, terms: List[Term], has_freqs: bool,
                          max_doc: int, offsets: np.ndarray,
                          native: bool = True):
    """Decode every term's postings into CSR arrays. The C++ fast path
    (native/sparse_index.cpp qpp_lucene_decode_postings — same PFOR /
    ForUtil-permutation / VInt algorithm) is ~50x the Python loop and
    validates doc-id monotonicity, ranges, and per-term freq sums == ttf
    in-line; the Python path double-checks the same oracles and serves
    as the fallback and the test oracle."""
    n_post = int(offsets[-1])
    if native:
        try:
            import ctypes

            from qpp_fusion_rag_tpu.index.native import load_library

            lib = load_library()
            if not hasattr(lib, "_lucene_ok"):
                lib.qpp_lucene_decode_postings.restype = ctypes.c_int64
                lib.qpp_lucene_decode_postings.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64,
                    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ]
                lib._lucene_ok = True
            doc_fps = np.array([t.doc_fp for t in terms], np.int64)
            dfs = np.array([t.df for t in terms], np.int32)
            ttfs = np.array([t.ttf for t in terms], np.int64)
            singles = np.array([t.singleton_doc for t in terms], np.int32)
            docids = np.empty(n_post, np.int32)
            freqs = np.empty(n_post, np.int32)
            got = lib.qpp_lucene_decode_postings(
                doc, len(doc), doc_fps, dfs, ttfs, singles, len(terms),
                1 if has_freqs else 0, max_doc, docids, freqs)
            if got < 0:
                raise ValueError(
                    f"native lucene decode failed at term {-got - 1} "
                    f"({terms[-got - 1].text!r})")
            if got != n_post:
                raise ValueError(
                    f"native lucene decode wrote {got} != {n_post}")
            return docids, freqs
        except (OSError, AttributeError):
            pass  # stale .so without the symbol -> python fallback
    docids = np.empty(n_post, np.int32)
    freqs = np.empty(n_post, np.int32)
    for i, t in enumerate(terms):
        d, f = decode_postings(doc, t, has_freqs)
        if len(d) != t.df:
            raise ValueError(f"term {t.text!r}: {len(d)} != df {t.df}")
        if has_freqs and int(f.sum()) != t.ttf:
            raise ValueError(f"term {t.text!r}: freq sum {int(f.sum())} "
                             f"!= ttf {t.ttf}")
        docids[offsets[i]:offsets[i + 1]] = d
        freqs[offsets[i]:offsets[i + 1]] = f
    return docids, freqs


class LuceneImpactIndex:
    """Decoded Lucene impact index: terms + CSR postings of impacts."""

    def __init__(self, terms, offsets, docids, freqs, docnos, meta):
        self.terms = terms
        self.offsets = offsets
        self.docids = docids
        self.freqs = freqs
        self.docnos = docnos
        self.meta = meta

    @classmethod
    def load(cls, path, contents_field: str = "contents",
             id_field: str = "id") -> "LuceneImpactIndex":
        path = Path(path)
        seg = _find_segment_prefix(path)
        fnm = read_fnm(path / f"{seg}.fnm")
        by_name = {v["name"]: (k, v) for k, v in fnm.items()}
        suffix = by_name[contents_field][1]["attrs"].get(
            "PerFieldPostingsFormat.suffix", "0")
        base = f"{seg}_Lucene90_{suffix}"
        metas = read_tmd(
            path / f"{base}.tmd",
            {k: v["index_options"] >= 2 for k, v in fnm.items()})
        doc = (path / f"{base}.doc").read_bytes()

        cnum, cinfo = by_name[contents_field]
        has_freqs = cinfo["index_options"] >= 2
        cterms = enumerate_terms(path / f"{base}.tim", metas[cnum],
                                 has_freqs)
        inum, _ = by_name[id_field]
        idterms = enumerate_terms(path / f"{base}.tim", metas[inum], False)

        # docno mapping: each id term has exactly one posting
        n_docs = metas[inum].doc_count
        docnos = [None] * n_docs
        for t in idterms:
            d, _ = decode_postings(doc, t, False)
            if len(d) != 1:
                raise ValueError(f"id term {t.text!r} has df {len(d)}")
            docnos[int(d[0])] = t.text.decode("utf-8")
        if any(x is None for x in docnos):
            raise ValueError("id field does not cover all documents")

        offsets = np.zeros(len(cterms) + 1, np.int64)
        for i, t in enumerate(cterms):
            offsets[i + 1] = offsets[i] + t.df
        docids, freqs = decode_postings_batch(doc, cterms, has_freqs,
                                              n_docs, offsets)
        return cls([t.text.decode("utf-8") for t in cterms], offsets,
                   docids, freqs, docnos, metas[cnum])

    @property
    def num_docs(self) -> int:
        return len(self.docnos)

    @property
    def num_terms(self) -> int:
        return len(self.terms)

    def to_sparse_index(self):
        """Import into the TPU-native SparseIndex: impacts (freqs) as
        weights, runs re-sorted to impact order (serving invariant)."""
        from qpp_fusion_rag_tpu.index.sparse import SparseIndex

        w = self.freqs.astype(np.float32)
        term_of = np.repeat(np.arange(self.num_terms, dtype=np.int64),
                            np.diff(self.offsets))
        order = np.lexsort((self.docids, -w.astype(np.float64), term_of))
        doc_lens = np.zeros(self.num_docs, np.int64)
        np.add.at(doc_lens, self.docids, self.freqs)
        return SparseIndex(
            self.offsets, self.docids[order], w[order],
            doc_lens.astype(np.int32), self.docnos,
            "\n".join(self.terms),
            params={"kind": "lucene_impact"},
        )


def _find_segment_prefix(path: Path) -> str:
    segs = sorted({p.name.split(".")[0].split("_Lucene")[0]
                   for p in path.glob("_*.si")})
    if len(segs) != 1:
        raise ValueError(f"expected one segment, found {segs}")
    return segs[0]
