"""Crack Lucene 9 ForUtil bit packing against the committed index.

Implements the Java encode (collapse + lane-wise shift packing, LE
longs) and derives decode as the inverse bit permutation; validated by
decoding every df>=128 term's postings and checking doc-id/freq oracles.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

BLOCK = 128
M64 = (1 << 64) - 1


def masks(P, b):
    m = 0
    lane = (1 << b) - 1
    for k in range(0, 64, P):
        m |= lane << k
    return m


def collapse(longs, P):
    n = BLOCK * P // 64
    out = [0] * n
    lanes = 64 // P
    for i in range(n):
        acc = 0
        for j in range(lanes):
            acc |= (longs[j * n + i] & ((1 << P) - 1)) << (64 - P * (j + 1))
        out[i] = acc
    return out


def encode(values, b):
    if b <= 8:
        P = 8
    elif b <= 16:
        P = 16
    else:
        P = 32
    longs = collapse(list(values), P)
    numLongs = BLOCK * P // 64
    nps = b * 2
    tmp = [0] * nps
    idx = 0
    shift = P - b
    for i in range(nps):
        tmp[i] = (longs[idx] << shift) & M64
        idx += 1
    shift -= b
    while shift >= 0:
        for i in range(nps):
            tmp[i] |= (longs[idx] << shift) & M64
            idx += 1
        shift -= b
    remaining_per_long = shift + b
    mask_rem = masks(P, remaining_per_long) if remaining_per_long else 0
    tmp_idx = 0
    rbv = b
    while idx < numLongs:
        if rbv >= remaining_per_long:
            rbv -= remaining_per_long
            tmp[tmp_idx] |= (longs[idx] >> rbv) & mask_rem
            tmp_idx += 1
            if rbv == 0:
                idx += 1
                rbv = b
        else:
            mask1 = masks(P, rbv)
            mask2 = masks(P, remaining_per_long - rbv)
            tmp[tmp_idx] |= ((longs[idx] & mask1)
                             << (remaining_per_long - rbv)) & M64
            idx += 1
            rbv = b - remaining_per_long + rbv
            tmp[tmp_idx] |= (longs[idx] >> rbv) & mask2
            tmp_idx += 1
    # little-endian long serialization
    out = bytearray()
    for t in tmp:
        out += int(t).to_bytes(8, "little")
    return bytes(out)


_DECODE_TABLES = {}


def decode_table(b):
    """byte-stream bit position -> (value index, value bit) gather map."""
    if b in _DECODE_TABLES:
        return _DECODE_TABLES[b]
    nbytes = 16 * b
    src = np.full(nbytes * 8, -1, np.int64)   # output bit -> value*32+bit
    for j in range(BLOCK):
        for bit in range(b):
            vals = [0] * BLOCK
            vals[j] = 1 << bit
            enc = encode(vals, b)
            arr = np.frombuffer(enc, np.uint8)
            nz = np.nonzero(arr)[0]
            assert len(nz) == 1, (j, bit, nz)
            byte_i = nz[0]
            bit_i = int(arr[byte_i]).bit_length() - 1
            src[byte_i * 8 + bit_i] = j * 64 + bit
    _DECODE_TABLES[b] = src
    return src


def decode(raw, b):
    src = decode_table(b)
    bits = np.unpackbits(np.frombuffer(raw, np.uint8),
                         bitorder="little")
    vals = np.zeros(BLOCK, np.int64)
    mask = src >= 0
    vi = src[mask] // 64
    vb = src[mask] % 64
    np.add.at(vals, vi, bits[mask].astype(np.int64) << vb)
    return vals


def main():
    from qpp_fusion_rag_tpu.index.lucene import (
        Reader, enumerate_terms, read_fnm, read_tmd)

    D = Path("/root/reference/data/scifact/index/splade")
    fnm = read_fnm(D / "_h.fnm")
    metas = read_tmd(D / "_h_Lucene90_0.tmd",
                     {k: v["index_options"] >= 2 for k, v in fnm.items()})
    terms = enumerate_terms(D / "_h_Lucene90_0.tim", metas[1], True)
    doc = (D / "_h_Lucene90_0.doc").read_bytes()
    big = [t for t in terms if t.df >= BLOCK]
    print(f"{len(big)} terms with df >= 128")

    def pfor_block(r):
        token = r.u8()
        bits = token & 0x1F
        n_exc = token >> 5
        if bits == 0:
            out = np.full(BLOCK, r.vlong(), np.int64)
        else:
            out = decode(r.read(16 * bits), bits)
        for _ in range(n_exc):
            pos = r.u8()
            patch = r.u8()
            out[pos] |= patch << bits
        return out

    ok = bad = 0
    first_err = None
    for t in big:
        r = Reader(doc, t.doc_fp)
        try:
            docs = np.empty(t.df, np.int64)
            freqs = np.ones(t.df, np.int64)
            k = 0
            for _ in range(t.df // BLOCK):
                docs[k:k + BLOCK] = pfor_block(r)
                freqs[k:k + BLOCK] = pfor_block(r)
                k += BLOCK
            for i in range(t.df - k):
                code = r.vint()
                docs[k + i] = code >> 1
                freqs[k + i] = 1 if code & 1 else r.vint()
            ids = np.cumsum(docs)
            assert (docs[1:] > 0).all(), "non-positive delta"
            assert ids[-1] < 5183 and ids[0] >= 0, f"id range {ids[-1]}"
            assert int(freqs.sum()) == t.ttf, \
                f"freq sum {int(freqs.sum())} != {t.ttf}"
            ok += 1
        except Exception as e:
            bad += 1
            if first_err is None:
                first_err = (t.text, t.df, t.ttf, repr(e)[:120])
    print("ok", ok, "bad", bad)
    print("first_err", first_err)


if __name__ == "__main__":
    main()
