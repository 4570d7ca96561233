"""Mesh-sharded retrieval: corpus-parallel dense top-k with ICI merge.

The corpus embedding matrix is sharded row-wise over the ``corpus`` mesh axis
and the query batch over ``data``. Each chip runs the local streaming top-k
(ops.dense), then partial results merge with a tiled `all_gather` + `top_k`
over the corpus axis — a binary-tree/all-gather top-k merge riding ICI,
replacing the reference's sequential segment search + host merge-sort
(reference src/retrievers/bge.py:216-237).

Communication cost per query batch is O(B * k * n_corpus_shards) values —
independent of corpus size N.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from qpp_fusion_rag_tpu.ops import dense
from qpp_fusion_rag_tpu.ops import fusion as F
from qpp_fusion_rag_tpu.parallel.mesh import CORPUS_AXIS, DATA_AXIS


def _merge_over_corpus(vals: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Inside shard_map: merge per-shard top-k buffers over the corpus axis.

    vals/ids: [..., k] local buffers with *global* doc ids.
    all_gather(tiled) -> [..., k * n_shards] -> top_k.
    """
    all_vals = jax.lax.all_gather(vals, CORPUS_AXIS, axis=vals.ndim - 1, tiled=True)
    all_ids = jax.lax.all_gather(ids, CORPUS_AXIS, axis=ids.ndim - 1, tiled=True)
    merged, top = jax.lax.top_k(all_vals, k)
    return merged, jnp.take_along_axis(all_ids, top, axis=-1)


def _pad_corpus(corpus: jnp.ndarray, n_shards: int) -> Tuple[jnp.ndarray, int]:
    """Zero-pad rows so N divides the corpus-axis size. Padded rows score 0
    and are masked to (-inf, -1) by global id before the ICI merge — at most
    n_shards-1 pad rows exist, all in the last shard, so they can displace at
    most that many all-negative-score candidates from one local top-k."""
    n_real = corpus.shape[0]
    pad = (-n_real) % n_shards
    if pad:
        corpus = jnp.concatenate(
            [corpus, jnp.zeros((pad, corpus.shape[1]), corpus.dtype)], axis=0
        )
    return corpus, n_real


def _to_global_merge(vals, ids, base, n_real, k):
    """Inside shard_map: shard-LOCAL ids + base -> global ids, pad/out-of-
    range slots masked to (-inf, -1), merged over the corpus axis. The ONE
    implementation every sharded view uses."""
    gids = ids + base
    keep = (ids >= 0) & (gids < n_real)
    return _merge_over_corpus(
        jnp.where(keep, vals, -jnp.inf), jnp.where(keep, gids, -1), k)


# Compiled sharded programs are cached per (mesh, statics): building the
# shard_map closure + jax.jit inside the entry points made every call a
# fresh function identity, so the jit cache NEVER hit and each serving
# batch re-traced and re-compiled (seconds per call).
@lru_cache(maxsize=64)
def _dense_topk_program(mesh, k, chunk, exact, n_real):
    def local(q, c):
        vals, ids = dense.dense_topk(q, c, k=k, chunk=min(chunk, c.shape[0]),
                                     exact=exact)
        shard = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32)
        return _to_global_merge(vals, ids, shard * c.shape[0], n_real, k)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(CORPUS_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_rep=False,
    ))


def sharded_dense_topk(
    queries: jnp.ndarray,   # [B, D]  sharded over data
    corpus: jnp.ndarray,    # [N, D]  sharded over corpus (padded if needed)
    mesh: Mesh,
    k: int = 100,
    chunk: int = 8192,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed top-k -> (scores [B, k], global ids [B, k])."""
    corpus, n_real = _pad_corpus(corpus, mesh.shape[CORPUS_AXIS])
    fn = _dense_topk_program(mesh, k, chunk, exact, n_real)
    return fn(queries, corpus)


def shard_sparse_csr(
    offsets,                 # [T+1] int CSR term offsets (impact-ordered runs)
    flat_docs,               # [P] int32 doc ids
    flat_weights,            # [P] f32 impacts
    n_docs: int,
    n_shards: int,
):
    """Partition CSR impact lists by contiguous doc range into n_shards
    stacked per-shard indexes (the sparse analogue of the dense corpus row
    split; reference segmenting idea: src/indexing/hnsw.py:64-202).

    Shard s owns docs [s*ceil(N/S), (s+1)*ceil(N/S)); each term's posting
    run is split by that range WITHOUT re-sorting, so per-term impact order
    is preserved shard-locally and p_cap pruning stays impact-correct.
    Returns numpy arrays shaped for shard_map (leading shard axis):
        offsets_s [S, T+1] int32 (local CSR),
        docs_s    [S, Pmax] int32 LOCAL doc ids,
        weights_s [S, Pmax] f32,
        doc_base  [S] int32 global id of each shard's doc 0.
    """
    import numpy as np

    offsets = np.asarray(offsets, dtype=np.int64)
    flat_docs = np.asarray(flat_docs)
    flat_weights = np.asarray(flat_weights)
    T = len(offsets) - 1
    per = -(-n_docs // n_shards)
    doc_base = (np.arange(n_shards) * per).astype(np.int32)
    shard_of = np.minimum(flat_docs // per, n_shards - 1).astype(np.int32)

    # stable sort postings by (term, shard) keeping impact order within runs
    term_of = np.repeat(np.arange(T, dtype=np.int64), np.diff(offsets))
    order = np.argsort(term_of * n_shards + shard_of, kind="stable")
    s_docs = flat_docs[order]
    s_w = flat_weights[order]
    s_shard = shard_of[order]
    s_term = term_of[order]

    counts = np.zeros((n_shards, T), dtype=np.int64)
    np.add.at(counts, (s_shard, s_term), 1)
    p_max = int(counts.sum(axis=1).max()) if len(s_docs) else 0
    offsets_s = np.zeros((n_shards, T + 1), dtype=np.int32)
    np.cumsum(counts, axis=1, out=offsets_s[:, 1:])
    docs_s = np.zeros((n_shards, max(p_max, 1)), dtype=np.int32)
    weights_s = np.zeros((n_shards, max(p_max, 1)), dtype=np.float32)
    # postings of shard s are the subsequence with s_shard == s, already in
    # (term, impact) order thanks to the stable sort
    for s in range(n_shards):
        m = s_shard == s
        cnt = int(m.sum())
        docs_s[s, :cnt] = s_docs[m] - doc_base[s]
        weights_s[s, :cnt] = s_w[m]
    return offsets_s, docs_s, weights_s, doc_base


def sharded_sparse_topk(
    q_terms,                 # [B, Tq] int32 (-1 pad)     sharded over data
    q_weights,               # [B, Tq] f32                sharded over data
    offsets_s,               # [S, T+1] int32             sharded over corpus
    docs_s,                  # [S, Pmax] int32 local ids  sharded over corpus
    weights_s,               # [S, Pmax] f32              sharded over corpus
    doc_base,                # [S] int32                  sharded over corpus
    mesh: Mesh,
    n_docs: int,
    k: int = 100,
    p_cap: int = 1024,
    exact_topk: bool = True,
):
    """Distributed sparse top-k -> (scores [B, k], GLOBAL doc ids [B, k]).

    Each chip scores its doc-range partition with the shared CSR kernel
    (ops.sparse.sparse_score_topk), then partials merge over the corpus
    axis with the same tiled all_gather + top_k as the dense path."""
    fn = _sparse_topk_program(mesh, n_docs, k, p_cap, exact_topk)
    return fn(q_terms, q_weights, offsets_s, docs_s, weights_s, doc_base)


@lru_cache(maxsize=64)
def _sparse_topk_program(mesh, n_docs, k, p_cap, exact_topk):
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk

    def local(qt, qw, off, docs, w, base):
        vals, ids = sparse_score_topk(
            docs[0], w[0], off[0], qt, qw, k=k, p_cap=p_cap,
            exact_topk=exact_topk,
        )
        return _to_global_merge(vals, ids, base[0], n_docs, k)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS, None),
            P(CORPUS_AXIS, None), P(CORPUS_AXIS),
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_rep=False,
    ))


def sharded_multi_view_topk(
    queries: jnp.ndarray,    # [B, D]   sharded over data
    view_proj: jnp.ndarray,  # [R, D, Dv] replicated
    corpus: jnp.ndarray,     # [N, Dv]  sharded over corpus
    mesh: Mesh,
    k: int = 100,
    chunk: int = 8192,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed R-view retrieval -> (scores [R, B, k], ids [R, B, k])."""
    corpus, n_real = _pad_corpus(corpus, mesh.shape[CORPUS_AXIS])
    fn = _multi_view_program(mesh, k, chunk, exact, n_real)
    return fn(queries, view_proj, corpus)


@lru_cache(maxsize=64)
def _multi_view_program(mesh, k, chunk, exact, n_real):
    def local(q, proj, c):
        vals, ids = dense.multi_view_topk(
            q, proj, c, k=k, chunk=min(chunk, c.shape[0]), exact=exact)
        shard = jax.lax.axis_index(CORPUS_AXIS).astype(jnp.int32)
        return _to_global_merge(vals, ids, shard * c.shape[0], n_real, k)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, None, None),
                  P(CORPUS_AXIS, None)),
        out_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS, None)),
        check_rep=False,
    ))


class ShardedEnsembleIndexes(NamedTuple):
    """Per-shard device arrays for the heterogeneous ensemble, built by
    shard_ensemble_indexes. Sparse fields carry a leading shard axis [S];
    dense fields are plain arrays sharded along the doc axis by shard_map.
    Per-shard formats are EXACTLY pipeline.ensemble.EnsembleIndexes' —
    the sharded step runs the same production kernels per shard."""
    bm25_packed: jnp.ndarray      # [S, Pp1] int32 (pack_postings, padded)
    bm25_scales: jnp.ndarray      # [S, T1] f32
    bm25_offsets: jnp.ndarray     # [S, T1+1] int32 (shard-local CSR)
    bm25_doc_packed: jnp.ndarray  # [S, Nl, Td1] int32 (pack_doc_vectors)
    bm25_doc_scale: jnp.ndarray   # [S, Nl] f32
    splade_packed: jnp.ndarray
    splade_scales: jnp.ndarray
    splade_offsets: jnp.ndarray
    splade_doc_packed: jnp.ndarray
    splade_doc_scale: jnp.ndarray
    corpus_int: jnp.ndarray       # [D, Np] int8 (Np = S*Nl)
    corpus_rows: jnp.ndarray      # [Np, D] int8
    d_scale: jnp.ndarray          # [1, Np] f32
    doc_base: jnp.ndarray         # [S] int32 global id of shard-local doc 0
    # metadata (host int, stripped before shard_map): imp_bits the
    # *_doc_packed fields were built with; sharded_ensemble_step inherits
    # it and rejects a conflicting explicit doc_imp_bits
    doc_imp_bits: Optional[int] = None
    # metadata: the dual doc-ordered layout's build cap when the sparse
    # fields were packed with presorted_cap > 0 (None = plain CSR).
    # Consumers validate against it — reading a dual layout as plain CSR
    # double-counts every window with no error otherwise
    presorted_cap: Optional[int] = None


def shard_ensemble_indexes(
    bm25_csr,                # (offsets, flat_docs, flat_weights)
    splade_csr,              # (offsets, flat_docs, flat_weights)
    corpus,                  # [N, D] f32 dense rows
    n_docs: int,
    n_shards: int,
    doc_imp_bits: int = 8,
    rows_dtype: str = "int8",   # "bf16" stores rerank/rescore rows at bf16
    presorted_cap: int = 0,     # >0: dual doc-ordered postings at this cap
) -> ShardedEnsembleIndexes:
    """Partition both CSR indexes by doc range (shard_sparse_csr), pack
    each shard's postings and doc-major vectors with the SAME host
    packers as the single-chip index (ops.sparse.pack_postings /
    pack_doc_vectors), and quantize the dense corpus per doc — per-doc
    quantization scales are shard-invariant, so per-shard kernels score
    identically to the single-chip kernels on their doc range.

    presorted_cap > 0 packs each shard's postings with
    ops.sparse.pack_postings_presorted at that cap instead — pair with
    sharded_ensemble_step(sparse_presorted=True, p_cap=presorted_cap)."""
    import numpy as np

    from qpp_fusion_rag_tpu.ops.pallas.dense_topk import quantize_rows
    from qpp_fusion_rag_tpu.ops.sparse import (
        pack_doc_vectors,
        pack_postings,
        pack_postings_presorted,
    )

    n_local = -(-n_docs // n_shards)

    def _shard_sparse(csr):
        # GLOBAL per-term quantization scales: every shard quantizes on the
        # same grid as the single-chip index, so per-shard kernel scores are
        # bit-identical to the single-chip kernel on the same doc
        from qpp_fusion_rag_tpu.ops.sparse import term_scales_from_csr

        g_scales = term_scales_from_csr(csr[2], csr[0])

        offsets_s, docs_s, weights_s, doc_base = shard_sparse_csr(
            *csr, n_docs=n_docs, n_shards=n_shards)
        packed_l, scales_l, dp_l, ds_l = [], [], [], []
        offsets_out = offsets_s
        if presorted_cap > 0:
            offsets_out = np.zeros_like(offsets_s, dtype=np.int64)
        td_max = 1
        for s in range(n_shards):
            n_post = int(offsets_s[s, -1])
            if presorted_cap > 0:
                p, off2, sc = pack_postings_presorted(
                    docs_s[s, :n_post], weights_s[s, :n_post], offsets_s[s],
                    cap=presorted_cap, scales=g_scales)
                offsets_out[s] = off2
            else:
                p, sc = pack_postings(
                    docs_s[s, :n_post], weights_s[s, :n_post], offsets_s[s],
                    scales=g_scales)
            packed_l.append(p)
            scales_l.append(sc)
            dp, ds, td = pack_doc_vectors(
                offsets_s[s], docs_s[s, :n_post], weights_s[s, :n_post],
                n_local, imp_bits=doc_imp_bits)
            dp_l.append(dp)
            ds_l.append(ds)
            td_max = max(td_max, td)
        p_max = max(len(p) for p in packed_l)
        packed = np.zeros((n_shards, p_max), np.int32)
        pad_val = np.int32(
            ((1 << (31 - doc_imp_bits)) - 1) << doc_imp_bits)
        doc_packed = np.full((n_shards, n_local, td_max), pad_val, np.int32)
        for s in range(n_shards):
            packed[s, : len(packed_l[s])] = packed_l[s]
            doc_packed[s, :, : dp_l[s].shape[1]] = dp_l[s]
        if int(offsets_out.max()) >= 2**31:
            raise OverflowError(
                "a shard's posting layout exceeds the int32 device-index "
                "range; use more shards")
        return (packed, np.stack(scales_l), offsets_out.astype(np.int32),
                doc_packed, np.stack(ds_l), doc_base)

    b_p, b_s, b_o, b_dp, b_ds, doc_base = _shard_sparse(bm25_csr)
    s_p, s_s, s_o, s_dp, s_ds, _ = _shard_sparse(splade_csr)

    corpus = np.asarray(corpus, dtype=np.float32)
    pad = n_shards * n_local - corpus.shape[0]
    if pad:
        corpus = np.concatenate(
            [corpus, np.zeros((pad, corpus.shape[1]), np.float32)])
    rows_int, row_scale = quantize_rows(jnp.asarray(corpus), axis=-1)
    if rows_dtype == "bf16":
        rows = jnp.asarray(corpus, jnp.bfloat16)
    elif rows_dtype == "int8":
        rows = rows_int
    else:
        raise ValueError(f"unknown rows_dtype {rows_dtype!r}")
    return ShardedEnsembleIndexes(
        bm25_packed=jnp.asarray(b_p), bm25_scales=jnp.asarray(b_s),
        bm25_offsets=jnp.asarray(b_o), bm25_doc_packed=jnp.asarray(b_dp),
        bm25_doc_scale=jnp.asarray(b_ds),
        splade_packed=jnp.asarray(s_p), splade_scales=jnp.asarray(s_s),
        splade_offsets=jnp.asarray(s_o), splade_doc_packed=jnp.asarray(s_dp),
        splade_doc_scale=jnp.asarray(s_ds),
        corpus_int=jnp.transpose(rows_int), corpus_rows=rows,
        d_scale=row_scale.reshape(1, -1),
        doc_base=jnp.asarray(doc_base),
        doc_imp_bits=doc_imp_bits,
        presorted_cap=presorted_cap if presorted_cap > 0 else None,
    )


def sharded_ensemble_step(
    idx: ShardedEnsembleIndexes,
    bm25_terms,              # [B, T1] int32 (-1 pad)   sharded over data
    bm25_qw,                 # [B, T1] f32
    splade_terms,            # [B, T2] int32
    splade_qw,               # [B, T2] f32
    q_emb,                   # [B, D] f32               sharded over data
    rerank_proj,             # [2, D, D] f32            replicated
    text_feats,              # [B, 4] f32               sharded over data
    mesh: Mesh,
    n_docs: int,
    k: int = 100,
    k_out: int = 100,
    p_cap: int = 1024,
    qpp_index: int = 5,
    method: int = F.COMBSUM,
    sparse_mode: str = "sort",
    sparse_candidates: int = 0,
    mlp_params=None,
    qpp_norm_stats=None,
    doc_imp_bits: Optional[int] = None,
    dense_rescore_pool: int = 0,
    sparse_presorted: bool = False,
):
    """The FULL heterogeneous 5-view ensemble over a (data, corpus) mesh —
    the SAME per-view production kernels as the single-chip
    pipeline.ensemble.ensemble_retrieval_step (make_sparse_scorer /
    dense_view_topk int8 Pallas / score_candidates), composed per corpus
    shard inside one shard_map program with all cross-chip traffic on ICI.

    Per-view communication: sparse/dense shard-local top-k buffers merge
    with the tiled all_gather + top_k of sharded_dense_topk (O(B·k·S)
    values); the rerank views assemble candidate vectors AND their
    dequant scales with one psum over the corpus axis (each shard
    contributes the rows of its doc range), then score replicated with
    the shared score_candidates. QPP normalization extrema pmin/pmax
    over the data axis (whole-batch reference semantics,
    src/qpp.py:340-374) unless frozen qpp_norm_stats are given. The
    fusion tail is pipeline.ensemble.fuse_tail, replicated per corpus
    member on the merged [5, B_loc, k] runs — O(B·k) work, cheaper than
    a round-trip reshard.
    -> (fused_ids [B, k_out], fused_scores [B, k_out], qpp [5, B, 13]);
    sparse_mode="q8c" appends (certified [B] bool, slack [B] f32): the
    AND over corpus shards AND both sparse views of the per-shard
    rank-exactness certificates (one psum + one pmin on ICI).
    """
    from qpp_fusion_rag_tpu.pipeline.ensemble import resolve_doc_imp_bits

    doc_imp_bits = resolve_doc_imp_bits(idx.doc_imp_bits, doc_imp_bits)
    _check_layout(idx, sparse_presorted)
    if idx.doc_imp_bits is not None or idx.presorted_cap is not None:
        idx = idx._replace(doc_imp_bits=None, presorted_cap=None)
    if sparse_presorted:
        from qpp_fusion_rag_tpu.ops.sparse import validate_presorted_cap

        validate_presorted_cap(idx.bm25_offsets, p_cap)
        validate_presorted_cap(idx.splade_offsets, p_cap)
    n_shards = mesh.shape[CORPUS_AXIS]
    n_local = idx.corpus_rows.shape[0] // n_shards
    mlp_leaves, mlp_treedef = jax.tree_util.tree_flatten(mlp_params)
    stats_args = () if qpp_norm_stats is None else (qpp_norm_stats,)
    fn = _ensemble_program(
        mesh, n_docs, n_local, k, k_out, p_cap, qpp_index, method,
        sparse_mode, sparse_candidates, doc_imp_bits, dense_rescore_pool,
        sparse_presorted, mlp_treedef, qpp_norm_stats is not None)
    return fn(bm25_terms, bm25_qw, splade_terms, splade_qw, q_emb,
              rerank_proj, text_feats, idx, tuple(mlp_leaves), *stats_args)


@lru_cache(maxsize=32)
def _ensemble_program(mesh, n_docs, n_local, k, k_out, p_cap, qpp_index,
                      method, sparse_mode, sparse_candidates, doc_imp_bits,
                      dense_rescore_pool, sparse_presorted, mlp_treedef,
                      has_norm_stats):
    """Build + jit the sharded ensemble program ONCE per (mesh, statics).
    mlp_params and qpp_norm_stats travel as replicated traced ARGUMENTS
    (not closure constants): changing weights or calibration stats no
    longer bakes new constants into a fresh program."""
    from qpp_fusion_rag_tpu.pipeline.engine import qpp_from_runs
    from qpp_fusion_rag_tpu.pipeline.ensemble import (
        apply_minmax,
        dense_view_rescored,
        dense_view_topk,
        fuse_tail,
        make_sparse_scorer,
        minmax_extrema,
        normalize_qpp_with,
        score_candidates,
    )

    scorer = make_sparse_scorer(sparse_mode, sparse_candidates, k, p_cap,
                                imp_bits=doc_imp_bits,
                                presorted=sparse_presorted)

    def to_global(vals, ids, base):
        return _to_global_merge(vals, ids, base, n_docs, k)

    def local(bt, bw, st, sw, q, proj, tf, sidx, mlp_leaves, *stats_args):
        mlp_params = jax.tree_util.tree_unflatten(mlp_treedef,
                                                  list(mlp_leaves))
        qpp_norm_stats = stats_args[0] if has_norm_stats else None
        base = sidx.doc_base[0]
        bm25_out = scorer(
            sidx.bm25_packed[0], sidx.bm25_offsets[0], sidx.bm25_scales[0],
            bt, bw, sidx.bm25_doc_packed[0], sidx.bm25_doc_scale[0])
        spl_out = scorer(
            sidx.splade_packed[0], sidx.splade_offsets[0],
            sidx.splade_scales[0], st, sw,
            sidx.splade_doc_packed[0], sidx.splade_doc_scale[0])
        cert = slack = None
        if sparse_mode == "q8c":
            # per-shard certificates AND-merge over the corpus axis (the
            # merged top-k is exact when every shard's local top-k is —
            # sharded_certified_topk's soundness argument), then AND
            # across the two sparse views
            bs_l, bi_l, b_cert, b_slack = bm25_out
            ss_l, si_l, s_cert, s_slack = spl_out
            n_uncert = jax.lax.psum(
                (~(b_cert & s_cert)).astype(jnp.int32), CORPUS_AXIS)
            cert = n_uncert == 0
            slack = jax.lax.pmin(jnp.minimum(b_slack, s_slack), CORPUS_AXIS)
            bm25_out, spl_out = (bs_l, bi_l), (ss_l, si_l)
        bm25_s, bm25_i = to_global(*bm25_out, base)
        spl_s, spl_i = to_global(*spl_out, base)

        # dense view: production int8 kernel over the local column range
        # (optionally pool-rescored at row precision, same as single-chip)
        if dense_rescore_pool > 0:
            dense_local = dense_view_rescored(
                q, sidx.corpus_int, sidx.d_scale, sidx.corpus_rows, k,
                dense_rescore_pool)
        else:
            dense_local = dense_view_topk(q, sidx.corpus_int, sidx.d_scale, k)
        dense_s, dense_i = to_global(*dense_local, base)

        # rerank views: each shard contributes its doc range's candidate
        # rows (int8 values, exact in f32) and dequant scales; one psum
        # assembles both, then the SHARED second-stage scorer runs
        # replicated — numerically identical to the single-chip gather
        safe = jnp.maximum(bm25_i, 0)
        local_idx = jnp.clip(safe - base, 0, n_local - 1)
        own = (safe >= base) & (safe < base + n_local)
        rows = jnp.take(sidx.corpus_rows, local_idx.reshape(-1), axis=0)
        rows = rows.reshape(*local_idx.shape, -1).astype(jnp.float32)
        cand = jax.lax.psum(
            jnp.where(own[..., None], rows, 0.0), CORPUS_AXIS)
        if sidx.corpus_rows.dtype == jnp.int8:
            scale_vals = jax.lax.psum(
                jnp.where(own, sidx.d_scale[0][local_idx], 0.0), CORPUS_AXIS)
        else:
            scale_vals = None
        qv = jnp.einsum("bd,vdw->vbw", q.astype(jnp.float32), proj)
        rr_s, rr_i = score_candidates(qv, cand, bm25_i, scale_vals)

        vals = jnp.stack([bm25_s, spl_s, dense_s, rr_s[0], rr_s[1]])
        ids = jnp.stack([bm25_i, spl_i, dense_i, rr_i[0], rr_i[1]])
        qpp_raw = qpp_from_runs(vals, ids, tf, normalize=False)
        if qpp_norm_stats is None:
            # whole-batch extrema: local min/max + pmin/pmax over `data`
            vmin, vmax = minmax_extrema(qpp_raw)
            vmin = jax.lax.pmin(vmin, DATA_AXIS)
            vmax = jax.lax.pmax(vmax, DATA_AXIS)
            qpp = apply_minmax(qpp_raw, vmin, vmax)
        else:
            qpp = normalize_qpp_with(qpp_raw, qpp_norm_stats)
        fused_ids, fused_scores = fuse_tail(
            vals, ids, qpp, method, qpp_index, k_out, mlp_params)
        if sparse_mode == "q8c":
            return fused_ids, fused_scores, qpp, cert, slack
        return fused_ids, fused_scores, qpp

    shard_axis = P(CORPUS_AXIS)
    idx_specs = ShardedEnsembleIndexes(
        bm25_packed=shard_axis, bm25_scales=shard_axis,
        bm25_offsets=shard_axis, bm25_doc_packed=shard_axis,
        bm25_doc_scale=shard_axis,
        splade_packed=shard_axis, splade_scales=shard_axis,
        splade_offsets=shard_axis, splade_doc_packed=shard_axis,
        splade_doc_scale=shard_axis,
        corpus_int=P(None, CORPUS_AXIS), corpus_rows=P(CORPUS_AXIS, None),
        d_scale=P(None, CORPUS_AXIS), doc_base=shard_axis,
    )
    n_mlp_leaves = mlp_treedef.num_leaves
    extra_specs = (tuple(P() for _ in range(n_mlp_leaves)),)
    if has_norm_stats:
        extra_specs = extra_specs + (P(),)
    out_specs = (P(DATA_AXIS, None), P(DATA_AXIS, None),
                 P(None, DATA_AXIS, None))
    if sparse_mode == "q8c":
        out_specs = out_specs + (P(DATA_AXIS), P(DATA_AXIS))
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(DATA_AXIS, None), P(DATA_AXIS, None),
            P(DATA_AXIS, None), P(None, None, None), P(DATA_AXIS, None),
            idx_specs,
        ) + extra_specs,
        out_specs=out_specs,
        check_rep=False,
    ))


def _check_layout(idx: "ShardedEnsembleIndexes", presorted: bool) -> None:
    """Refuse a posting-layout mismatch: a dual doc-ordered index read as
    plain CSR double-counts every window (and vice versa reads doc-id
    prefixes), with no runtime error."""
    if idx.presorted_cap is not None and not presorted:
        raise ValueError(
            f"index was packed with presorted_cap={idx.presorted_cap}; "
            "pass presorted/sparse_presorted=True (and p_cap == that cap)")
    if presorted and idx.presorted_cap is None and idx.doc_imp_bits is not None:
        # metadata present but no presorted cap recorded: definitely plain
        raise ValueError(
            "presorted=True but the index was packed as plain CSR "
            "(shard_ensemble_indexes presorted_cap=0)")


def sharded_certified_topk(
    idx: ShardedEnsembleIndexes,
    q_terms,                 # [B, Tq] int32 (-1 pad)   sharded over data
    q_weights,               # [B, Tq] f32              sharded over data
    mesh: Mesh,
    n_docs: int,
    k: int = 100,
    p_cap: int = 1024,
    candidates: int = 1024,
    view: str = "bm25",
    presorted: bool = False,
):
    """CERTIFIED rank-exact sparse top-k over a (data, corpus) mesh.

    Each corpus shard runs the production certificate kernel
    (ops.sparse.sparse_score_topk_q8_certified) on its doc-range
    partition; local top-k buffers merge over ICI with the shared
    all_gather+top_k, and the global certificate is the AND of the
    shard certificates (psum of the negations == 0).

    Merge soundness: every doc in the TRUE global top-k ranks <= k
    inside its own shard, so it is contained in that shard's true local
    top-k; when every shard PROVES its local top-k exact, the merged
    top-k of those buffers is therefore the exact global top-k. The
    global slack is the pmin of per-shard slacks (the binding margin).

    -> (scores [B, k], GLOBAL ids [B, k], certified [B] bool,
        slack [B] f32).

    presorted MUST match the layout the index was built with
    (shard_ensemble_indexes presorted_cap): reading a dual doc-ordered
    layout as plain CSR double-counts every window — the cap guard
    below catches the mismatch before tracing.
    """
    from qpp_fusion_rag_tpu.ops.sparse import validate_presorted_cap
    from qpp_fusion_rag_tpu.pipeline.ensemble import resolve_doc_imp_bits

    _check_layout(idx, presorted)
    if presorted:
        off = idx.bm25_offsets if view == "bm25" else idx.splade_offsets
        validate_presorted_cap(off, p_cap)
    imp_bits = resolve_doc_imp_bits(idx.doc_imp_bits, None)
    if idx.doc_imp_bits is not None or idx.presorted_cap is not None:
        idx = idx._replace(doc_imp_bits=None, presorted_cap=None)
    fn = _certified_program(mesh, n_docs, k, p_cap, candidates, imp_bits,
                            view, presorted)
    return fn(q_terms, q_weights, idx)


@lru_cache(maxsize=32)
def _certified_program(mesh, n_docs, k, p_cap, candidates, imp_bits, view,
                       presorted):
    from qpp_fusion_rag_tpu.ops.sparse import sparse_score_topk_q8_certified

    def local(qt, qw, sidx):
        if view == "bm25":
            packed, off = sidx.bm25_packed[0], sidx.bm25_offsets[0]
            scales = sidx.bm25_scales[0]
            dp, ds = sidx.bm25_doc_packed[0], sidx.bm25_doc_scale[0]
        else:
            packed, off = sidx.splade_packed[0], sidx.splade_offsets[0]
            scales = sidx.splade_scales[0]
            dp, ds = sidx.splade_doc_packed[0], sidx.splade_doc_scale[0]
        vals, ids, cert, slack = sparse_score_topk_q8_certified(
            packed, off, scales, dp, ds, qt, qw,
            k=k, p_cap=p_cap, candidates=candidates, imp_bits=imp_bits,
            presorted=presorted)
        vals, gids = _to_global_merge(vals, ids, sidx.doc_base[0],
                                      n_docs, k)
        n_uncert = jax.lax.psum((~cert).astype(jnp.int32), CORPUS_AXIS)
        return vals, gids, n_uncert == 0, jax.lax.pmin(slack, CORPUS_AXIS)

    shard_axis = P(CORPUS_AXIS)
    idx_specs = ShardedEnsembleIndexes(
        bm25_packed=shard_axis, bm25_scales=shard_axis,
        bm25_offsets=shard_axis, bm25_doc_packed=shard_axis,
        bm25_doc_scale=shard_axis,
        splade_packed=shard_axis, splade_scales=shard_axis,
        splade_offsets=shard_axis, splade_doc_packed=shard_axis,
        splade_doc_scale=shard_axis,
        corpus_int=P(None, CORPUS_AXIS), corpus_rows=P(CORPUS_AXIS, None),
        d_scale=P(None, CORPUS_AXIS), doc_base=shard_axis,
    )
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), idx_specs),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None),
                   P(DATA_AXIS), P(DATA_AXIS)),
        check_rep=False,
    ))


def sharded_predict_ensemble(ens, x, mesh: Mesh) -> jnp.ndarray:
    """Learned-fusion GBDT inference batch-sharded over the data axis:
    the tree arrays (ops.trees.TreeEnsemble) replicate, each data shard
    traverses its rows with the shared device kernel. No collectives —
    tree traversal is embarrassingly parallel over examples; this exists
    so distributed serving can fuse it into sharded programs.
    -> [B] predictions, sharded over data."""
    fn = _tree_program(mesh, ens.max_depth, ens.base_score,
                       ens.learning_rate)
    return fn(x, ens.feature, ens.threshold, ens.children, ens.value)


@lru_cache(maxsize=32)
def _tree_program(mesh, max_depth, base_score, learning_rate):
    from qpp_fusion_rag_tpu.ops.trees import TreeEnsemble, predict_ensemble

    def local(x, feature, threshold, children, value):
        ens = TreeEnsemble(feature, threshold, children, value,
                           max_depth, base_score, learning_rate)
        return predict_ensemble(ens, x)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, None), P(None, None),
                  P(None, None, None), P(None, None)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    ))
