"""Synthetic extraction task that closes the RAG loop offline.

The reference's end-task finding (qpp-fusion-methods.plan..md:136-149,
scripts/07_rag_eval.py:74-162) — downstream QA quality peaks at SMALL k
and fused rankings beat unweighted fusion downstream — needs an answer
model. The reference points stage 07 at an external LLM server; this
module instead trains the on-device LM (generation.local_lm) to do the
demo dataset's QA task from scratch: every query's relevant docs carry
``marker<q> ... answer: secret<s>`` (pipeline.demo.generate_dataset),
so the task is *contextual extraction* — find the doc whose marker
matches the query's and copy its secret. Query→secret pairings are
random per training example, making a marker→secret lookup impossible
to memorize: the model must read the context.

Prompts are rendered EXACTLY as `generation.client.QAGenerator` +
`local_lm.LocalLMTransport` render them at eval time, so the trained
model sees zero format shift inside `pipeline.rag_eval --local-lm`.
Training uses k∈{1..3} contexts; larger k at eval is therefore longer
than anything seen in training — the same more-context-hurts regime the
reference observed with a production LLM.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from qpp_fusion_rag_tpu.config import config
from qpp_fusion_rag_tpu.generation.lm_trainer import WordTokenizer

N_TERMS = 800          # matches pipeline.demo.generate_dataset's vocab


def render_qa_prompt(query: str, contexts: Sequence[str]) -> str:
    """The exact prompt LocalLMTransport sees for a QAGenerator call:
    client.QAGenerator.generate builds the user message, client.execute
    wraps it in [system, user] messages, and LocalLMTransport joins them
    as 'role: content' lines ending in 'assistant:'."""
    p = config.generation.prompts.qa
    context = "\n\n".join(
        f"[{i + 1}] {c}" for i, c in enumerate(contexts)
    ) if contexts else "(no context provided)"
    user = str(p.user_template).format(context=context, query=query)
    return f"system: {str(p.system)}\n\nuser: {user}\n\nassistant:"


def make_doc(rng, marker: Optional[int], secret: Optional[int],
             n_words: int = 25) -> str:
    """One synthetic passage, same layout as the demo corpus docs."""
    words = [f"term{i}" for i in rng.integers(0, N_TERMS, n_words)]
    if marker is not None:
        words += [f"marker{marker}"] * 3 + ["answer:", f"secret{secret}"]
    return " ".join(words)


def sample_example(rng, n_markers: int, n_secrets: int,
                   k_choices: Sequence[int] = (1, 2, 3),
                   p_foreign: float = 0.5) -> Tuple[str, str]:
    """-> (prompt, answer word). One context doc answers the query's
    marker; others are either plain noise or FOREIGN marker docs with
    their own secrets (forcing marker matching, not 'copy any secret')."""
    k = int(rng.choice(list(k_choices)))
    m = int(rng.integers(n_markers))
    s = int(rng.integers(n_secrets))
    rel_pos = int(rng.integers(k))
    contexts: List[str] = []
    for i in range(k):
        if i == rel_pos:
            contexts.append(make_doc(rng, m, s))
        elif rng.random() < p_foreign:
            m2 = int(rng.integers(n_markers))
            while m2 == m:
                m2 = int(rng.integers(n_markers))
            contexts.append(make_doc(rng, m2, int(rng.integers(n_secrets))))
        else:
            contexts.append(make_doc(rng, None, None))
    filler = " ".join(f"term{i}" for i in rng.integers(0, N_TERMS, 3))
    query = f"marker{m} {filler}"
    return render_qa_prompt(query, contexts), f"secret{s}"


def build_vocab(n_markers: int, n_secrets: int,
                max_k: int = 12) -> WordTokenizer:
    """Closed vocabulary covering the corpus pools, the config prompt
    templates, and the transport's role markers."""
    words = {f"term{i}" for i in range(N_TERMS)}
    words |= {f"marker{i}" for i in range(n_markers)}
    words |= {f"secret{i}" for i in range(n_secrets)}
    words |= {f"[{i + 1}]" for i in range(max_k)}
    words.add("answer:")
    sample = render_qa_prompt("q", ["c"]) + " (no context provided)"
    words |= set(sample.split())
    return WordTokenizer(sorted(words))


def encode_batch(tok: WordTokenizer, examples: Sequence[Tuple[str, str]],
                 seq_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """-> (ids [B, T] i32 padded with -1, loss_mask [B, T] bool marking
    the answer + EOS target positions). Prompts longer than seq_len - 2
    are left-truncated, mirroring LocalLMTransport's tail-keep."""
    B = len(examples)
    ids = np.full((B, seq_len), -1, np.int32)
    mask = np.zeros((B, seq_len), bool)
    for b, (prompt, answer) in enumerate(examples):
        p = tok.encode(prompt)[-(seq_len - 2):]
        a = tok.encode(answer)
        seq = p + a + [tok.eos_id]
        seq = seq[-seq_len:]
        ids[b, :len(seq)] = seq
        mask[b, len(p):len(seq)] = True
    return ids, mask


def extraction_accuracy(params, cfg, tok: WordTokenizer, rng,
                        n_markers: int, n_secrets: int, n: int = 64,
                        k: int = 2, bucket: int = 256) -> float:
    """Greedy-decode `n` fresh examples at context size `k` and score
    exact answer match — the held-out gate before serving the model."""
    from qpp_fusion_rag_tpu.generation.local_lm import greedy_generate

    import jax.numpy as jnp

    exs = [sample_example(rng, n_markers, n_secrets, k_choices=(k,))
           for _ in range(n)]
    cap = cfg.n_positions - 4
    bucket = min(bucket, cap)
    arr = np.zeros((n, bucket), np.int32)
    lens = np.zeros(n, np.int32)
    for i, (prompt, _a) in enumerate(exs):
        p = tok.encode(prompt)[-bucket:]
        arr[i, :len(p)] = p
        lens[i] = len(p)
    toks, _n_gen = greedy_generate(params, cfg, jnp.asarray(arr),
                                   jnp.asarray(lens), max_new=3)
    toks = np.asarray(toks)
    hits = sum(tok.decode(toks[i]).strip() == exs[i][1] for i in range(n))
    return hits / n
