"""Frontier-batched best-first beam search over a fixed-degree graph.

This is the TPU replacement for the reference's native graph searches
(usearch HNSW walk `src/backend/hnsw.rs:79-88`, diskann-rs beam search
`src/backend/diskann.rs:54-56`). The idiom shift: instead of one query
pointer-chasing through the graph, a *batch* of queries advances in
lockstep. Each hop:

  1. every query picks its best not-yet-expanded beam entry
  2. that node's fixed-degree neighbor row is gathered      [B, R]
  3. candidates are scored by a pluggable block scorer:
       - stored-vector mode: gather vectors [B, R, D] and contract
         with the query batch in one einsum (MXU-shaped)
       - recompute mode (LEANN's signature trick): gather the nodes'
         *token* rows, run the BERT encoder forward on them, and score
         the fresh embeddings — the model runs inside the traversal
         loop on the same chip (reference recomputes via HTTP round
         trips host-side, `src/index/recompute.rs:86-93`)
  4. candidates are deduped (in-beam check + hashed visited table) and
     merged into the beam with jax.lax.top_k

All shapes are static; the loop is a lax.while_loop that exits when every
beam entry is expanded (natural best-first convergence) or at max_iters.
`complexity` = beam width, honored uniformly (the reference's HNSW path
silently ignores it — hnsw.rs:83).

Visited-set semantics: a per-query open-addressed hash table of H slots
(ids overwrite on collision). False negatives only cause duplicate
scoring — never incorrectness — because the in-beam dedup prevents
cycles in the beam itself.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")
HASH_MULT = np.uint32(2654435761)  # Knuth multiplicative hash


def _hash_slot(ids: jnp.ndarray, hash_bits: int) -> jnp.ndarray:
    h = (ids.astype(jnp.uint32) * HASH_MULT) >> np.uint32(32 - hash_bits)
    return h.astype(jnp.int32)


def _beam_search_core(
    queries: jnp.ndarray,      # [B, D] f32
    r: int,                    # graph degree (candidates per expansion)
    entry: jnp.ndarray,        # [] int32 entry node (medoid)
    exclude: jnp.ndarray,      # [B] int32 id to never admit (-1 = none)
    expand_fn: Callable[[jnp.ndarray, jnp.ndarray],
                        Tuple[jnp.ndarray, jnp.ndarray]],
    entry_score_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    n_sentinel: int,
    beam_width: int,
    max_iters: int,
    hash_bits: int = 12,
    expansions: int = 1,
    track_visited: int = 0,
    entry_scores: Optional[jnp.ndarray] = None,  # [B, S] precomputed
    iter_budget: Optional[int] = None,
    init_state: Optional[Tuple] = None,
    aux_init: Tuple = (),
    stateful_expand: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """expand_fn(queries [B, D], u [B, E]) -> (nbrs [B, E*R] int32,
    scores [B, E*R] f32): the fixed-degree neighbor ids of the expanded
    nodes and their scores (higher = better; garbage-but-finite for
    sentinel ids — masked here). entry_score_fn(queries, ids [B, S]) ->
    [B, S] scores for the entry/seed rows. Returns (beam_ids [B, L]
    desc-sorted, beam_scores, vlog_ids [B, T], vlog_scores [B, T]).

    `expansions` (E) = beam entries expanded per hop. E>1 trades a wider
    per-hop candidate block (E*R gathers + scores, MXU-friendly) for ~E x
    fewer sequential hops — the key latency lever on TPU where per-hop
    cost is dominated by the gather round trip, not the math.

    `track_visited` (T) > 0 records the first T *expanded* nodes per
    query (the Vamana visited set V). The graph builder prunes over
    V ++ beam: without V's early, far-from-target expansions the alpha
    rule never creates long-range edges and large graphs lose
    navigability (measured: recall@10 collapsed 0.99 -> 0.28 going
    50k -> 1M when pruning from the final beam alone).

    `stateful_expand` switches expand_fn to the 3-arg form
    expand_fn(queries, u, aux) -> (nbrs, scores, aux): `aux` is an
    arbitrary pytree carried through the traversal loop (and, in
    segmented mode, through the returned state between dispatches).
    The recompute engine uses it for its cross-query embedding cache;
    `aux_init` seeds it on a fresh start."""
    b, _ = queries.shape
    L = beam_width
    E = max(1, min(expansions, L))
    H = 1 << hash_bits
    T = max(track_visited, E)  # log granularity is E per iteration

    # entry may be a scalar (medoid), an [S] vector of shared seed nodes,
    # or a [B, S] matrix of per-query entries — multiple entries let every
    # query start its descent near its own region (CAGRA-style), which
    # matters more than long-range edges on strongly clustered corpora.
    entries = jnp.asarray(entry, jnp.int32)
    if entries.ndim == 0:
        entries = entries[None]
    if entries.ndim == 1:
        s_n = entries.shape[0]
        entry_rows = jnp.broadcast_to(entries[None, :], (b, s_n))
    else:
        s_n = entries.shape[1]
        entry_rows = entries
    if entry_scores is None:
        entry_scores = entry_score_fn(queries, entry_rows)       # [B, S]
    beam_ids = jnp.full((b, L), n_sentinel, dtype=jnp.int32)
    beam_ids = beam_ids.at[:, :s_n].set(entry_rows)
    beam_scores = jnp.full((b, L), NEG_INF, dtype=jnp.float32)
    # Entries keep their real scores even when excluded (so traversal can
    # start); `exclude` only gates *candidate* admission. Callers that
    # exclude a node (the Vamana builder excluding the point being
    # inserted) drop it from the returned beam themselves.
    beam_scores = beam_scores.at[:, :s_n].set(entry_scores)
    expanded = jnp.zeros((b, L), dtype=jnp.bool_)
    visited = jnp.full((b, H), -1, dtype=jnp.int32)
    visited = visited.at[
        jnp.arange(b)[:, None].repeat(s_n, axis=1),
        _hash_slot(entry_rows, hash_bits),
    ].set(entry_rows, mode="drop")

    vlog_ids = jnp.full((b, T), n_sentinel, dtype=jnp.int32)
    vlog_scores = jnp.full((b, T), NEG_INF, dtype=jnp.float32)

    def unexpanded_mask(state):
        beam_ids = state[0]
        beam_scores = state[1]
        expanded = state[2]
        return (~expanded) & (beam_ids != n_sentinel) & (beam_scores > NEG_INF)

    def cond(state):
        it = state[4]
        return (it < max_iters) & jnp.any(unexpanded_mask(state))

    def body(state):
        (beam_ids, beam_scores, expanded, visited, it, vlog_ids,
         vlog_scores, aux) = state
        mask = unexpanded_mask(state)
        sel_scores = jnp.where(mask, beam_scores, NEG_INF)
        # expand the E best unexpanded entries this hop
        top_sel, u_pos = jax.lax.top_k(sel_scores, E)               # [B, E]
        active = top_sel > NEG_INF                                  # [B, E]
        u = jnp.take_along_axis(beam_ids, u_pos, axis=1)            # [B, E]
        u = jnp.where(active, u, 0)

        if track_visited > 0:
            # append this hop's expansions to the visited log (writes
            # beyond T are dropped — the early/far expansions matter most)
            pos_cols = it * E + jax.lax.broadcasted_iota(
                jnp.int32, (b, E), 1
            )
            rows = jnp.arange(b)[:, None].repeat(E, axis=1)
            keep = active & (pos_cols < T)
            safe_cols = jnp.minimum(pos_cols, T - 1)
            vlog_ids = vlog_ids.at[rows, safe_cols].set(
                jnp.where(keep, u, vlog_ids[rows, safe_cols]),
                mode="drop",
            )
            vlog_scores = vlog_scores.at[rows, safe_cols].set(
                jnp.where(keep, top_sel, vlog_scores[rows, safe_cols]),
                mode="drop",
            )

        hit = (
            jax.lax.broadcasted_iota(jnp.int32, (b, E, L), 2)
            == u_pos[:, :, None]
        ) & active[:, :, None]
        expanded = expanded | jnp.any(hit, axis=1)

        c = E * r
        # --- expand: neighbor ids + raw scores (the hot block) ---
        if stateful_expand:
            nbrs, cand_scores, aux = expand_fn(queries, u, aux)     # [B, E*R]
        else:
            nbrs, cand_scores = expand_fn(queries, u)               # [B, E*R]
        cand_active = jnp.repeat(active, r, axis=1)                 # [B, E*R]

        # --- validity masks ---
        valid = (nbrs != n_sentinel) & cand_active
        valid &= nbrs != exclude[:, None]
        dup = (nbrs[:, :, None] == nbrs[:, None, :]) & (
            jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
            < jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1)
        )
        valid &= ~jnp.any(dup, axis=2)
        in_beam = jnp.any(nbrs[:, :, None] == beam_ids[:, None, :], axis=2)
        valid &= ~in_beam
        slots = _hash_slot(nbrs, hash_bits)                         # [B, C]
        seen = jnp.take_along_axis(visited, slots, axis=1) == nbrs
        valid &= ~seen
        row = jnp.arange(b)[:, None].repeat(c, axis=1)
        visited = visited.at[row, slots].set(
            jnp.where(valid, nbrs, jnp.take_along_axis(visited, slots, axis=1)),
            mode="drop",
        )

        cand_scores = jnp.where(valid, cand_scores, NEG_INF)
        cand_ids = jnp.where(valid, nbrs, n_sentinel)

        # --- merge into beam ---
        all_scores = jnp.concatenate([beam_scores, cand_scores], axis=1)
        all_ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
        all_exp = jnp.concatenate(
            [expanded, jnp.zeros((b, c), dtype=jnp.bool_)], axis=1
        )
        top_scores, pos = jax.lax.top_k(all_scores, L)
        top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        top_exp = jnp.take_along_axis(all_exp, pos, axis=1)
        return (top_ids, top_scores, top_exp, visited, it + 1,
                vlog_ids, vlog_scores, aux)

    state = (beam_ids, beam_scores, expanded, visited, jnp.int32(0),
             vlog_ids, vlog_scores, aux_init)
    if iter_budget is not None:
        # segmented execution: run at most `iter_budget` hops from
        # `init_state` (or fresh) and hand the whole state back to the
        # caller. The recompute engine drives the traversal in
        # host-looped segments because one hop embeds thousands of
        # sequences and a full traversal in a single dispatch exceeds
        # the execution wall limit of the TPU relay (the worker is
        # killed between ~50s and ~80s; bisect r4).
        if init_state is not None:
            state = init_state
        start = state[4]

        def seg_cond(s):
            return cond(s) & (s[4] < start + iter_budget)

        return jax.lax.while_loop(seg_cond, body, state)
    (beam_ids, beam_scores, expanded, visited, _, vlog_ids, vlog_scores,
     _aux) = jax.lax.while_loop(cond, body, state)
    return beam_ids, beam_scores, vlog_ids, vlog_scores


# ---------------------------------------------------------------- stored-vector


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "max_iters", "metric", "hash_bits",
                      "expansions", "precision", "track_visited",
                      "n_entries"),
)
def beam_search_batch(
    queries: jnp.ndarray,      # [B, D] f32
    vectors: jnp.ndarray,      # [N+1, D] f32, row N = zeros (sentinel)
    adjacency: jnp.ndarray,    # [N+1, R] int32, pad = N
    sq_norms: jnp.ndarray,     # [N+1] f32 (|v|^2; only used for l2)
    entry: jnp.ndarray,
    exclude: jnp.ndarray,
    beam_width: int,
    max_iters: int,
    metric: str,
    hash_bits: int = 12,
    expansions: int = 1,
    precision: str = "highest",
    track_visited: int = 0,
    seed_ids=None,
    n_entries: int = 16,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (beam_ids, beam_scores); with track_visited=T > 0 also
    (vlog_ids [B, T], vlog_scores [B, T]) — see _beam_search_core.

    seed_ids [M]: when given, each query scores the seed pool (one cheap
    contraction) and starts from its n_entries best seeds instead of the
    shared entry — query-adaptive entry selection."""
    n_sentinel = vectors.shape[0] - 1
    # "default" lets the MXU run single-pass bf16 (~6x the f32 rate) —
    # used by the graph *builder*, where candidate sets are re-measured
    # by the f32 robust prune anyway; serving search keeps "highest".
    prec = None if precision == "default" else jax.lax.Precision.HIGHEST

    def score_fn(q, ids):
        vecs = vectors[ids]                                     # [B, K, D]
        dots = jnp.einsum(
            "bkd,bd->bk", vecs, q,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if metric == "l2":
            return 2.0 * dots - sq_norms[ids]
        return dots

    def expand_fn(q, u):
        nbrs = adjacency[u].reshape(q.shape[0], -1)
        return nbrs, score_fn(q, nbrs)

    entry_sc = None
    if seed_ids is not None:
        # score the shared seed pool with ONE matmul against the
        # device-resident pool matrix — never a [B, M, D] row gather
        m = seed_ids.shape[0]
        seed_vecs = vectors[seed_ids]                        # [M, D]
        seed_dots = jnp.einsum(
            "md,bd->bm", seed_vecs, queries,
            preferred_element_type=jnp.float32, precision=prec,
        )
        if metric == "l2":
            seed_scores = 2.0 * seed_dots - sq_norms[seed_ids][None, :]
        else:
            seed_scores = seed_dots
        s_eff = min(n_entries, m)
        entry_sc, best = jax.lax.top_k(seed_scores, s_eff)
        entry = seed_ids[best]                               # [B, S]
    out = _beam_search_core(
        queries, adjacency.shape[1], entry, exclude, expand_fn, score_fn,
        n_sentinel, beam_width, max_iters, hash_bits, expansions,
        track_visited, entry_scores=entry_sc,
    )
    return out if track_visited > 0 else out[:2]


# ------------------------------------------------------------ inline blocks
#
# The decisive TPU layout optimization (profiled in evals/hop_profile.py):
# XLA's row gather `vectors[nbrs]` moves ~131k separate D-sized rows per
# hop and costs ~1.3 ms; gathering each expanded node's *pre-packed*
# neighbor block `blocks[u]` moves the same bytes in E*B contiguous
# R*D-sized granules and costs ~0.4 ms. Storage: every node stores its
# R neighbors' vectors inline (int8 row-quantized by default — 1M x 128
# at R=48 is 6.1 GB vs 12.3 GB bf16), plus the dequant scale and |v|^2
# per inlined row. The traversal scores candidates from the inline
# blocks; the final beam is rescored against the full-precision corpus,
# so quantization guides the walk but never ranks the results.


def build_inline_blocks(
    vectors: jnp.ndarray,    # [N+1, D] f32 device (sentinel row = zeros)
    adjacency: jnp.ndarray,  # [N+1, R] int32 device
    dtype: str = "int8",     # "int8" | "bf16"
    chunk: int = 131072,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Returns (blocks [N+1, R, D] int8|bf16, scale_in [N+1, R] f32 or
    None, nsq_in [N+1, R] f32). Built chunked on device so peak temp
    memory stays ~chunk*R*D."""
    n1, d = vectors.shape
    r = adjacency.shape[1]
    nsq = jnp.sum(vectors * vectors, axis=1)                  # [N+1]
    if dtype == "int8":
        scale = jnp.maximum(
            jnp.max(jnp.abs(vectors), axis=1), 1e-12
        ) / 127.0                                             # [N+1]
        src = jnp.clip(
            jnp.round(vectors / scale[:, None]), -127, 127
        ).astype(jnp.int8)
        scale_in = scale[adjacency]                           # [N+1, R] f32
        out_dtype = jnp.int8
    else:
        src = vectors.astype(jnp.bfloat16)
        scale_in = None
        out_dtype = jnp.bfloat16
    nsq_in = nsq[adjacency]                                   # [N+1, R] f32

    step = min(chunk, n1)
    blocks = jnp.zeros((n1, r, d), out_dtype)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def upd(buf, s, a, i):
        rows = jax.lax.dynamic_slice_in_dim(a, i, step)
        return jax.lax.dynamic_update_slice(buf, s[rows], (i, 0, 0))

    for i in range(0, n1, step):
        blocks = upd(blocks, src, adjacency, jnp.int32(min(i, n1 - step)))
    return blocks, scale_in, nsq_in


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "max_iters", "metric", "hash_bits",
                     "expansions", "n_entries"),
)
def beam_search_inline_batch(
    queries: jnp.ndarray,     # [B, D] f32
    corpus: jnp.ndarray,      # [N+1, D] f32|bf16 (rescore source)
    adjacency: jnp.ndarray,   # [N+1, R] int32, pad = N
    blocks: jnp.ndarray,      # [N+1, R, D] int8|bf16
    scale_in,                 # [N+1, R] f32 | None
    nsq_in: jnp.ndarray,      # [N+1, R] f32
    corpus_nsq: jnp.ndarray,  # [N+1] f32
    seed_ids: jnp.ndarray,    # [M] int32
    seed_vecs: jnp.ndarray,   # [M, D] bf16
    exclude: jnp.ndarray,     # [B] int32
    beam_width: int,
    max_iters: int,
    metric: str,
    hash_bits: int = 12,
    expansions: int = 2,
    n_entries: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Serving-grade graph search: inline-block traversal + exact
    rescore. Returns (beam_ids [B, L], rescored beam_scores [B, L]),
    descending."""
    b = queries.shape[0]
    n_sentinel = corpus.shape[0] - 1
    q_bf = queries.astype(jnp.bfloat16)

    # --- query-adaptive entries: ONE matmul over the seed pool ---
    seed_dots = jnp.einsum(
        "md,bd->bm", seed_vecs, q_bf, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        seed_scores = 2.0 * seed_dots - corpus_nsq[seed_ids][None, :]
    else:
        seed_scores = seed_dots
    s_eff = min(n_entries, seed_ids.shape[0])
    entry_sc, best = jax.lax.top_k(seed_scores, s_eff)
    entry = seed_ids[best]                                    # [B, S]

    def expand_fn(q, u):
        nbrs = adjacency[u].reshape(b, -1)                    # [B, E*R]
        blk = blocks[u]                                       # [B, E, R, D]
        dots = jnp.einsum(
            "berd,bd->ber", blk.astype(jnp.bfloat16), q_bf,
            preferred_element_type=jnp.float32,
        ).reshape(b, -1)
        if scale_in is not None:
            dots = dots * scale_in[u].reshape(b, -1)
        if metric == "l2":
            return nbrs, 2.0 * dots - nsq_in[u].reshape(b, -1)
        return nbrs, dots

    beam_ids, _, _, _ = _beam_search_core(
        queries, adjacency.shape[1], entry, exclude, expand_fn,
        None, n_sentinel, beam_width, max_iters, hash_bits,
        expansions, 0, entry_scores=entry_sc,
    )

    # --- exact rescore of the final beam (fixes int8/bf16 ordering) ---
    rows = corpus[beam_ids].astype(jnp.float32)               # [B, L, D]
    dots = jnp.einsum(
        "bld,bd->bl", rows, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        scores = 2.0 * dots - corpus_nsq[beam_ids]
    else:
        scores = dots
    scores = jnp.where(beam_ids == n_sentinel, NEG_INF, scores)
    top_scores, pos = jax.lax.top_k(scores, beam_ids.shape[1])
    top_ids = jnp.take_along_axis(beam_ids, pos, axis=1)
    return top_ids, top_scores


# ---------------------------------------------------------------- recompute


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "max_iters", "metric", "hash_bits", "config",
        "expansions", "visited_pool", "n_entries", "use_cache",
        "enc_chunk",
    ),
)
def beam_search_recompute_batch(
    queries: jnp.ndarray,        # [B, D] f32 (query embeddings)
    token_ids: jnp.ndarray,      # [N+1, T] int32 (row N = padding)
    attn_mask: jnp.ndarray,      # [N+1, T] int32
    adjacency: jnp.ndarray,      # [N+1, R] int32
    bert_params,                 # pytree
    entry: jnp.ndarray,
    exclude: jnp.ndarray,
    beam_width: int,
    max_iters: int,
    metric: str,
    config,                      # BertConfig (hashable static)
    hash_bits: int = 12,
    expansions: int = 1,
    visited_pool: int = 128,
    seed_ids: Optional[jnp.ndarray] = None,    # [M] int32 shared pool
    seed_vecs: Optional[jnp.ndarray] = None,   # [M, D] f32 cached embeds
    n_entries: int = 8,
    use_cache: bool = False,
    enc_chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The LEANN trick, fused: no stored vectors exist — every hop's
    candidates are re-embedded by the BERT encoder *inside* the traversal
    loop, on the same chip.

    visited_pool > 0 merges the visited log into the final top-k: every
    logged node's score is already an exact fresh-embedding score
    (computed at expansion time), so recovering true neighbors the beam
    dropped costs ZERO extra encoder forwards — the cheapest possible
    recall lever in the one mode where scoring is expensive.

    seed_ids/seed_vecs: query-adaptive entry selection for the pruned
    mode. The pool's embeddings are computed ONCE at engine build (the
    only extra encoder cost); per query, one [B, M] matmul picks the
    n_entries best starts — the same cluster-coverage lever the
    stored-vector engines use (seed_pool_size rationale), at zero
    per-query encoder forwards."""
    # Per-hop encoder forwards are chunked inside _recompute_fns: at
    # beam 64+ a single hop embeds B*R (= 256*48 ~ 12k) sequences at
    # once, and the unchunked forward's live set (QKV + attention +
    # MLP intermediate, bf16) approaches the v5e's 16GB HBM. Chunks of
    # ~4k sequences (LEANN_RECOMPUTE_CHUNK) bound the transient while
    # keeping matmuls MXU-sized.
    n_sentinel, expand_fn, score_fn = _recompute_fns(
        token_ids, attn_mask, adjacency, bert_params, metric, config)
    entry, entry_sc = _recompute_entry(
        queries, entry, seed_ids, seed_vecs, metric, n_entries,
        beam_width)

    aux0: Tuple = ()
    if use_cache:
        n_sentinel, expand_fn = _recompute_cached_fns(
            token_ids, attn_mask, adjacency, bert_params, metric, config,
            enc_chunk)
        aux0 = _recompute_cache_init(
            token_ids.shape[0], queries.shape[1], seed_ids, seed_vecs)

    beam_ids, beam_sc, vlog_ids, vlog_sc = _beam_search_core(
        queries, adjacency.shape[1], entry, exclude, expand_fn, score_fn,
        n_sentinel, beam_width, max_iters, hash_bits, expansions,
        track_visited=visited_pool, entry_scores=entry_sc,
        aux_init=aux0, stateful_expand=use_cache,
    )
    if not visited_pool:
        return beam_ids, beam_sc
    return _merge_visited(beam_ids, beam_sc, vlog_ids, vlog_sc, n_sentinel)


def _recompute_fns(token_ids, attn_mask, adjacency, bert_params,
                   metric, config):
    """Shared expand/score closures for the recompute jits (the logic
    documented in beam_search_recompute_batch)."""
    from leann_tpu.models.bert import bert_forward

    n_sentinel = token_ids.shape[0] - 1
    chunk_target = int(os.environ.get("LEANN_RECOMPUTE_CHUNK", 4096))

    def _encode(toks, mask):
        rows = toks.shape[0]
        if rows <= chunk_target:
            return bert_forward(bert_params, toks, mask, config)
        n_chunks = -(-rows // chunk_target)
        chunk = -(-rows // n_chunks)
        pad = n_chunks * chunk - rows
        if pad:
            toks = jnp.pad(toks, ((0, pad), (0, 0)))
            mask = jnp.pad(mask, ((0, pad), (0, 0)))
        toks = toks.reshape(n_chunks, chunk, -1)
        mask = mask.reshape(n_chunks, chunk, -1)
        emb = jax.lax.map(
            lambda tm: bert_forward(bert_params, tm[0], tm[1], config),
            (toks, mask))
        return emb.reshape(n_chunks * chunk, -1)[:rows]

    def score_fn(q, ids):
        b, k = ids.shape
        toks = token_ids[ids].reshape(b * k, -1)
        mask = attn_mask[ids].reshape(b * k, -1)
        emb = _encode(toks, mask)
        emb = emb.reshape(b, k, -1)
        dots = jnp.einsum(
            "bkd,bd->bk", emb, q, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            sq = jnp.sum(emb * emb, axis=-1)
            return 2.0 * dots - sq
        return dots

    def expand_fn(q, u):
        nbrs = adjacency[u].reshape(q.shape[0], -1)
        return nbrs, score_fn(q, nbrs)

    return n_sentinel, expand_fn, score_fn


def _recompute_cache_init(n_rows, d, seed_ids, seed_vecs, dtype=None):
    """Fresh per-batch embedding cache: [N+1, D] vectors + valid bitmap,
    pre-seeded with the engine's entry pool (hubs are exactly the nodes
    every query revisits first). f32 default keeps cached scores
    bit-identical to the uncached path; LEANN_RECOMPUTE_CACHE_DTYPE=bf16
    halves the [N+1, D] footprint for 1M-scale corpora (3.0 -> 1.5GB)
    at a sub-1e-2 score perturbation."""
    if dtype is None:
        dtype = (jnp.bfloat16
                 if os.environ.get("LEANN_RECOMPUTE_CACHE_DTYPE") == "bf16"
                 else jnp.float32)
    vecs = jnp.zeros((n_rows, d), dtype)
    valid = jnp.zeros((n_rows,), jnp.bool_)
    if seed_ids is not None and seed_vecs is not None:
        vecs = vecs.at[seed_ids].set(seed_vecs.astype(dtype))
        valid = valid.at[seed_ids].set(True)
    return vecs, valid


def _recompute_cached_fns(token_ids, attn_mask, adjacency, bert_params,
                          metric, config, enc_chunk=2048):
    """Cross-query dedup for the recompute traversal (the config-3
    throughput lever). The plain expand_fn embeds every candidate slot:
    B x E*R sequences per hop, even though queries in a batch expand the
    same hubs and graph-local neighbor rows overlap heavily — at 100k
    nodes a 256-query traversal issues ~1.8M encoder forwards for at
    most 100k distinct nodes. Here every encoded embedding lands in a
    dense device cache (aux = ([N+1, D] vecs, [N+1] valid)); per hop the
    candidate ids are sorted, first-occurrences not yet cached are
    compacted to the front of a miss buffer, and ONLY those rows run the
    encoder — in fixed-size chunks driven by a dynamic-trip-count
    lax.while_loop, so compute scales with unique misses while every
    shape stays static. Scoring is then one cache gather + einsum.

    Replaces the reference's semantics (re-embed everything per query,
    src/index/recompute.rs:86-93) with encode-once-per-batch."""
    from leann_tpu.models.bert import bert_forward

    n_sentinel = token_ids.shape[0] - 1
    # big chunks amortize encoder launch overhead on the bulk; the
    # small-chunk tail bounds per-hop rounding waste at c_small rows
    # (144 hops x 2048/2 mean waste would exceed the useful work).
    # enc_chunk is a STATIC arg of the calling jits (not an env read at
    # trace time) so changing it actually recompiles.
    c_big = max(16, int(enc_chunk))
    c_small = max(16, c_big // 8)

    def _encode_rows(rows):
        return bert_forward(
            bert_params, token_ids[rows], attn_mask[rows], config)

    def expand_fn(q, u, aux):
        cache_vecs, cache_valid = aux
        b = q.shape[0]
        nbrs = adjacency[u].reshape(b, -1)                     # [B, C]
        flat = nbrs.reshape(-1)                                # [M]
        m = flat.shape[0]

        sorted_ids = jnp.sort(flat)
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_),
             sorted_ids[1:] != sorted_ids[:-1]])
        miss = first & (~cache_valid[sorted_ids]) \
            & (sorted_ids != n_sentinel)
        miss_count = jnp.sum(miss.astype(jnp.int32))
        pos = jnp.cumsum(miss.astype(jnp.int32)) - 1
        buf_len = m + c_big  # slack: dynamic_slice never clips live rows
        miss_buf = jnp.full((buf_len,), n_sentinel, jnp.int32)
        miss_buf = miss_buf.at[jnp.where(miss, pos, buf_len)].set(
            sorted_ids, mode="drop")

        def chunk_body(chunk, offset):
            def run(st):
                i, vecs, valid = st
                rows = jax.lax.dynamic_slice(
                    miss_buf, (offset + i * chunk,), (chunk,))
                emb = _encode_rows(rows)
                # sentinel pad rows scatter junk into row N and mark it
                # valid — harmless: sentinel candidates are masked in
                # the core before admission
                vecs = vecs.at[rows].set(emb.astype(vecs.dtype))
                valid = valid.at[rows].set(True)
                return (i + 1, vecs, valid)

            return run

        n_big = miss_count // c_big
        _, cache_vecs, cache_valid = jax.lax.while_loop(
            lambda st: st[0] < n_big,
            chunk_body(c_big, jnp.int32(0)),
            (jnp.int32(0), cache_vecs, cache_valid))
        tail_start = n_big * c_big
        n_small = (miss_count - tail_start + c_small - 1) // c_small
        _, cache_vecs, cache_valid = jax.lax.while_loop(
            lambda st: st[0] < n_small,
            chunk_body(c_small, tail_start),
            (jnp.int32(0), cache_vecs, cache_valid))

        emb = cache_vecs[nbrs].astype(jnp.float32)             # [B, C, D]
        dots = jnp.einsum(
            "bkd,bd->bk", emb, q, preferred_element_type=jnp.float32)
        if metric == "l2":
            scores = 2.0 * dots - jnp.sum(emb * emb, axis=-1)
        else:
            scores = dots
        return nbrs, scores, (cache_vecs, cache_valid)

    return n_sentinel, expand_fn


def _recompute_entry(queries, entry, seed_ids, seed_vecs, metric,
                     n_entries, beam_width):
    if seed_vecs is None:
        return entry, None
    seed_dots = jnp.einsum(
        "md,bd->bm", seed_vecs, queries,
        preferred_element_type=jnp.float32)
    if metric == "l2":
        seed_scores = (
            2.0 * seed_dots
            - jnp.sum(seed_vecs * seed_vecs, axis=1)[None, :])
    else:
        seed_scores = seed_dots
    s_eff = min(n_entries, int(seed_ids.shape[0]), beam_width)
    entry_sc, best = jax.lax.top_k(seed_scores, s_eff)
    return seed_ids[best], entry_sc


def _recompute_done(state, max_iters, n_sentinel):
    beam_ids, beam_scores, expanded, _, it = state[:5]
    live = (~expanded) & (beam_ids != n_sentinel) & (beam_scores > NEG_INF)
    return (it >= max_iters) | ~jnp.any(live)


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "max_iters", "metric", "hash_bits", "config",
        "expansions", "visited_pool", "n_entries", "segment_iters",
        "use_cache", "enc_chunk",
    ),
)
def _recompute_segment_jit(
    queries, token_ids, attn_mask, adjacency, bert_params, entry,
    exclude, state, seed_ids, seed_vecs,
    beam_width: int, max_iters: int, metric: str, config,
    hash_bits: int, expansions: int, visited_pool: int, n_entries: int,
    segment_iters: int, use_cache: bool = False,
    enc_chunk: int = 2048,
):
    """One traversal segment (at most `segment_iters` hops). state=None
    starts fresh (seeding included); otherwise resumes. Returns
    (state, done). The host loops segments because a full recompute
    traversal in one dispatch exceeds the TPU relay's execution wall
    limit (worker killed between ~50s and ~80s of one program; r4
    bisect) — only the scalar `done` flag crosses to the host.
    With use_cache the embedding cache rides inside `state` (device-
    resident between dispatches, never crossing the relay)."""
    n_sentinel, expand_fn, score_fn = _recompute_fns(
        token_ids, attn_mask, adjacency, bert_params, metric, config)
    aux0: Tuple = ()
    if use_cache:
        n_sentinel, expand_fn = _recompute_cached_fns(
            token_ids, attn_mask, adjacency, bert_params, metric, config,
            enc_chunk)
        if state is None:
            aux0 = _recompute_cache_init(
                token_ids.shape[0], queries.shape[1], seed_ids, seed_vecs)
    entry_sc = None
    if state is None:
        entry, entry_sc = _recompute_entry(
            queries, entry, seed_ids, seed_vecs, metric, n_entries,
            beam_width)
    state = _beam_search_core(
        queries, adjacency.shape[1], entry, exclude, expand_fn, score_fn,
        n_sentinel, beam_width, max_iters, hash_bits, expansions,
        track_visited=visited_pool, entry_scores=entry_sc,
        iter_budget=segment_iters, init_state=state,
        aux_init=aux0, stateful_expand=use_cache,
    )
    return state, _recompute_done(state, max_iters, n_sentinel)


@functools.partial(jax.jit, static_argnames=("metric", "n_sentinel"))
def _recompute_finish_jit(state, queries, metric, n_sentinel):
    beam_ids, beam_sc = state[0], state[1]
    vlog_ids, vlog_sc = state[5], state[6]
    return _merge_visited(beam_ids, beam_sc, vlog_ids, vlog_sc, n_sentinel)


def beam_search_recompute_segmented(
    queries, token_ids, attn_mask, adjacency, bert_params, entry,
    exclude, beam_width, max_iters, metric, config,
    hash_bits=12, expansions=1, visited_pool=128,
    seed_ids=None, seed_vecs=None, n_entries=8, segment_iters=8,
    use_cache=False, enc_chunk=2048,
):
    """Host-driven segmented recompute traversal (see
    _recompute_segment_jit). Keeps every array on device between
    dispatches; syncs one bool per segment."""
    state = None
    done = False
    while not done:
        state, done_dev = _recompute_segment_jit(
            queries, token_ids, attn_mask, adjacency, bert_params,
            entry, exclude, state, seed_ids, seed_vecs,
            beam_width=beam_width, max_iters=max_iters, metric=metric,
            config=config, hash_bits=hash_bits, expansions=expansions,
            visited_pool=visited_pool, n_entries=n_entries,
            segment_iters=segment_iters, use_cache=use_cache,
            enc_chunk=enc_chunk,
        )
        done = bool(done_dev)
    if not visited_pool:
        return state[0], state[1]
    return _recompute_finish_jit(
        state, queries, metric=metric,
        n_sentinel=token_ids.shape[0] - 1)


# ---------------------------------------------------------------- host API


def seed_pool_size(n: int) -> int:
    """Entry-seed pool size shared by every traversal engine.

    Coverage math: a region holding f of the corpus is unseeded with
    probability (1-f)^pool ~ exp(-f*pool). The old 1024 floor left
    ~13% of a 500-cluster corpus unseeded (e^-2) — measured as the
    config-0 recall ceiling (~0.988 at any beam/L): queries whose
    cluster never got a seed must cross clusters on alpha-pruned long
    edges, which high-d well-separated mixtures rarely keep. A 4096
    floor drives that to e^-8 (~0.03%); the per-query cost is one
    [B, pool] bf16 matmul — noise next to a single hop. Override with
    LEANN_SEED_POOL."""
    env = os.environ.get("LEANN_SEED_POOL")
    if env:
        return int(min(int(env), max(1, n)))
    return int(min(max(4096, 4 * int(n ** 0.5)), max(1, n)))


def _bucket(b: int) -> int:
    """Pad batch sizes to powers of two so jit caches stay small."""
    size = 8
    while size < b:
        size *= 2
    return size


class BeamSearchEngine:
    """Host-facing wrapper: owns the device-resident search state.

    block_mode picks the traversal layout:
      "auto"  - int8 inline blocks when they fit the HBM budget, bf16
                inline on small corpora, row-gather otherwise
      "int8" / "bf16" - force inline blocks at that dtype
      "none"  - row-gather traversal (the builder's layout; no inline
                memory cost — required when adjacency still changes)
    """

    # HBM budget for the inline structures (v5e: ~9.5 GB usable behind
    # the axon runtime; leave room for corpus + state + scratch)
    INLINE_BUDGET_BYTES = int(6.8e9)

    def __init__(
        self,
        vectors: np.ndarray,
        adjacency: np.ndarray,
        medoid: int,
        metric: str = "ip",
        max_iters: Optional[int] = None,
        hash_bits: int = 12,
        expansions: int = 2,
        block_mode: str = "auto",
        visited_pool: int = 128,
    ):
        # visited-log rescue applies to the row-gather path (exact f32
        # scores); inline block modes keep their quantized-score beam
        self.visited_pool = visited_pool
        self.expansions = max(1, expansions)
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.n, self.d = vectors.shape
        self.metric_in = metric
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
            metric = "ip"
        self.metric = metric
        self.hash_bits = hash_bits
        self.max_iters = max_iters

        # sentinel row N: zero vector
        self.vectors = jnp.asarray(
            np.concatenate([vectors, np.zeros((1, self.d), np.float32)])
        )
        adj = np.ascontiguousarray(adjacency, dtype=np.int32)
        r = adj.shape[1]
        if adj.shape[0] == self.n:
            adj = np.concatenate([adj, np.full((1, r), self.n, np.int32)])
        self.adjacency = jnp.asarray(adj)
        vf = np.asarray(self.vectors, dtype=np.float32)
        self.sq_norms = jnp.asarray((vf * vf).sum(axis=1))
        self.medoid = int(medoid)
        # query-adaptive entry selection: a fixed random seed pool is
        # scored per query (one matmul) and each query starts from its
        # best seeds — on clustered corpora this lands the descent
        # inside the right region immediately
        rng = np.random.default_rng(0)
        pool = seed_pool_size(self.n)
        seeds = rng.choice(self.n, size=pool, replace=False)
        self.seed_ids = jnp.asarray(
            np.unique(np.concatenate([[medoid], seeds])).astype(np.int32)
        )
        self.seed_vecs = self.vectors[self.seed_ids].astype(jnp.bfloat16)
        self.entries = jnp.int32(medoid)

        if block_mode == "auto":
            inline_b = (self.n + 1) * r * (self.d + 8)
            if (self.n + 1) * r * (2 * self.d + 4) <= int(2e9):
                block_mode = "bf16"
            elif inline_b <= self.INLINE_BUDGET_BYTES:
                block_mode = "int8"
            else:
                block_mode = "none"
        self.block_mode = block_mode
        if block_mode in ("int8", "bf16"):
            self.blocks, self.scale_in, self.nsq_in = build_inline_blocks(
                self.vectors, self.adjacency, dtype=block_mode
            )
        else:
            self.blocks = self.scale_in = self.nsq_in = None

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        beam_width: int = 64,
        exclude: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (idx [B, k] int32 with -1 padding, scores [B, k])."""
        ids, scores = self.search_beam(queries, beam_width, exclude)
        k = min(k, ids.shape[1])
        idx = np.asarray(ids[:, :k])
        sc = np.asarray(scores[:, :k])
        idx = np.where(idx == self.n, -1, idx)
        return idx, sc

    def _prep(self, queries, exclude):
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        bb = _bucket(b)
        if bb != b:
            q = np.concatenate([q, np.zeros((bb - b, self.d), np.float32)])
        exc = np.full((bb,), -1, dtype=np.int32)
        if exclude is not None:
            exc[:b] = np.asarray(exclude, dtype=np.int32)
        return q, exc, b

    def search_beam(
        self,
        queries: np.ndarray,
        beam_width: int = 64,
        exclude: Optional[np.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full beam (ids, scores), best-first sorted."""
        q, exc, b = self._prep(queries, exclude)
        max_iters = self.max_iters or (
            (4 * beam_width) // self.expansions + 32
        )
        n_entries = min(16, max(1, beam_width // 2))
        if self.blocks is not None:
            ids, scores = beam_search_inline_batch(
                jnp.asarray(q),
                self.vectors,
                self.adjacency,
                self.blocks,
                self.scale_in,
                self.nsq_in,
                self.sq_norms,
                self.seed_ids,
                self.seed_vecs,
                jnp.asarray(exc),
                beam_width=beam_width,
                max_iters=max_iters,
                metric=self.metric,
                hash_bits=self.hash_bits,
                expansions=self.expansions,
                n_entries=n_entries,
            )
        else:
            ids, scores = _xla_visited_search_jit(
                jnp.asarray(q), self.vectors, self.adjacency,
                self.sq_norms, self.entries, self.seed_ids,
                jnp.asarray(exc), beam_width, max_iters, self.metric,
                self.hash_bits, self.expansions, n_entries,
                self.visited_pool,
            )
        return ids[:b], scores[:b]

    def search_many_device(self, qs, k=10, beam_width=64):
        """[M, B, D] device-resident query batches -> (ids, scores)
        [M, B, k] in ONE dispatch (lax.scan) — relay amortization for
        honest device timing and coalesced serving. Row-gather mode
        only (the inline modes are superseded by the fused kernel)."""
        if self.blocks is not None:
            raise NotImplementedError(
                "search_many_device: row-gather mode only")
        mi = self.max_iters or ((4 * beam_width) // self.expansions + 32)
        n_entries = min(16, max(1, beam_width // 2))
        b = qs.shape[1]
        exc = jnp.full((b,), -1, jnp.int32)
        ids, scores = _xla_search_many_jit(
            qs, self.vectors, self.adjacency, self.sq_norms,
            self.entries, self.seed_ids, exc, beam_width, mi,
            self.metric, self.hash_bits, self.expansions, n_entries,
            self.visited_pool,
        )
        return ids[:, :, :k], scores[:, :, :k]


def _merge_visited(beam_ids, beam_sc, vlog_ids, vlog_sc, n_sentinel):
    """Top-|beam| over beam ++ visited-log by score. Scores must be in
    one consistent space (exact f32 here); duplicates (visited entries
    re-admitted to the beam) carry identical scores — id-sorted
    adjacency dedup keeps one."""
    cand = jnp.concatenate([beam_ids, vlog_ids], axis=1)
    sc = jnp.concatenate([beam_sc, vlog_sc], axis=1)
    order = jnp.argsort(cand, axis=1)
    cand_s = jnp.take_along_axis(cand, order, axis=1)
    sc_s = jnp.take_along_axis(sc, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((cand.shape[0], 1), bool),
         cand_s[:, 1:] == cand_s[:, :-1]], axis=1)
    sc_s = jnp.where(dup | (cand_s == n_sentinel), NEG_INF, sc_s)
    top_sc, pos = jax.lax.top_k(sc_s, beam_ids.shape[1])
    top_ids = jnp.take_along_axis(cand_s, pos, axis=1)
    return jnp.where(top_sc == NEG_INF, n_sentinel, top_ids), top_sc


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "max_iters", "metric", "hash_bits",
                     "expansions", "n_entries", "visited_pool"),
)
def _xla_visited_search_jit(
    queries, vectors, adjacency, sq_norms, entry, seed_ids, exclude,
    beam_width, max_iters, metric, hash_bits, expansions, n_entries,
    visited_pool=0,
):
    """Row-gather traversal + visited-log merge. Row-gather scores are
    exact f32 (scored against the full-precision corpus), so merging
    the visited log into the final top-k is free recall — the same
    lever as the recompute path's."""
    out = beam_search_batch(
        queries, vectors, adjacency, sq_norms, entry, exclude,
        beam_width=beam_width, max_iters=max_iters, metric=metric,
        hash_bits=hash_bits, expansions=expansions,
        track_visited=visited_pool, seed_ids=seed_ids,
        n_entries=n_entries,
    )
    if not visited_pool:
        return out[0], out[1]
    return _merge_visited(*out, vectors.shape[0] - 1)


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "max_iters", "metric", "hash_bits",
                     "expansions", "n_entries", "visited_pool"),
)
def _xla_search_many_jit(
    qs, vectors, adjacency, sq_norms, entry, seed_ids, exclude,
    beam_width, max_iters, metric, hash_bits, expansions, n_entries,
    visited_pool,
):
    def body(_, q):
        ids, scores = _xla_visited_search_jit(
            q, vectors, adjacency, sq_norms, entry, seed_ids, exclude,
            beam_width, max_iters, metric, hash_bits, expansions,
            n_entries, visited_pool,
        )
        return None, (ids, scores)

    _, (ids, scores) = jax.lax.scan(body, None, qs)
    return ids, scores


class RecomputeBeamEngine:
    """Pruned-index traversal: stored tokens, no stored vectors."""

    def __init__(
        self,
        token_ids: np.ndarray,    # [N, T]
        attn_mask: np.ndarray,    # [N, T]
        adjacency: np.ndarray,    # [N, R]
        medoid: int,
        encoder,                  # models.bert.BertEncoder
        metric: str = "ip",
        hash_bits: int = 12,
        visited_pool: int = 128,
        seed_pool: Optional[int] = None,   # 0 disables; None = default
    ):
        self.visited_pool = visited_pool
        self.n, t = token_ids.shape
        self.encoder = encoder
        self.metric = "ip" if metric == "cosine" else metric
        self.hash_bits = hash_bits
        self.token_ids = jnp.asarray(
            np.concatenate([token_ids, np.zeros((1, t), np.int32)])
        )
        self.attn_mask = jnp.asarray(
            np.concatenate([attn_mask, np.zeros((1, t), np.int32)])
        )
        adj = np.ascontiguousarray(adjacency, dtype=np.int32)
        r = adj.shape[1]
        if adj.shape[0] == self.n:
            adj = np.concatenate(
                [adj, np.full((1, r), self.n, np.int32)]
            )
        self.adjacency = jnp.asarray(adj)
        self.medoid = jnp.int32(medoid)

        # Query-adaptive entries without stored vectors: embed a fixed
        # seed pool ONCE here (the only extra encoder work), then every
        # query starts from its best pool members via one matmul. Pool =
        # high-in-degree hubs (well-connected region centers under the
        # alpha prune) + a uniform sample for cluster coverage. Without
        # this the pruned mode descends from the single medoid and pays
        # the same unseeded-cluster recall ceiling the stored-vector
        # engines had (see seed_pool_size).
        if seed_pool is None:
            seed_pool = int(os.environ.get("LEANN_RECOMPUTE_SEEDS", 1024))
        self.seed_ids = self.seed_vecs = None
        if seed_pool and self.n > 1:
            pool = min(seed_pool, self.n)
            indeg = np.bincount(
                adj[:-1][adj[:-1] < self.n], minlength=self.n)
            n_hub = min(max(pool // 4, 1), self.n)
            hubs = np.argpartition(indeg, -n_hub)[-n_hub:]
            rng = np.random.default_rng(0)
            rand = rng.choice(self.n, size=pool, replace=False)
            seed = np.unique(np.concatenate(
                [[int(medoid)], hubs, rand])).astype(np.int32)
            # pad to a power-of-two row count so this one-time encode
            # reuses the traversal's jit bucket instead of compiling a
            # unique [len(seed), T] forward
            s, sb = len(seed), _bucket(len(seed))
            tok = np.zeros((sb, t), np.int32)
            msk = np.zeros((sb, t), np.int32)
            tok[:s] = np.asarray(self.token_ids)[seed]
            msk[:s] = np.asarray(self.attn_mask)[seed]
            vecs = encoder.encode_tokens(tok, msk)[:s]
            self.seed_ids = jnp.asarray(seed)
            self.seed_vecs = jnp.asarray(
                np.ascontiguousarray(vecs, np.float32))

    def search(
        self, queries: np.ndarray, k: int = 10, beam_width: int = 32,
        max_iters: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        bb = _bucket(b)
        if bb != b:
            q = np.concatenate([q, np.zeros((bb - b, q.shape[1]), np.float32)])
        exc = np.full((bb,), -1, dtype=np.int32)
        # Segmented by default on a real TPU: one full traversal in a
        # single dispatch exceeds the relay's execution wall limit
        # (worker killed between ~50s and ~80s of one program — r4
        # bisect: max_iters=16 OK, 48 dead at bert-base/beam 64).
        # Segments of 8 hops stay well under it; state stays on device
        # between dispatches. 0 disables (single dispatch, CPU tests).
        seg_default = 8 if jax.devices()[0].platform in ("tpu", "axon") \
            else 0
        seg = int(os.environ.get("LEANN_RECOMPUTE_SEGMENT", seg_default))
        fn = beam_search_recompute_segmented if seg else \
            beam_search_recompute_batch
        kw = {"segment_iters": seg} if seg else {}
        # cross-query dedup cache (default on): every distinct node is
        # encoded at most once per search batch — at 100k nodes a
        # 256-query beam-64 traversal drops from ~1.8M to <=100k
        # encoder forwards. LEANN_RECOMPUTE_DEDUP=0 restores the
        # encode-every-candidate path (the A/B + parity baseline).
        kw["use_cache"] = os.environ.get(
            "LEANN_RECOMPUTE_DEDUP", "1") != "0"
        if kw["use_cache"]:
            kw["enc_chunk"] = int(
                os.environ.get("LEANN_RECOMPUTE_ENC_CHUNK", 2048))
        ids, scores = fn(
            jnp.asarray(q),
            self.token_ids,
            self.attn_mask,
            self.adjacency,
            self.encoder.params,
            self.medoid,
            jnp.asarray(exc),
            beam_width=beam_width,
            max_iters=max_iters or (2 * beam_width + 16),
            metric=self.metric,
            config=self.encoder.config,
            hash_bits=self.hash_bits,
            visited_pool=self.visited_pool,
            seed_ids=self.seed_ids,
            seed_vecs=self.seed_vecs,
            n_entries=min(16, max(1, beam_width // 2)),
            **kw,
        )
        k = min(k, ids.shape[1])
        idx = np.asarray(ids[:b, :k])
        sc = np.asarray(scores[:b, :k])
        idx = np.where(idx == self.n, -1, idx)
        return idx, sc
