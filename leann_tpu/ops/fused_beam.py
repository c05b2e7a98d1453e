"""Fused whole-traversal beam search: ONE Pallas kernel per query batch.

The XLA traversal (`ops/beam.py`) pays per-hop costs that dominate at
serving batch sizes: every hop is a fresh XLA dispatch chain (gather ->
masks -> top_k) with HBM round trips for each intermediate. This kernel
moves the *entire* best-first loop on-chip:

  - beam ids/scores/expanded-flags live in VMEM for the whole search
  - each hop DMAs only the expanded nodes' pre-packed records straight
    from HBM into VMEM scratch (int8 vectors; id/scale/|v|^2 metadata),
    scores them with one MXU dot, and merges with a bitonic sort network
  - the visited set is an exact ring buffer of the last V admitted ids
    (plus the in-beam check, which is what actually prevents cycles)
  - convergence is a guarded fori_loop: converged programs skip the
    body's DMAs and compute under @pl.when

Storage layout (built once by pack_fused(), device-side):
  blocks_i8 [N+1, R*D] int8  row-quantized neighbor vectors, flattened
  meta_i32  [N+1, MW]  int32 cols [0:R) nbr ids, [R:2R) scale bits,
                             [2R:3R) |v|^2 bits, rest pad (MW mult 128)

The traversal scores candidates from int8; callers rescore the returned
beam against the f32 corpus (same contract as beam_search_inline_batch).

Replaces the graph-walk role of the reference's usearch HNSW search
(`/root/reference/src/backend/hnsw.rs:79-88`) — redesigned as a batched
systolic-array program rather than pointer chasing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
BIG_I32 = np.int32(2**30)


# ------------------------------------------------------------------ pack


def quantize_corpus(
    vectors: jnp.ndarray,  # [N+1, D] f32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Row-quantize: (q8 [N+1, D] int8, scale [N+1] f32, nsq [N+1] f32)."""
    scale = jnp.maximum(jnp.max(jnp.abs(vectors), axis=1), 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(vectors / scale[:, None]), -127, 127).astype(
        jnp.int8
    )
    nsq = jnp.sum(vectors * vectors, axis=1)
    return q8, scale, nsq


def pack_fused(
    vectors: jnp.ndarray,    # [N+1, D] f32 (sentinel row N = zeros)
    adjacency: jnp.ndarray,  # [N+1, R] int32 (pad = N), R <= 128
    chunk: int = 131072,
    quant: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (blocks_i8 [N+1, R, D], meta_i32 [N+1, 3, 128]).

    Both arrays are 3D so the kernel's per-node DMA slices the UNTILED
    leading dim (Mosaic rejects 1-row slices of (8,128)-tiled dims).
    meta planes: [0] neighbor ids (lane pad = sentinel = N), [1]
    dequant-scale bits, [2] |v|^2 bits.
    """
    n1, d = vectors.shape
    n_sentinel = n1 - 1
    r = adjacency.shape[1]
    if r > 128:
        raise ValueError(f"fused pack supports R <= 128 (got {r})")

    q8, scale, nsq = quant if quant is not None else quantize_corpus(vectors)

    step = min(chunk, n1)
    blocks = jnp.zeros((n1, r, d), jnp.int8)
    meta = jnp.zeros((n1, 3, 128), jnp.int32)

    # large source arrays are ARGUMENTS, not closure captures — captured
    # arrays get baked into the HLO as constants (hundreds of MB)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def upd(bl, me, q8_, scale_, nsq_, adj_, i):
        rows = jax.lax.dynamic_slice_in_dim(adj_, i, step)  # [c, R]
        blk = q8_[rows]                                     # [c, R, D]
        idpad = jnp.full((step, 128 - r), n_sentinel, jnp.int32)
        fpad = jnp.zeros((step, 128 - r), jnp.int32)
        m = jnp.stack(
            [
                jnp.concatenate([rows, idpad], axis=1),
                jnp.concatenate(
                    [jax.lax.bitcast_convert_type(scale_[rows], jnp.int32),
                     fpad], axis=1),
                jnp.concatenate(
                    [jax.lax.bitcast_convert_type(nsq_[rows], jnp.int32),
                     fpad], axis=1),
            ],
            axis=1,
        )                                                   # [c, 3, 128]
        bl = jax.lax.dynamic_update_slice(bl, blk, (i, 0, 0))
        me = jax.lax.dynamic_update_slice(me, m, (i, 0, 0))
        return bl, me

    for i in range(0, n1, step):
        blocks, meta = upd(
            blocks, meta, q8, scale, nsq, adjacency,
            jnp.int32(min(i, n1 - step)),
        )
    return blocks, meta


@functools.partial(jax.jit, donate_argnums=(0, 1))
def repack_rows(
    blocks: jnp.ndarray,     # [N+1, R, D] i8 (donated)
    meta: jnp.ndarray,       # [N+1, 3, 128] i32 (donated)
    q8: jnp.ndarray,         # [N+1, D] i8
    scale: jnp.ndarray,      # [N+1] f32
    nsq: jnp.ndarray,        # [N+1] f32
    adjacency: jnp.ndarray,  # [N+1, R] i32
    rows: jnp.ndarray,       # [K] i32, pad = sentinel N
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refresh the packed records of `rows` after their adjacency rows
    changed (the graph builder's per-wave incremental repack). Pad rows
    (= N) rewrite the sentinel row with its own correct content —
    adjacency[N] is all-sentinel and q8[N] is zeros — so duplicate pad
    scatters are harmless."""
    n1 = blocks.shape[0]
    r = adjacency.shape[1]
    k = rows.shape[0]
    adj_rows = adjacency[rows]                              # [K, R]
    blk = q8[adj_rows]                                      # [K, R, D]
    idpad = jnp.full((k, 128 - r), n1 - 1, jnp.int32)
    fpad = jnp.zeros((k, 128 - r), jnp.int32)
    m = jnp.stack(
        [
            jnp.concatenate([adj_rows, idpad], axis=1),
            jnp.concatenate(
                [jax.lax.bitcast_convert_type(scale[adj_rows], jnp.int32),
                 fpad], axis=1),
            jnp.concatenate(
                [jax.lax.bitcast_convert_type(nsq[adj_rows], jnp.int32),
                 fpad], axis=1),
        ],
        axis=1,
    )                                                       # [K, 3, 128]
    blocks = blocks.at[rows].set(blk)
    meta = meta.at[rows].set(m)
    return blocks, meta


@functools.partial(
    jax.jit,
    static_argnames=("r", "beam_width", "max_iters", "metric",
                     "expansions", "track_visited", "qb", "interpret"),
)
def fused_wave_search(
    queries: jnp.ndarray,    # [B, D] f32, B % qb == 0
    vecs_dev: jnp.ndarray,   # [N+1, D] f32 (for the medoid seed score)
    sq_norms: jnp.ndarray,   # [N+1] f32
    blocks: jnp.ndarray,
    meta: jnp.ndarray,
    medoid: jnp.ndarray,     # [] int32
    exclude: jnp.ndarray,    # [B] int32 (the point being inserted)
    r: int,
    beam_width: int,
    max_iters: int,
    metric: str,
    expansions: int = 2,
    track_visited: int = 160,
    qb: int = 16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Graph-builder wave search on the fused kernel: medoid entry,
    visited-set logging. Returns (beam_ids [B, L], vlog_ids [B, VT])."""
    b = queries.shape[0]
    mv = vecs_dev[medoid]
    dots = queries @ mv                                     # [B]
    if metric == "l2":
        seed_sc = 2.0 * dots - sq_norms[medoid]
    else:
        seed_sc = dots
    seed_ids = jnp.broadcast_to(
        medoid.astype(jnp.int32)[None, None], (b, 1)
    )
    beam_ids, _, vlog = fused_beam_search(
        queries, blocks, meta, seed_ids, seed_sc[:, None], exclude,
        r=r, beam_width=beam_width, max_iters=max_iters, metric=metric,
        expansions=expansions, qb=qb, track_visited=track_visited,
        interpret=interpret,
    )
    return beam_ids, vlog[:, :track_visited]


# ------------------------------------------------------------ sort network


def _bitonic_desc(sc, ids, exp):
    """In-register bitonic sort, descending by score, carrying (ids, exp).
    sc/ids/exp: [Q, P] with P a power of two. Partner exchange for
    stride j uses the reshape-flip trick (static data movement only)."""
    q, p = sc.shape

    # full-shape iota: 1-row bool masks hit an unsupported i8->i1
    # truncation in Mosaic when broadcast into select_n
    idx = jax.lax.broadcasted_iota(jnp.int32, (q, p), 1)

    def partner(x, j):
        # element i's partner is i^j. Since (i&j)==0 positions read from
        # i+j and the rest from i-j, two lane-rolls + a select do the
        # exchange without reshapes (Mosaic rejects sub-lane-width shape
        # casts; it lowers roll natively).
        left = pltpu.roll(x, shift=p - j, axis=1)   # x[i+j] at position i
        right = pltpu.roll(x, shift=j, axis=1)      # x[i-j] at position i
        return jnp.where((idx & j) == 0, left, right)
    k = 2
    while k <= p:
        j = k // 2
        while j >= 1:
            ps, pi, pe = partner(sc, j), partner(ids, j), partner(exp, j)
            lower = (idx & j) == 0
            descending = (idx & k) == 0                   # block direction
            # keep-self predicate: in descending blocks the lower index
            # keeps the max; ascending blocks invert (they get flipped
            # into order by later stages). XNOR composition — select_n
            # on bool operands trips an i8->i1 truncation in Mosaic.
            want_max = ~(descending ^ lower)
            self_bigger = (sc > ps) | ((sc == ps) & lower)
            keep = ~(want_max ^ self_bigger)
            sc = jnp.where(keep, sc, ps)
            ids = jnp.where(keep, ids, pi)
            exp = jnp.where(keep, exp, pe)
            j //= 2
        k *= 2
    return sc, ids, exp


def _first_k_unexpanded(sc, exp, e):
    """Positions of the e best unexpanded live entries (arrays are sorted
    descending, so 'first match' = 'best'). Returns ([Q, e] positions,
    [Q, e] int32 active flags). Uses min-over-masked-iota; keeps
    everything 2D/int32 (1D bool stacks hit Mosaic vreg-cast limits)."""
    q, p = sc.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (q, p), 1)
    poss, actives = [], []
    taken = jnp.zeros_like(exp)
    for _ in range(e):
        mask = (exp == 0) & (taken == 0) & (sc > NEG_INF)
        cand = jnp.where(mask, iota, BIG_I32)
        pos = jnp.min(cand, axis=1, keepdims=True)       # [Q, 1]
        active = (pos < BIG_I32).astype(jnp.int32)       # [Q, 1]
        pos = jnp.where(active == 1, pos, 0)
        poss.append(pos)
        actives.append(active)
        taken = taken | (iota == pos).astype(exp.dtype)
    return (
        jnp.concatenate(poss, axis=1),
        jnp.concatenate(actives, axis=1),
    )


# ---------------------------------------------------------------- kernel


def _make_kernel(qb, e, r, d, l, p2, v, max_iters, metric, n_sentinel,
                 vt=0):
    """vt > 0 adds a [QB, vt] output logging the first vt/e hops'
    expanded node ids per query (the Vamana visited set V — the graph
    builder prunes over V ++ beam, see ops/vamana.py)."""
    if e > 2:
        raise ValueError("fused kernel supports expansions <= 2")
    rp = -(-r // 128) * 128   # lane-aligned candidate width per expansion
    c = e * rp                # candidate lanes entering the merge

    def rep_rows(x):
        """[QB, W] -> [QB*E, W] repeating each row E times (supported
        casts only: stack on a new middle axis, merge leading dims)."""
        if e == 1:
            return x
        return jnp.concatenate(
            [x[:, None, :]] * e, axis=1
        ).reshape(qb * e, x.shape[1])

    def kernel(
        q_ref,        # [QB, D] f32
        seed_id_ref,  # [QB, P2] i32 (pre-placed seeds, rest sentinel)
        seed_sc_ref,  # [QB, P2] f32 (rest -inf)
        excl_ref,     # [QB, 128] i32 (col 0 = exclude id)
        blocks_hbm,   # [N+1, R, D] i8 (ANY)
        meta_hbm,     # [N+1, 3, 128] i32 (ANY)
        out_id_ref,   # [QB, L] i32
        out_sc_ref,   # [QB, L] f32
        *rest,        # [out_vl_ref [QB, VT] i32 when vt>0] + scratch:
                      # state_sc/state_id/state_exp [QB, P2], ring
                      # [QB*E, V], upos [QB, 128], blk_scr, meta_scr,
                      # blk_sems, meta_sems
    ):
        if vt:
            out_vl_ref, rest_ = rest[0], rest[1:]
        else:
            out_vl_ref, rest_ = None, rest
        (state_sc, state_id, state_exp, ring, upos, blk_scr, meta_scr,
         blk_sems, meta_sems) = rest_
        if vt:
            out_vl_ref[:] = jnp.full((qb, vt), n_sentinel, jnp.int32)
        state_sc[:] = seed_sc_ref[:]
        state_id[:] = seed_id_ref[:]
        state_exp[:] = jnp.zeros((qb, p2), jnp.int32)
        ring[:] = jnp.full((qb * e, v), -1, jnp.int32)
        # seeds enter the ring so they are never re-admitted
        ring[:, : p2] = rep_rows(seed_id_ref[:])

        q_bf = q_ref[:].astype(jnp.bfloat16)              # [QB, D]
        excl_rep = rep_rows(excl_ref[:])[:, 0:1]          # [QB*E, 1]

        def hop(it, carry):
            done = carry
            sc, ids, exp = state_sc[:], state_id[:], state_exp[:]

            pos, active = _first_k_unexpanded(sc, exp, e)  # [QB, E] i32
            any_active = jnp.any(active == 1)

            # mark selected as expanded
            iota = jax.lax.broadcasted_iota(jnp.int32, (qb, p2), 1)
            hit = jnp.zeros((qb, p2), jnp.bool_)
            for t in range(e):
                hit = hit | (
                    (iota == pos[:, t : t + 1]) & (active[:, t : t + 1] == 1)
                )
            state_exp[:] = jnp.where(hit, 1, exp)

            # u node ids at the selected positions (one-hot contraction)
            u_cols = []
            for t in range(e):
                onehot = (iota == pos[:, t : t + 1]) & (
                    active[:, t : t + 1] == 1
                )
                u_t = jnp.max(
                    jnp.where(onehot, ids, 0), axis=1, keepdims=True
                )                                         # [QB, 1]
                u_t = jnp.where(active[:, t : t + 1] == 1, u_t, n_sentinel)
                u_cols.append(u_t)
            u = jnp.concatenate(u_cols, axis=1)           # [QB, E]
            upos[:, :e] = u

            if vt:
                # log this hop's expanded ids at lanes [it*e, it*e + e)
                # (inactive expansions log the sentinel); hops past vt/e
                # fall outside the lane range and write nothing
                lane = jax.lax.broadcasted_iota(jnp.int32, (qb, vt), 1)
                if e == 2:
                    u_lane = jnp.where(
                        lane % 2 == 0, u[:, 0:1], u[:, 1:2]
                    )
                else:
                    u_lane = jnp.broadcast_to(u[:, 0:1], (qb, vt))
                in_range = (lane >= it * e) & (lane < it * e + e)
                out_vl_ref[:] = jnp.where(in_range, u_lane, out_vl_ref[:])

            @pl.when(any_active)
            def _():
                # ---- DMA the expanded nodes' records (async, overlapped)
                for qq in range(qb):
                    for t in range(e):
                        slot = qq * e + t
                        node = upos[qq, t]
                        pltpu.make_async_copy(
                            blocks_hbm.at[node], blk_scr.at[slot],
                            blk_sems.at[slot],
                        ).start()
                        pltpu.make_async_copy(
                            meta_hbm.at[node], meta_scr.at[slot],
                            meta_sems.at[slot],
                        ).start()
                for slot in range(qb * e):
                    pltpu.make_async_copy(
                        blocks_hbm.at[0], blk_scr.at[slot], blk_sems.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        meta_hbm.at[0], meta_scr.at[slot], meta_sems.at[slot]
                    ).wait()

                # ---- score: one wide MXU dot, select own query column.
                # All candidate work runs PAIR-MAJOR [QB*E, RP]: one row
                # per expanded node, lanes padded to 128 (Mosaic only
                # merges lane-aligned widths into the query-major view).
                flat = blk_scr[:].reshape(qb * e * r, d)  # i8
                dots_all = jnp.dot(
                    flat.astype(jnp.bfloat16), q_bf.T,
                    preferred_element_type=jnp.float32,
                )                                          # [QB*E*R, QB]
                row_q = jax.lax.broadcasted_iota(
                    jnp.int32, (qb * e * r, qb), 0
                ) // (e * r)
                col_q = jax.lax.broadcasted_iota(
                    jnp.int32, (qb * e * r, qb), 1
                )
                dots = jnp.sum(
                    jnp.where(row_q == col_q, dots_all, 0.0), axis=1
                ).reshape(qb * e, r)
                if rp > r:
                    dots = jnp.concatenate(
                        [dots, jnp.full((qb * e, rp - r), 0.0, jnp.float32)],
                        axis=1,
                    )                                      # [QB*E, RP]

                nbr = meta_scr[:, 0, :]                    # [QB*E, 128]
                scale = jax.lax.bitcast_convert_type(
                    meta_scr[:, 1, :], jnp.float32
                )
                nsq = jax.lax.bitcast_convert_type(
                    meta_scr[:, 2, :], jnp.float32
                )
                cand_sc = dots * scale
                if metric == "l2":
                    cand_sc = 2.0 * cand_sc - nsq

                # ---- admission masks (pair-major). Inactive expansions
                # need no explicit mask: their u is the sentinel node,
                # whose packed ids are all-sentinel.
                valid = nbr != n_sentinel
                valid &= nbr != excl_rep
                # duplicate within this row's candidates (keep first lane)
                dup = (nbr[:, :, None] == nbr[:, None, :]) & (
                    jax.lax.broadcasted_iota(jnp.int32, (1, rp, rp), 2)
                    < jax.lax.broadcasted_iota(jnp.int32, (1, rp, rp), 1)
                )
                valid &= ~jnp.any(dup, axis=2)
                if e == 2:
                    # vs the sibling expansion's candidates: odd rows
                    # (t=1) defer to even rows (t=0) of the same query
                    sib = jnp.concatenate(
                        [
                            nbr.reshape(qb, e, rp)[:, 1:2],
                            nbr.reshape(qb, e, rp)[:, 0:1],
                        ],
                        axis=1,
                    ).reshape(qb * e, rp)
                    cross = jnp.any(
                        nbr[:, :, None] == sib[:, None, :], axis=2
                    )
                    is_odd = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (qb * e, 1), 0
                        ) % e
                    ) == 1
                    valid &= ~(cross & is_odd)
                # in current beam state (incl. earlier candidates)
                beam_rep = rep_rows(state_id[:])           # [QB*E, P2]
                in_beam = jnp.any(
                    nbr[:, :, None] == beam_rep[:, None, :], axis=2
                )
                valid &= ~in_beam
                # in this row's visited ring
                in_ring = jnp.any(
                    nbr[:, :, None] == ring[:][:, None, :], axis=2
                )
                valid &= ~in_ring

                cand_sc = jnp.where(valid, cand_sc, NEG_INF)
                cand_id = jnp.where(valid, nbr, n_sentinel)

                # ---- ring update: shift in this hop's admissions
                rnew = jnp.where(valid, nbr, -1)
                ring[:] = jnp.concatenate(
                    [rnew, ring[:, : v - rp]], axis=1
                )

                # ---- merge via bitonic sort of [beam | candidates | pad]
                # candidates fold to query-major [QB, E*RP] via the
                # verified cast chain (leading split, then lane merge)
                cand_sc_q = cand_sc.reshape(qb, e, rp).reshape(qb, c)
                cand_id_q = cand_id.reshape(qb, e, rp).reshape(qb, c)
                pad = p2 - l - c
                sc_parts = [state_sc[:, :l], cand_sc_q]
                id_parts = [state_id[:, :l], cand_id_q]
                if pad > 0:
                    sc_parts.append(jnp.full((qb, pad), NEG_INF, jnp.float32))
                    id_parts.append(jnp.full((qb, pad), n_sentinel, jnp.int32))
                m_sc = jnp.concatenate(sc_parts, axis=1)
                m_id = jnp.concatenate(id_parts, axis=1)
                m_exp = jnp.concatenate(
                    [
                        state_exp[:, :l],
                        jnp.zeros((qb, c + pad), jnp.int32),
                    ],
                    axis=1,
                )
                s_sc, s_id, s_exp = _bitonic_desc(m_sc, m_id, m_exp)
                # entries beyond L die; their expanded flags go with them
                live = jax.lax.broadcasted_iota(jnp.int32, (qb, p2), 1) < l
                state_sc[:] = jnp.where(live, s_sc, NEG_INF)
                state_id[:] = jnp.where(live, s_id, n_sentinel)
                state_exp[:] = jnp.where(live, s_exp, 1)

            return done | ~any_active

        jax.lax.fori_loop(0, max_iters, hop, jnp.bool_(False))

        out_sc_ref[:] = state_sc[:, :l]
        out_id_ref[:] = state_id[:, :l]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "r", "beam_width", "max_iters", "metric", "expansions", "qb",
        "ring_size", "track_visited", "interpret",
    ),
)
def fused_beam_search(
    queries: jnp.ndarray,     # [B, D] f32, B % qb == 0, D % 128 == 0
    blocks_i8: jnp.ndarray,   # [N+1, R*D] int8 (pack_fused)
    meta_i32: jnp.ndarray,    # [N+1, MW] int32 (pack_fused)
    seed_ids: jnp.ndarray,    # [B, S] int32 per-query entry nodes (desc)
    seed_scores: jnp.ndarray, # [B, S] f32 their traversal scores
    exclude: jnp.ndarray,     # [B] int32
    r: int,
    beam_width: int,
    max_iters: int,
    metric: str,
    expansions: int = 2,
    qb: int = 16,
    ring_size: int = 1024,
    track_visited: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (beam_ids [B, L] desc, beam_scores [B, L]) — int8-scored;
    rescore against the f32 corpus for exact ordering. With
    track_visited > 0, also returns vlog_ids [B, VT] (VT = track_visited
    rounded up to a multiple of 128): the first VT/E hops' expanded node
    ids per query (sentinel-padded) — the Vamana visited set."""
    b, d = queries.shape
    n1 = blocks_i8.shape[0]
    n_sentinel = n1 - 1
    e = expansions
    rp = -(-r // 128) * 128
    c = e * rp                # lane-padded candidates entering the merge
    l = beam_width
    p2 = 1 << int(np.ceil(np.log2(l + c)))
    s = seed_ids.shape[1]
    vt = -(-track_visited // 128) * 128 if track_visited else 0
    if s > l:
        raise ValueError(f"seeds {s} > beam width {l}")
    if meta_i32.shape[1:] != (3, 128) or blocks_i8.shape[1:] != (r, d):
        raise ValueError("blocks/meta not in pack_fused 3D layout; repack")
    v = max(ring_size, p2)

    # pre-place seeds into the sort-width arrays host/XLA-side
    seed_id_full = jnp.full((b, p2), n_sentinel, jnp.int32)
    seed_id_full = seed_id_full.at[:, :s].set(seed_ids)
    seed_sc_full = jnp.full((b, p2), NEG_INF, jnp.float32)
    seed_sc_full = seed_sc_full.at[:, :s].set(seed_scores)
    excl_full = jnp.broadcast_to(
        exclude.astype(jnp.int32)[:, None], (b, 128)
    )

    kernel = _make_kernel(
        qb, e, r, d, l, p2, v, max_iters, metric, n_sentinel, vt=vt
    )
    grid = (b // qb,)
    out_specs = [
        pl.BlockSpec((qb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((qb, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, l), jnp.int32),
        jax.ShapeDtypeStruct((b, l), jnp.float32),
    ]
    if vt:
        out_specs.append(
            pl.BlockSpec((qb, vt), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b, vt), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, p2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, p2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((qb, p2), jnp.float32),
            pltpu.VMEM((qb, p2), jnp.int32),
            pltpu.VMEM((qb, p2), jnp.int32),
            pltpu.VMEM((qb * e, v), jnp.int32),
            pltpu.VMEM((qb, 128), jnp.int32),
            pltpu.VMEM((qb * e, r, d), jnp.int8),
            pltpu.VMEM((qb * e, 3, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((qb * e,)),
            pltpu.SemaphoreType.DMA((qb * e,)),
        ],
        interpret=interpret,
    )(queries, seed_id_full, seed_sc_full, excl_full, blocks_i8, meta_i32)
    return tuple(outs)


# ------------------------------------------------------------- host engine


class FusedBeamEngine:
    """Host-facing wrapper around the fused whole-traversal kernel.

    Mirrors BeamSearchEngine's search() contract: query-adaptive seed
    selection (one matmul over a resident seed pool), the fused kernel
    for traversal, then exact f32 rescore of the final beam.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        adjacency: np.ndarray,
        medoid: int,
        metric: str = "ip",
        expansions: int = 2,
        qb: int = 16,
        ring_size: int = 1024,
        visited_pool: int = 128,
        interpret: bool = False,
        seed: int = 0,
    ):
        import os as _os

        self.visited_pool = int(
            _os.environ.get("LEANN_FUSED_VISITED", visited_pool))
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.n, self.d = vectors.shape
        if self.d % 128 != 0:
            raise ValueError(
                f"fused kernel needs D % 128 == 0 (got {self.d}); "
                "use BeamSearchEngine for other dims"
            )
        self.metric_in = metric
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
            metric = "ip"
        self.metric = metric
        self.expansions = expansions
        self.qb = qb
        self.ring_size = ring_size
        self.interpret = interpret

        adj = np.ascontiguousarray(adjacency, dtype=np.int32)
        self.r = adj.shape[1]
        if adj.shape[0] == self.n:
            adj = np.concatenate(
                [adj, np.full((1, self.r), self.n, np.int32)]
            )
        self.vectors = jnp.asarray(
            np.concatenate([vectors, np.zeros((1, self.d), np.float32)])
        )
        vf = np.asarray(self.vectors)
        self.sq_norms = jnp.asarray((vf * vf).sum(axis=1))
        self.blocks, self.meta = pack_fused(self.vectors, jnp.asarray(adj))

        from leann_tpu.ops.beam import seed_pool_size

        rng = np.random.default_rng(seed)
        pool = seed_pool_size(self.n)
        seeds = rng.choice(self.n, size=pool, replace=False)
        self.seed_ids = jnp.asarray(
            np.unique(np.concatenate([[medoid], seeds])).astype(np.int32)
        )
        self.seed_vecs = self.vectors[self.seed_ids].astype(jnp.bfloat16)

    def search(self, queries, k=10, beam_width=64, exclude=None,
               max_iters=None):
        b = np.asarray(queries).shape[0] if np.asarray(queries).ndim > 1 else 1
        ids, scores = self.search_device(
            queries, k=k, beam_width=beam_width, exclude=exclude,
            max_iters=max_iters,
        )
        idx = np.asarray(ids[:b, :])
        sc = np.asarray(scores[:b, :])
        idx = np.where(idx == self.n, -1, idx)
        return idx, sc

    def search_device(self, queries, k=10, beam_width=64, exclude=None,
                      max_iters=None):
        """Device-out search (no host sync): returns (ids, scores) as
        device arrays of shape [B_padded, k] — the building block for
        pipelined serving (issue batch i+1 before collecting batch i so
        transfers overlap the kernel)."""
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        if self.metric_in == "cosine":
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        bb = -(-b // self.qb) * self.qb
        if bb != b:
            q = np.concatenate([q, np.zeros((bb - b, self.d), np.float32)])
        exc = np.full((bb,), -1, dtype=np.int32)
        if exclude is not None:
            exc[:b] = np.asarray(exclude, dtype=np.int32)
        n_entries = min(16, max(1, beam_width // 2))
        mi = max_iters or (4 * beam_width) // self.expansions + 32
        ids, scores = _fused_search_jit(
            jnp.asarray(q), self.vectors, self.sq_norms, self.blocks,
            self.meta, self.seed_ids, self.seed_vecs, jnp.asarray(exc),
            self.r, beam_width, mi, self.metric, self.expansions,
            self.qb, self.ring_size, n_entries, self.interpret,
            self.visited_pool,
        )
        return ids[:, :k], scores[:, :k]

    def search_many_device(self, qs, k=10, beam_width=64, max_iters=None):
        """[M, B, D] device-resident query batches -> (ids, scores) each
        [M, B, k] in ONE dispatch (see _fused_search_many_jit). B must be
        a multiple of qb."""
        m, b, d = qs.shape
        if b % self.qb:
            raise ValueError(f"B={b} must be a multiple of qb={self.qb}")
        exc = jnp.full((b,), -1, jnp.int32)
        n_entries = min(16, max(1, beam_width // 2))
        mi = max_iters or (4 * beam_width) // self.expansions + 32
        ids, scores = _fused_search_many_jit(
            qs, self.vectors, self.sq_norms, self.blocks, self.meta,
            self.seed_ids, self.seed_vecs, exc, self.r, beam_width, mi,
            self.metric, self.expansions, self.qb, self.ring_size,
            n_entries, self.interpret, self.visited_pool,
        )
        return ids[:, :, :k], scores[:, :, :k]


@functools.partial(
    jax.jit,
    static_argnames=("r", "beam_width", "max_iters", "metric",
                     "expansions", "qb", "ring_size", "n_entries",
                     "interpret", "visited_pool"),
)
def _fused_search_many_jit(
    qs, corpus, corpus_nsq, blocks, meta, seed_ids, seed_vecs,
    exclude, r, beam_width, max_iters, metric, expansions, qb,
    ring_size, n_entries, interpret, visited_pool=0,
):
    """M query batches [M, B, D] through the fused traversal in ONE
    dispatch (lax.scan over batches) — per-dispatch relay overhead
    amortizes as 1/M so large-M wall time is device time."""

    def body(_, q):
        ids, scores = _fused_search_jit(
            q, corpus, corpus_nsq, blocks, meta, seed_ids, seed_vecs,
            exclude, r, beam_width, max_iters, metric, expansions, qb,
            ring_size, n_entries, interpret, visited_pool,
        )
        return None, (ids, scores)

    _, (ids, scores) = jax.lax.scan(body, None, qs)
    return ids, scores


@functools.partial(
    jax.jit,
    static_argnames=("r", "beam_width", "max_iters", "metric",
                     "expansions", "qb", "ring_size", "n_entries",
                     "interpret", "visited_pool"),
)
def _fused_search_jit(
    queries, corpus, corpus_nsq, blocks, meta, seed_ids, seed_vecs,
    exclude, r, beam_width, max_iters, metric, expansions, qb,
    ring_size, n_entries, interpret, visited_pool=0,
):
    """Seed-select -> fused kernel -> exact f32 rescore, one jit.

    visited_pool > 0 widens the exact-rescore candidate set with the
    kernel's visited log (the last `visited_pool` expanded nodes per
    query) — int8 navigation misranks near-ties, and the true top-k
    often sits among recently-expanded nodes the beam already dropped.
    Costs one wider gather + rescore; no extra traversal."""
    q_bf = queries.astype(jnp.bfloat16)
    seed_dots = jnp.einsum(
        "md,bd->bm", seed_vecs, q_bf, preferred_element_type=jnp.float32
    )
    if metric == "l2":
        seed_scores = 2.0 * seed_dots - corpus_nsq[seed_ids][None, :]
    else:
        seed_scores = seed_dots
    s_eff = min(n_entries, seed_ids.shape[0])
    entry_sc, best = jax.lax.top_k(seed_scores, s_eff)
    entry = seed_ids[best]

    n_sentinel = corpus.shape[0] - 1
    outs = fused_beam_search(
        queries, blocks, meta, entry, entry_sc, exclude,
        r=r, beam_width=beam_width, max_iters=max_iters, metric=metric,
        expansions=expansions, qb=qb, ring_size=ring_size,
        track_visited=visited_pool, interpret=interpret,
    )
    if visited_pool:
        beam_ids, _, vlog = outs
        cand = jnp.concatenate([beam_ids, vlog], axis=1)
        # visited entries duplicate beam entries: sort-dedup (see
        # pq_beam._pq_search_jit — post-top_k order comes from the
        # rescore, so sorting is free)
        cand = jnp.sort(cand, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((cand.shape[0], 1), bool),
             cand[:, 1:] == cand[:, :-1]], axis=1)
        cand = jnp.where(dup, n_sentinel, cand)
    else:
        beam_ids, _ = outs
        cand = beam_ids

    rows = corpus[cand].astype(jnp.float32)
    dots = jnp.einsum(
        "bld,bd->bl", rows, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        scores = 2.0 * dots - corpus_nsq[cand]
    else:
        scores = dots
    scores = jnp.where(cand == n_sentinel, NEG_INF, scores)
    # excluded ids can enter through the seed pool — drop them here
    scores = jnp.where(
        cand == exclude.astype(jnp.int32)[:, None], NEG_INF, scores
    )
    k_out = beam_ids.shape[1]
    top_scores, pos = jax.lax.top_k(scores, k_out)
    top_ids = jnp.take_along_axis(cand, pos, axis=1)
    return top_ids, top_scores
