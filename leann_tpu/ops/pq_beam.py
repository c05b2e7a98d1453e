"""PQ fused traversal: the whole beam search with inline neighbor PQ codes.

Same architecture as `ops/fused_beam.py` (beam state in VMEM, per-hop
async DMA of inline neighbor records, in-register bitonic merge), but
the inline payload is each neighbor's **product-quantization code**
(m sub-codes) instead of its full int8 vector:

  record i32 [N+1, CP, 128]
    plane 0        : neighbor ids (R lanes, sentinel pad)
    planes 1..CP-1 : packed codes, subspace-major — for subspace j,
                     lanes [j*lps, (j+1)*lps) hold R codes packed
                     8-per-lane (4-bit) or 4-per-lane (8-bit)

This is what makes graph serving possible at DEEP-10M scale on ONE
chip: inline int8 rows need N*R*D bytes (46GB at 10M x 96 x R48);
PQ codes at 8B/neighbor need ~10GB, and the D % 128 == 0 restriction
disappears because queries only enter through ADC lookup tables.

Scoring (ADC): per batch, XLA builds LUT[b, j, c] (for l2 the |C|^2
term is folded in: LUT = 2<q_j, C[j,c]> - |C[j,c]|^2, so
sum_j LUT = 2<q, x_hat> - |x_hat|^2). In-kernel the lookup is a
compare-generated one-hot masked against a pre-tiled LUT, folded with a
constant 0/1 matmul on the MXU — no per-element gathers anywhere.

PQ scores rank *navigation* only: the final candidate set
(beam + visited log) is exactly rescored against the real corpus
outside the kernel. On white-noise residuals ADC cannot rank near-ties
(tests/test_pq.py), but a visited-pool-sized candidate set retains the
true neighbors; exact rescore recovers them.

Replaces `/root/reference/src/backend/diskann.rs:54-56` (DiskANN beam
search) at the 10M scale config; the reference has no quantization at
all (usearch F32, `src/backend/hnsw.rs:112-120`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leann_tpu.ops.fused_beam import _bitonic_desc, _first_k_unexpanded
from leann_tpu.ops.pq import encode_pq, reconstruct_residual_pq, train_pq

NEG_INF = float("-inf")


# ------------------------------------------------------------------ pack


def pq_layout(r: int, m: int, bits: int):
    """Record lane layout: (cpl, lps, slots, cp).

    cpl = codes per packed i32 lane (8 for 4-bit, 4 for 8-bit);
    lps = lanes per subspace (= R/cpl); slots[j] = (plane, lane_offset)
    of subspace j's packed words; cp = total planes per record.

    Plane 0 holds the R neighbor ids in lanes [0, r) and subspace words
    in its free tail; later planes are all words. No subspace ever
    crosses a plane boundary (the kernel slices each subspace with one
    static 2D lane slice — no cross-plane reshape). The tail packing is
    what fits m=16 x ksub=256 codes at R=48 in TWO planes (1KB/node):
    DEEP-10M records = 10.2GB, inside one v5e HBM with the bf16 rescore
    corpus."""
    cpl = 32 // bits                  # 8 for 4-bit, 4 for 8-bit
    if r % cpl:
        raise ValueError(f"R={r} must be a multiple of {cpl} for {bits}-bit")
    lps = r // cpl
    slots = []
    plane, off = 0, r
    for _ in range(m):
        if off + lps > 128:
            plane, off = plane + 1, 0
        slots.append((plane, off))
        off += lps
    return cpl, lps, slots, plane + 1


def _assemble_record(adj_rows, words, r, m, bits):
    """[c, R] ids + [c, m, lps] words -> [c, CP, 128] per pq_layout."""
    c = adj_rows.shape[0]
    cpl, lps, slots, cp = pq_layout(r, m, bits)
    planes_out = []
    for p in range(cp):
        parts = [adj_rows] if p == 0 else []
        cursor = r if p == 0 else 0
        for j, (pj, off) in enumerate(slots):
            if pj != p:
                continue
            if off > cursor:
                parts.append(jnp.zeros((c, off - cursor), jnp.int32))
            parts.append(words[:, j, :])
            cursor = off + lps
        if cursor < 128:
            parts.append(jnp.zeros((c, 128 - cursor), jnp.int32))
        planes_out.append(jnp.concatenate(parts, axis=1))
    return jnp.stack(planes_out, axis=1)                     # [c, CP, 128]


def pack_pq_records(
    adjacency,                # [N+1, R] int32 (pad/sentinel = N)
    codes,                    # [N+1, m] uint8 (row N = zeros)
    bits: int,
    chunk: int = 262144,
) -> jnp.ndarray:
    """Build records [N+1, CP, 128] i32 per pq_layout (ids in plane-0
    lanes [0, r); subspace words tail-packed from lane r onward).

    Packs on the HOST: this is a one-time build step, and the XLA
    version OOM'd on hardware — each [c, 1, lps] subspace slice tiles
    to (8, 128) with ~170x padding, so the fused assemble transiently
    wanted 17GB HBM at 1M x m16 (round-4 pq_1m log). Chunked numpy
    writes the planes directly with zero padding; one device_put at
    the end."""
    return jnp.asarray(pack_pq_records_host(adjacency, codes, bits, chunk))


def pack_pq_records_host(adjacency, codes, bits: int,
                         chunk: int = 262144) -> np.ndarray:
    adjacency = np.asarray(adjacency, np.int32)
    codes = np.asarray(codes, np.uint8)
    n1, r = adjacency.shape
    m = codes.shape[1]
    if r > 128:
        raise ValueError("R <= 128 required")
    cpl, lps, slots, cp = pq_layout(r, m, bits)
    out = np.zeros((n1, cp, 128), np.int32)
    shifts = np.arange(cpl, dtype=np.int32) * bits          # [cpl]
    for i in range(0, n1, chunk):
        rows = adjacency[i : i + chunk]                     # [c, R]
        c = rows.shape[0]
        nc = codes[rows].astype(np.int32)                   # [c, R, m]
        nc = np.transpose(nc, (0, 2, 1)).reshape(c, m, lps, cpl)
        # same packed-word arithmetic as _repack_pq_jit: codes wrap into
        # the i32 sign bit at shift 24 by design (two's-complement pack)
        words = (nc << shifts[None, None, None, :]).sum(
            axis=3, dtype=np.int32)                         # [c, m, lps]
        out[i : i + chunk, 0, :r] = rows
        for j, (pj, off) in enumerate(slots):
            out[i : i + chunk, pj, off : off + lps] = words[:, j, :]
    return out


def repack_pq_rows(
    records: jnp.ndarray,     # [N+1, CP, 128] i32 (donated)
    adjacency: jnp.ndarray,   # [N+1, R] i32
    codes: jnp.ndarray,       # [N+1, m] uint8
    rows: jnp.ndarray,        # [K] i32 (pad = sentinel N)
    bits: int,
) -> jnp.ndarray:
    """Refresh packed records after adjacency rows changed (incremental
    updates / build waves). Pad rows rewrite the sentinel row with its
    own correct content (all-sentinel ids, zero codes)."""
    return _repack_pq_jit(records, adjacency, codes, rows, bits)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("bits",))
def _repack_pq_jit(records, adjacency, codes, rows, bits):
    n1, r = adjacency.shape
    m = codes.shape[1]
    cpl, lps, slots, cp = pq_layout(r, m, bits)
    k = rows.shape[0]
    shifts = jnp.arange(cpl, dtype=jnp.int32) * bits
    adj_rows = adjacency[rows]                               # [K, R]
    nc = codes[adj_rows].astype(jnp.int32)                   # [K, R, m]
    nc = jnp.transpose(nc, (0, 2, 1)).reshape(k, m, lps, cpl)
    words = jnp.sum(nc << shifts[None, None, None, :], axis=3)
    rec = _assemble_record(adj_rows, words, r, m, bits)
    return records.at[rows].set(rec)


# ---------------------------------------------------------------- kernel


def _make_pq_kernel(qb, e, r, m, ksub, bits, l, p2, v, max_iters,
                    n_sentinel, vt, cp):
    """PQ-scored traversal kernel. LUT input is [QB, m*ksub] f32 with
    any metric folded in (see adc LUT construction in the engine)."""
    if e > 2:
        raise ValueError("pq kernel supports expansions <= 2")
    cpl, lps, slots, _cp = pq_layout(r, m, bits)
    rp = -(-r // 128) * 128
    c = e * rp
    mask_val = (1 << bits) - 1
    w = r * ksub                 # one-hot width per subspace

    def rep_rows(x):
        if e == 1:
            return x
        return jnp.concatenate(
            [x[:, None, :]] * e, axis=1
        ).reshape(qb * e, x.shape[1])

    def kernel(
        lut_ref,      # [QB, m*ksub] f32
        seed_id_ref,  # [QB, P2] i32
        seed_sc_ref,  # [QB, P2] f32
        excl_ref,     # [QB, 128] i32
        rec_hbm,      # [N+1, CP, 128] i32 (ANY)
        out_id_ref,   # [QB, L] i32
        out_sc_ref,   # [QB, L] f32
        *rest,
    ):
        if vt:
            out_vl_ref, rest_ = rest[0], rest[1:]
        else:
            out_vl_ref, rest_ = None, rest
        (state_sc, state_id, state_exp, ring, upos, rec_scr,
         rec_sems) = rest_
        if vt:
            out_vl_ref[:] = jnp.full((qb, vt), n_sentinel, jnp.int32)
        state_sc[:] = seed_sc_ref[:]
        state_id[:] = seed_id_ref[:]
        state_exp[:] = jnp.zeros((qb, p2), jnp.int32)
        ring[:] = jnp.full((qb * e, v), -1, jnp.int32)
        ring[:, : p2] = rep_rows(seed_id_ref[:])

        excl_rep = rep_rows(excl_ref[:])[:, 0:1]             # [QB*E, 1]

        # LANE LAYOUT (pltpu.repeat has TILE semantics — whole-array
        # copies, lane x reads src[x % len] — NOT np.repeat):
        #   spread[l] (l in [0, r)) = packed[l % lps], nibble l // lps
        #     -> holds the code of neighbor i(l) = cpl*(l%lps) + l//lps
        #   code_w[x] (x in [0, w)) = codes_lane[x % r], compared
        #     against centroid c(x) = x // r (copy index)
        # The permutation i(l) is folded into the constant contraction
        # matrix s_mat (narrow-W path) or the final p_mat permutation
        # matmul (wide-ksub path).
        lut_rep = rep_rows(lut_ref[:])                       # [QB*E, m*ksub]
        wide = ksub > 16
        if not wide:
            # W = r*ksub lanes: MXU one-hot contraction. Hoisted
            # constants are small (W <= 128*16 = 2048 lanes).
            t_col = jax.lax.broadcasted_iota(jnp.int32, (ksub, w), 1)
            t_row = jax.lax.broadcasted_iota(jnp.int32, (ksub, w), 0)
            # lut_tile_j[slot, x] = LUT[slot//e, j*ksub + x//r]
            t_mat = (t_col // r == t_row).astype(jnp.bfloat16)
            lut_tiles = [
                jnp.dot(
                    lut_rep[:, j * ksub : (j + 1) * ksub].astype(
                        jnp.bfloat16),
                    t_mat, preferred_element_type=jnp.float32,
                )
                for j in range(m)
            ]                                                # m x [QB*E, W]

            # S[x, i] = 1 iff lane x carries neighbor i's one-hot term:
            # l = x % r, i(l) = cpl*(l % lps) + l // lps
            s_row = jax.lax.broadcasted_iota(jnp.int32, (w, rp), 0)
            s_col = jax.lax.broadcasted_iota(jnp.int32, (w, rp), 1)
            s_l = s_row % r
            s_mat = (
                cpl * (s_l % lps) + s_l // lps == s_col
            ).astype(jnp.bfloat16)

            # centroid index per one-hot lane: c(x) = x // r
            oh_c = jax.lax.broadcasted_iota(jnp.int32, (qb * e, w), 1) // r
        else:
            # wide-ksub (8-bit) path: a W = r*ksub one-hot would need
            # ~12k lanes at R=48/ksub=256 (t_mat+lut_tiles+s_mat alone
            # exceed the ~16MB VMEM budget), so the lookup runs as a 3D
            # one-hot over SUBLANES — oh[s, c, l] = (codes[s,l] == c) —
            # masked against LUT broadcast over lanes and reduced over
            # the centroid (sublane) axis. VPU-shaped, no big constants.
            # Lanes stay in spread order l; one [R, RP] 0/1 matmul
            # (p_mat) maps scores back to neighbor positions at the end.
            p_row = jax.lax.broadcasted_iota(jnp.int32, (r, rp), 0)
            p_col = jax.lax.broadcasted_iota(jnp.int32, (r, rp), 1)
            p_mat = (
                cpl * (p_row % lps) + p_row // lps == p_col
            ).astype(jnp.bfloat16)
            c_iota = jax.lax.broadcasted_iota(
                jnp.int32, (qb * e, ksub, r), 1)

        # nibble shift per spread lane: s(l) = l // lps
        nib_shift = (
            jax.lax.broadcasted_iota(jnp.int32, (qb * e, r), 1) // lps
        ) * bits

        def hop(it, carry):
            done = carry
            sc, ids, exp = state_sc[:], state_id[:], state_exp[:]

            pos, active = _first_k_unexpanded(sc, exp, e)
            any_active = jnp.any(active == 1)

            iota = jax.lax.broadcasted_iota(jnp.int32, (qb, p2), 1)
            hit = jnp.zeros((qb, p2), jnp.bool_)
            for t in range(e):
                hit = hit | (
                    (iota == pos[:, t : t + 1]) & (active[:, t : t + 1] == 1)
                )
            state_exp[:] = jnp.where(hit, 1, exp)

            u_cols = []
            for t in range(e):
                onehot = (iota == pos[:, t : t + 1]) & (
                    active[:, t : t + 1] == 1
                )
                u_t = jnp.max(
                    jnp.where(onehot, ids, 0), axis=1, keepdims=True
                )
                u_t = jnp.where(active[:, t : t + 1] == 1, u_t, n_sentinel)
                u_cols.append(u_t)
            u = jnp.concatenate(u_cols, axis=1)              # [QB, E]
            upos[:, :e] = u

            if vt:
                # wrap-around log: keeps the LAST vt/e hops' expansions —
                # late hops sit near the target and are the valuable
                # exact-rescore candidates (early hops are coarse
                # navigation waypoints)
                lane = jax.lax.broadcasted_iota(jnp.int32, (qb, vt), 1)
                if e == 2:
                    u_lane = jnp.where(lane % 2 == 0, u[:, 0:1], u[:, 1:2])
                else:
                    u_lane = jnp.broadcast_to(u[:, 0:1], (qb, vt))
                base = (it * e) % vt
                in_range = (lane >= base) & (lane < base + e)
                out_vl_ref[:] = jnp.where(in_range, u_lane, out_vl_ref[:])

            @pl.when(any_active)
            def _():
                for qq in range(qb):
                    for t in range(e):
                        slot = qq * e + t
                        node = upos[qq, t]
                        pltpu.make_async_copy(
                            rec_hbm.at[node], rec_scr.at[slot],
                            rec_sems.at[slot],
                        ).start()
                for slot in range(qb * e):
                    pltpu.make_async_copy(
                        rec_hbm.at[0], rec_scr.at[slot], rec_sems.at[slot]
                    ).wait()

                nbr_raw = rec_scr[:, 0, :]                   # [QB*E, 128]
                # lanes >= r of plane 0 hold tail-packed code words,
                # not ids — neutralize them to the sentinel
                lane128 = jax.lax.broadcasted_iota(
                    jnp.int32, (qb * e, 128), 1)
                nbr = jnp.where(lane128 < r, nbr_raw, n_sentinel)

                # ---- ADC scoring, accumulated per subspace; each
                # subspace's packed words are one static 2D lane slice
                # of its plane (pq_layout guarantees no plane crossing)
                def packed_j(j):
                    pj, off = slots[j]
                    return rec_scr[:, pj, off : off + lps]

                if not wide:
                    acc = jnp.zeros((qb * e, rp), jnp.float32)
                    for j in range(m):
                        spread = pltpu.repeat(packed_j(j), cpl, axis=1)
                        codes_j = (spread >> nib_shift) & mask_val
                        # one-hot row [QB*E, W]: lane x hits when
                        # neighbor x%r's code == x//r
                        code_w = pltpu.repeat(codes_j, ksub, axis=1)
                        oh = code_w == oh_c
                        prod = jnp.where(oh, lut_tiles[j], 0.0)
                        acc = acc + jnp.dot(
                            prod.astype(jnp.bfloat16), s_mat,
                            preferred_element_type=jnp.float32,
                        )
                    cand_sc = acc                            # [QB*E, RP]
                else:
                    acc_l = jnp.zeros((qb * e, r), jnp.float32)
                    for j in range(m):
                        spread = pltpu.repeat(packed_j(j), cpl, axis=1)
                        codes_j = (spread >> nib_shift) & mask_val
                        oh = codes_j[:, None, :] == c_iota   # [S, K, R]
                        lut_j = lut_rep[:, j * ksub : (j + 1) * ksub]
                        prod = jnp.where(oh, lut_j[:, :, None], 0.0)
                        acc_l = acc_l + jnp.sum(prod, axis=1)
                    # l-order -> neighbor-order (0/1 permutation, exact
                    # in bf16 up to the f32->bf16 cast of acc_l; ADC
                    # noise dominates that rounding by orders)
                    cand_sc = jnp.dot(
                        acc_l.astype(jnp.bfloat16), p_mat,
                        preferred_element_type=jnp.float32,
                    )                                        # [QB*E, RP]

                valid = nbr != n_sentinel
                valid &= nbr != excl_rep
                dup = (nbr[:, :, None] == nbr[:, None, :]) & (
                    jax.lax.broadcasted_iota(jnp.int32, (1, 128, 128), 2)
                    < jax.lax.broadcasted_iota(jnp.int32, (1, 128, 128), 1)
                )
                valid &= ~jnp.any(dup, axis=2)
                if e == 2:
                    sib = jnp.concatenate(
                        [
                            nbr.reshape(qb, e, 128)[:, 1:2],
                            nbr.reshape(qb, e, 128)[:, 0:1],
                        ],
                        axis=1,
                    ).reshape(qb * e, 128)
                    cross = jnp.any(
                        nbr[:, :, None] == sib[:, None, :], axis=2
                    )
                    is_odd = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (qb * e, 1), 0
                        ) % e
                    ) == 1
                    valid &= ~(cross & is_odd)
                beam_rep = rep_rows(state_id[:])
                in_beam = jnp.any(
                    nbr[:, :, None] == beam_rep[:, None, :], axis=2
                )
                valid &= ~in_beam
                in_ring = jnp.any(
                    nbr[:, :, None] == ring[:][:, None, :], axis=2
                )
                valid &= ~in_ring

                cand_sc = jnp.where(valid[:, :rp], cand_sc, NEG_INF)
                cand_id = jnp.where(valid, nbr, n_sentinel)[:, :rp]

                rnew = jnp.where(valid, nbr, -1)[:, :rp]
                ring[:] = jnp.concatenate(
                    [rnew, ring[:, : v - rp]], axis=1
                )

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
                    [state_exp[:, :l], jnp.zeros((qb, c + pad), jnp.int32)],
                    axis=1,
                )
                s_sc, s_id, s_exp = _bitonic_desc(m_sc, m_id, m_exp)
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
        "r", "m", "ksub", "bits", "beam_width", "max_iters", "expansions",
        "qb", "ring_size", "track_visited", "interpret",
    ),
)
def pq_beam_search(
    luts: jnp.ndarray,        # [B, m*ksub] f32 (metric folded in)
    records: jnp.ndarray,     # [N+1, CP, 128] i32
    seed_ids: jnp.ndarray,    # [B, S] i32
    seed_scores: jnp.ndarray, # [B, S] f32 (MUST be ADC-comparable)
    exclude: jnp.ndarray,     # [B] i32
    r: int,
    m: int,
    ksub: int,
    bits: int,
    beam_width: int,
    max_iters: int,
    expansions: int = 2,
    qb: int = 16,
    ring_size: int = 1024,
    track_visited: int = 0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (beam_ids [B, L], beam_scores [B, L][, vlog [B, VT]]).
    Scores are ADC-approximate; callers MUST exactly rescore."""
    b = luts.shape[0]
    n1 = records.shape[0]
    n_sentinel = n1 - 1
    e = expansions
    rp = 128
    c = e * rp
    l = beam_width
    p2 = 1 << int(np.ceil(np.log2(l + c)))
    s = seed_ids.shape[1]
    vt = -(-track_visited // 128) * 128 if track_visited else 0
    if s > l:
        raise ValueError(f"seeds {s} > beam width {l}")
    v = max(ring_size, p2)
    cp = records.shape[1]

    seed_id_full = jnp.full((b, p2), n_sentinel, jnp.int32)
    seed_id_full = seed_id_full.at[:, :s].set(seed_ids)
    seed_sc_full = jnp.full((b, p2), NEG_INF, jnp.float32)
    seed_sc_full = seed_sc_full.at[:, :s].set(seed_scores)
    excl_full = jnp.broadcast_to(
        exclude.astype(jnp.int32)[:, None], (b, 128)
    )

    kernel = _make_pq_kernel(
        qb, e, r, m, ksub, bits, l, p2, v, max_iters, n_sentinel, vt, cp
    )
    grid = (b // qb,)
    mk = m * ksub
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
            pl.BlockSpec((qb, mk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, p2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, p2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((qb * e, cp, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((qb * e,)),
        ],
        interpret=interpret,
    )(luts, seed_id_full, seed_sc_full, excl_full, records)
    return tuple(outs)


# ------------------------------------------------------------- host engine


class PqBeamEngine:
    """Graph serving via the PQ fused kernel + exact candidate rescore.

    Construction: trains PQ codebooks on a corpus sample, encodes the
    corpus, packs inline neighbor records. Search: ADC LUTs -> fused
    traversal (beam + visited log) -> exact rescore of the union
    against the corpus (f32 or bf16 per `rescore`).
    """

    def __init__(
        self,
        vectors: np.ndarray,      # [N, D] f32
        adjacency: np.ndarray,    # [N(+1), R] int32
        medoid: int,
        metric: str = "ip",
        m: int = 16,
        ksub: int = 16,
        qb: int = 16,
        ring_size: int = 1024,
        visited_pool: int = 256,
        rescore: str = "f32",     # "f32" | "bf16" | "int8"
        train_sample: int = 262_144,
        kmeans_iters: int = 10,
        interpret: bool = False,
        seed: int = 0,
        codebooks=None,           # [m,ksub,dsub] | (books_c, books_f)
        codes: Optional[np.ndarray] = None,
        coarse_m: int = 0,        # >0: residual (two-level) ADC mode
        rotation: Optional[np.ndarray] = None,  # [D, D] OPQ rotation
    ):
        vectors = np.ascontiguousarray(vectors, dtype=np.float32)
        self.n, self.d = vectors.shape
        self.metric_in = metric
        if metric == "cosine":
            vectors = vectors / (
                np.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12
            )
            metric = "ip"
        self.metric = metric
        self.m, self.ksub = m, ksub
        self.bits = 8 if ksub > 16 else 4
        if ksub > 256:
            raise ValueError("ksub <= 256")
        self.qb = qb
        self.ring_size = ring_size
        self.visited_pool = visited_pool
        self.interpret = interpret

        adj = np.ascontiguousarray(adjacency, dtype=np.int32)
        self.r = adj.shape[1]
        if adj.shape[0] == self.n:
            adj = np.concatenate(
                [adj, np.full((1, self.r), self.n, np.int32)]
            )

        rng = np.random.default_rng(seed)
        from leann_tpu.ops.pq import (
            adc_affine, encode_residual_pq, quantize_norms,
            reconstruct_residual_pq, train_residual_pq,
        )

        # OPQ (ops/pq.train_opq): train/encode in the rotated frame;
        # the rotation folds into lut_w below and |x_hat|^2 is
        # rotation-invariant, so records, kernel, and the exact-rescore
        # corpus (original frame) are all unchanged. `codebooks`/`codes`
        # caches passed alongside a rotation must be rotated-frame.
        self.rotation = None
        enc_vectors = vectors
        if rotation is not None:
            self.rotation = np.ascontiguousarray(rotation, np.float32)
            if self.rotation.shape != (self.d, self.d):
                raise ValueError("rotation must be [D, D]")
            enc_vectors = vectors @ self.rotation

        if coarse_m:
            # residual (two-level) mode: coarse-PQ + fine residual PQ
            # + (l2) quantized exact |x_hat|^2 as two affine-LUT
            # columns. Single-level ADC cannot rank clustered corpora
            # at scale (see ops/pq.py residual section).
            if ksub != 256:
                raise ValueError("residual mode requires ksub=256")
            if codebooks is None:
                samp = enc_vectors[rng.choice(
                    self.n, min(train_sample, self.n), replace=False)]
                codebooks = train_residual_pq(
                    samp, mc=coarse_m, mf=m, ksub=ksub,
                    iters=kmeans_iters, seed=seed)
            books_c, books_f = codebooks
            books_c = np.asarray(books_c, np.float32)
            books_f = np.asarray(books_f, np.float32)
            self.codebooks = (books_c, books_f)
            if codes is None:
                codes, nsq = encode_residual_pq(
                    enc_vectors, books_c, books_f)
            else:
                codes = np.asarray(codes, np.uint8)
                xh = reconstruct_residual_pq(codes, books_c, books_f)
                nsq = np.einsum(
                    "nd,nd->n", xh, xh, dtype=np.float64
                ).astype(np.float32)
                del xh
            self.codes = np.asarray(codes, np.uint8)
            if metric == "l2":
                nq, n_off, n_scale = quantize_norms(nsq)
                codes_full = np.concatenate([self.codes, nq], axis=1)
                self.norm_offset, self.norm_scale = n_off, n_scale
            else:
                codes_full = self.codes
                self.norm_offset = self.norm_scale = 0.0
            self.mt = codes_full.shape[1]
            lut_w, lut_b = adc_affine(
                self.d, metric, books_c, books_f, ksub,
                self.norm_offset, self.norm_scale)
        else:
            if codebooks is None:
                samp = enc_vectors[rng.choice(
                    self.n, min(train_sample, self.n), replace=False)]
                codebooks = train_pq(
                    samp, m=m, ksub=ksub, iters=kmeans_iters, seed=seed)
            self.codebooks = np.asarray(codebooks, np.float32)
            if codes is None:
                codes = encode_pq(enc_vectors, self.codebooks)
            self.codes = np.asarray(codes, np.uint8)
            codes_full = self.codes
            self.mt = m
            lut_w, lut_b = adc_affine(
                self.d, metric, None, self.codebooks, ksub)
        self.coarse_m = coarse_m
        codes1 = np.concatenate(
            [codes_full, np.zeros((1, self.mt), np.uint8)], axis=0)
        self.records = pack_pq_records(adj, codes1, self.bits)
        # affine LUT operands: luts = q @ W^T + B (see ops/pq.adc_affine);
        # with OPQ, luts = (q rot) W^T + B = q (W rot^T)^T + B — fold
        # the rotation into W so queries enter the jit unrotated
        lut_w2 = lut_w.reshape(self.mt * ksub, self.d)
        if self.rotation is not None:
            lut_w2 = lut_w2 @ self.rotation.T
        self.lut_w = jnp.asarray(lut_w2)
        self.lut_b = jnp.asarray(lut_b.reshape(self.mt * ksub))

        # exact-rescore corpus (+ sentinel zero row). bf16/int8 cast on
        # the HOST: a device-side f32 staging copy would transiently need
        # records + f32 + bf16 resident together (16GB at 10M x 96 —
        # over one v5e HBM). int8 (row-quantized, scale folded into the
        # gather) halves that again to ~1GB at 10M — the OOM fallback
        # when records + bf16 don't fit beside the runtime.
        corpus1 = np.concatenate(
            [vectors, np.zeros((1, self.d), np.float32)], axis=0)
        self.corpus_scale = None
        if rescore == "bf16":
            import ml_dtypes

            self.corpus = jnp.asarray(corpus1.astype(ml_dtypes.bfloat16))
        elif rescore == "int8":
            scale = np.maximum(
                np.abs(corpus1).max(axis=1), 1e-12).astype(np.float32)
            q8 = np.clip(
                np.round(corpus1 / scale[:, None] * 127.0), -127, 127
            ).astype(np.int8)
            self.corpus = jnp.asarray(q8)
            self.corpus_scale = jnp.asarray(scale / 127.0)
        else:
            self.corpus = jnp.asarray(corpus1)
        self.corpus_nsq = jnp.asarray(
            (corpus1.astype(np.float64) ** 2).sum(axis=1).astype(np.float32))

        # seed pool (exact vectors, tiny)
        from leann_tpu.ops.beam import seed_pool_size

        pool = seed_pool_size(self.n)
        seeds = rng.choice(self.n, size=pool, replace=False)
        self.seed_ids = jnp.asarray(
            np.unique(np.concatenate([[medoid], seeds])).astype(np.int32)
        )
        # seeds are scored by ADC too (score space must match the
        # kernel's candidate scores; mixing exact seed scores with ADC
        # candidate scores would bias the merge)
        from leann_tpu.ops.pq import reconstruct_pq

        sid = np.asarray(self.seed_ids)
        if coarse_m:
            seed_hat = reconstruct_residual_pq(
                self.codes[sid], books_c, books_f)
            if metric == "l2":
                # quantized norm — the exact value the kernel's norm
                # LUT columns contribute for these nodes
                nq_s = codes_full[sid, -2:].astype(np.float64)
                seed_nsq = (self.norm_offset
                            + (nq_s[:, 0] * 256.0 + nq_s[:, 1])
                            * self.norm_scale).astype(np.float32)
            else:
                seed_nsq = np.zeros(len(sid), np.float32)
        else:
            seed_hat = reconstruct_pq(self.codes[sid], self.codebooks)
            seed_nsq = (seed_hat.astype(np.float64) ** 2).sum(1).astype(
                np.float32)
        if self.rotation is not None:
            # decode back to the original frame: seed ADC scores are
            # <q, x_hat rot^T> = <q rot, x_hat> = the kernel's ADC sum
            # (norms are rotation-invariant)
            seed_hat = seed_hat @ self.rotation.T
        self.seed_vecs_hat = jnp.asarray(seed_hat.astype(np.float32)).astype(
            jnp.bfloat16)
        self.seed_hat_nsq = jnp.asarray(seed_nsq)

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
        mi = max_iters or (4 * beam_width) // 2 + 32
        ids, scores = _pq_search_jit(
            jnp.asarray(q), self.records, self.lut_w, self.lut_b,
            self.corpus, self.corpus_nsq, self.corpus_scale,
            self.seed_ids, self.seed_vecs_hat,
            self.seed_hat_nsq, jnp.asarray(exc),
            self.r, self.mt, self.ksub, self.bits, beam_width, mi,
            self.metric, self.qb, self.ring_size, self.visited_pool, k,
            self.interpret,
        )
        return ids, scores

    def search_many_device(self, qs, k=10, beam_width=64, max_iters=None):
        """[M, B, D] device batches -> (ids, scores) [M, B, k], one
        dispatch (relay amortization / coalesced serving)."""
        mdim, b, d = qs.shape
        if b % self.qb:
            raise ValueError(f"B={b} must be a multiple of qb={self.qb}")
        exc = jnp.full((b,), -1, jnp.int32)
        mi = max_iters or (4 * beam_width) // 2 + 32
        return _pq_search_many_jit(
            qs, self.records, self.lut_w, self.lut_b,
            self.corpus, self.corpus_nsq, self.corpus_scale,
            self.seed_ids, self.seed_vecs_hat,
            self.seed_hat_nsq, exc,
            self.r, self.mt, self.ksub, self.bits, beam_width, mi,
            self.metric, self.qb, self.ring_size, self.visited_pool, k,
            self.interpret,
        )


def _pq_search_impl(
    queries, records, lut_w, lut_b, corpus, corpus_nsq, corpus_scale,
    seed_ids, seed_vecs_hat, seed_hat_nsq, exclude,
    r, m, ksub, bits, beam_width, max_iters, metric, qb, ring_size,
    visited_pool, k, interpret,
):
    """LUT build -> seed select (ADC space) -> PQ kernel -> exact rescore
    of beam + visited pool, one jit. `m` counts TOTAL code columns (for
    residual mode: coarse + fine + norm); the affine operands lut_w
    [m*ksub, D] / lut_b [m*ksub] encode metric, mode, and norm folding
    (ops/pq.adc_affine)."""
    b, d = queries.shape
    n_sentinel = records.shape[0] - 1

    luts = jnp.dot(
        queries, lut_w.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + lut_b[None, :]                                       # [B, m*ksub]

    # seed scores in ADC space: score(q, seed) = sum_j LUT — identical
    # to scoring the reconstructed seed vector
    q_bf = queries.astype(jnp.bfloat16)
    seed_dots = jnp.einsum(
        "md,bd->bm", seed_vecs_hat, q_bf, preferred_element_type=jnp.float32)
    if metric == "l2":
        seed_scores = 2.0 * seed_dots - seed_hat_nsq[None, :]
    else:
        seed_scores = seed_dots
    s_eff = min(16, seed_ids.shape[0])
    entry_sc, best = jax.lax.top_k(seed_scores, s_eff)
    entry = seed_ids[best]

    beam_ids, _, vlog = pq_beam_search(
        luts, records, entry, entry_sc, exclude,
        r=r, m=m, ksub=ksub, bits=bits, beam_width=beam_width,
        max_iters=max_iters, expansions=2, qb=qb, ring_size=ring_size,
        track_visited=visited_pool, interpret=interpret,
    )

    cand = jnp.concatenate([beam_ids, vlog], axis=1)         # [B, L+VT]
    # visited entries duplicate beam entries; sort-dedup (O(C log C),
    # not O(C^2) — C^2 masks at B=2048 x C=320 would be ~200MB).
    # Post-top_k order comes from the rescore, so sorting is free.
    cand = jnp.sort(cand, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((cand.shape[0], 1), bool), cand[:, 1:] == cand[:, :-1]],
        axis=1)
    cand = jnp.where(dup, n_sentinel, cand)

    rows = corpus[cand].astype(jnp.float32)                  # [B, C, D]
    if corpus_scale is not None:
        # int8 rescore: fold the per-row dequant scale into the gather
        rows = rows * corpus_scale[cand][:, :, None]
    dots = jnp.einsum(
        "bcd,bd->bc", rows, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        scores = 2.0 * dots - corpus_nsq[cand]
    else:
        scores = dots
    scores = jnp.where(cand == n_sentinel, NEG_INF, scores)
    scores = jnp.where(
        cand == exclude.astype(jnp.int32)[:, None], NEG_INF, scores
    )
    top_scores, pos = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(cand, pos, axis=1)
    return top_ids, top_scores


# lazy jits with the raised scoped-vmem limit (first-hardware-compile
# OOM: the kernel's unrolled ADC temporaries exceed the 16MB default)
from leann_tpu.ops.pallas_kernels import lazy_tpu_jit as _lazy_tpu_jit  # noqa: E402

_PQ_STATIC = ("r", "m", "ksub", "bits", "beam_width", "max_iters",
              "metric", "qb", "ring_size", "visited_pool", "k",
              "interpret")
_pq_search_jit = _lazy_tpu_jit(_pq_search_impl, static_argnames=_PQ_STATIC)


def _pq_search_many_impl(
    qs, records, lut_w, lut_b, corpus, corpus_nsq, corpus_scale,
    seed_ids, seed_vecs_hat, seed_hat_nsq, exclude,
    r, m, ksub, bits, beam_width, max_iters, metric, qb, ring_size,
    visited_pool, k, interpret,
):
    def body(_, q):
        # call the impl, not the jitted wrapper: compiler_options are
        # only legal on the top-level jit (this body is already traced)
        ids, scores = _pq_search_impl(
            q, records, lut_w, lut_b, corpus, corpus_nsq, corpus_scale,
            seed_ids, seed_vecs_hat, seed_hat_nsq, exclude,
            r, m, ksub, bits, beam_width, max_iters, metric, qb,
            ring_size, visited_pool, k, interpret,
        )
        return None, (ids, scores)

    _, (ids, scores) = jax.lax.scan(body, None, qs)
    return ids, scores


_pq_search_many_jit = _lazy_tpu_jit(
    _pq_search_many_impl, static_argnames=_PQ_STATIC)
