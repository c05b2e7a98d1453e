"""Profile the beam-search hop primitives on the real TPU.

Decides the round-2 graph-engine design: is the per-hop cost dominated by
the row gather (and if so, does a neighborhood-inlined layout — one
contiguous [R, D] block per node, gather granule R*D*2 bytes instead of
D*4 — fix it), by the einsum, or by the merge?

Run:  PYTHONPATH=/root/repo:/root/.axon_site python evals/hop_profile.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
D = 128
R = 32
B = 2048
E = 2
L = 32  # beam width for merge sizing
INNER = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("variant", "inner"))
def bench_op(vecs, vecs_bf16, blocks, adj, queries, u0, variant, inner):
    """Run `inner` dependent iterations of one hop primitive; returns a
    scalar so only 4 bytes cross the tunnel."""
    n = vecs.shape[0] - 1

    def body(i, carry):
        acc, u = carry  # u: [B, E] int32 node ids
        if variant == "adj_gather":
            nbrs = adj[u].reshape(B, E * R)
            out = jnp.sum(nbrs.astype(jnp.float32))
            nxt = (u + 1) % n
        elif variant == "gather_f32":
            nbrs = adj[u].reshape(B, E * R)
            rows = vecs[nbrs]
            s = jnp.einsum("bkd,bd->bk", rows, queries,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            out = jnp.sum(s)
            nxt = (u + jnp.int32(out) % 7 + 1) % n
        elif variant == "gather_bf16":
            nbrs = adj[u].reshape(B, E * R)
            rows = vecs_bf16[nbrs]
            s = jnp.einsum("bkd,bd->bk", rows,
                           queries.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            out = jnp.sum(s)
            nxt = (u + jnp.int32(out) % 7 + 1) % n
        elif variant == "inline_bf16":
            blk = blocks[u]                      # [B, E, R, D] bf16
            s = jnp.einsum("berd,bd->ber", blk,
                           queries.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            out = jnp.sum(s)
            nxt = (u + jnp.int32(out) % 7 + 1) % n
        elif variant == "hop_inline":
            # the proposed new hop: adjacency ids + inline blocks + score
            # + validity mask + merge
            nbrs = adj[u].reshape(B, E * R)
            blk = blocks[u].reshape(B, E * R, D)
            s = jnp.einsum("bkd,bd->bk", blk,
                           queries.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            s = jnp.where(nbrs != n, s, -jnp.inf)
            top, pos = jax.lax.top_k(
                jnp.concatenate([s, s[:, :L]], axis=1), L)
            out = jnp.sum(top)
            nxt = jnp.take_along_axis(
                nbrs, pos[:, :E] % (E * R), axis=1)
            nxt = jnp.where(nxt == n, 0, nxt)
        elif variant == "hop_current":
            # today's hop: row gather f32 + dedup masks + merge
            nbrs = adj[u].reshape(B, E * R)
            c = E * R
            dup = (nbrs[:, :, None] == nbrs[:, None, :]) & (
                jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 2)
                < jax.lax.broadcasted_iota(jnp.int32, (1, c, c), 1))
            valid = (nbrs != n) & ~jnp.any(dup, axis=2)
            rows = vecs[nbrs]
            s = jnp.einsum("bkd,bd->bk", rows, queries,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            s = jnp.where(valid, s, -jnp.inf)
            top, pos = jax.lax.top_k(
                jnp.concatenate([s, s[:, :L]], axis=1), L)
            out = jnp.sum(top)
            nxt = jnp.take_along_axis(nbrs, pos[:, :E] % c, axis=1)
            nxt = jnp.where(nxt == n, 0, nxt)
        elif variant == "topk_merge":
            s = (u[:, :1].astype(jnp.float32)
                 + jax.lax.broadcasted_iota(jnp.float32, (B, E * R + L), 1))
            top, _ = jax.lax.top_k(s, L)
            out = jnp.sum(top)
            nxt = (u + jnp.int32(out) % 5 + 1) % n
        elif variant == "noop":
            out = jnp.sum(u.astype(jnp.float32))
            nxt = (u + jnp.int32(out) % 5 + 1) % n
        elif variant == "einsum_only":
            blk = jax.lax.dynamic_slice_in_dim(
                vecs_bf16, u[0, 0] % (n - B), B)      # contiguous [B, D]
            s = jnp.einsum("kd,bd->bk", blk, queries.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            out = jnp.sum(s)
            nxt = (u + jnp.int32(out) % 5 + 1) % n
        elif variant.startswith("inline_e"):
            e = int(variant.split("inline_e")[1])
            ue = jnp.broadcast_to(u[:, :1], (B, e)) + \
                jax.lax.broadcasted_iota(jnp.int32, (B, e), 1)
            ue = ue % n
            blk = blocks[ue]                          # [B, e, R, D]
            s = jnp.einsum("berd,bd->ber", blk,
                           queries.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            out = jnp.sum(s)
            nxt = (u + jnp.int32(out) % 7 + 1) % n
        elif variant == "hop_inline_e4":
            e = 4
            ue = (jnp.broadcast_to(u[:, :1], (B, e))
                  + jax.lax.broadcasted_iota(jnp.int32, (B, e), 1)) % n
            nbrs = adj[ue].reshape(B, e * R)
            blk = blocks[ue].reshape(B, e * R, D)
            s = jnp.einsum("bkd,bd->bk", blk,
                           queries.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            s = jnp.where(nbrs != n, s, -jnp.inf)
            top, pos = jax.lax.top_k(
                jnp.concatenate([s, s[:, :L]], axis=1), L)
            out = jnp.sum(top)
            nxt = jnp.take_along_axis(
                nbrs, pos[:, :E] % (e * R), axis=1)
            nxt = jnp.where(nxt == n, 0, nxt)
        else:
            raise ValueError(variant)
        return acc + out, nxt

    acc, _ = jax.lax.fori_loop(0, inner, body, (jnp.float32(0.0), u0))
    return acc


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    log("generating corpus on device ...")
    vecs = jax.random.normal(k1, (N + 1, D), jnp.float32)
    vecs_bf16 = vecs.astype(jnp.bfloat16)
    adj = jax.random.randint(k2, (N + 1, R), 0, N, jnp.int32)
    queries = jax.random.normal(k3, (B, D), jnp.float32)
    u0 = jax.random.randint(k4, (B, E), 0, N, jnp.int32)
    log("building inline blocks (chunked gather on device) ...")

    def chunked_inline(src, dtype, step=65536):
        out = jnp.zeros((N + 1, R, D), dtype)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def upd(buf, s, a, i):
            rows = jax.lax.dynamic_slice_in_dim(a, i, step)
            return jax.lax.dynamic_update_slice(buf, s[rows], (i, 0, 0))

        for i in range(0, N + 1, step):
            out = upd(out, src, adj, jnp.int32(min(i, N + 1 - step)))
        return out

    blocks = chunked_inline(vecs_bf16, jnp.bfloat16)   # ~8.2 GB
    np.asarray(jnp.sum(blocks[:2]).astype(jnp.float32))
    log("bf16 inline blocks resident")

    variants = ["noop", "einsum_only", "adj_gather", "topk_merge",
                "gather_f32", "gather_bf16", "inline_bf16", "inline_e4",
                "inline_e8", "hop_current", "hop_inline", "hop_inline_e4"]
    results = {}
    for v in variants:
        t0 = time.perf_counter()
        np.asarray(bench_op(vecs, vecs_bf16, blocks, adj, queries, u0,
                            v, INNER))
        compile_s = time.perf_counter() - t0
        # steady state: 3 outer reps
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = bench_op(vecs, vecs_bf16, blocks, adj, queries, u0, v, INNER)
        np.asarray(r)
        per_hop_ms = (time.perf_counter() - t0) / (reps * INNER) * 1e3
        results[v] = per_hop_ms
        log(f"{v:14s}  {per_hop_ms:8.3f} ms/hop   (first call {compile_s:.1f}s)")

    log("")
    log(f"batch={B} E={E} R={R} D={D} N={N}")
    log("per-query per-hop bytes: gather_f32 "
        f"{E*R*D*4} B, inline_bf16 {E*R*D*2} B")
    for v, ms in results.items():
        log(f"{v:14s} {ms:8.3f} ms/hop -> hypothetical 20-hop QPS "
            f"{B / (ms * 20e-3):,.0f}")


if __name__ == "__main__":
    main()
