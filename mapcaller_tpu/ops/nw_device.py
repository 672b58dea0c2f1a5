"""Batched gapped-extension (NW) kernel — Pallas/TPU.

Device form of the reference's default aligner (ref:
src/nw_alignment.cpp:18-83; scoring contract in ops/nw_host.py: x2-scaled
integers, match +2 / mismatch -2, OPEN -2, EXTEND -1, NEW -3), producing
bit-identical traceback decisions.

The key vectorization: with E=EXTEND > NEW the coupled row recurrence
    r[j] = max(r[j-1]+E, s[j-1]+NEW)
    s[j] = max(diag[j], r[j], t[j])
collapses (substituting s[j-1] = max(r[j-1], c[j-1]),
c[j] = max(diag[j], t[j])) to a single affine max-plus chain
    r[j] = max_{k<j} (c[k] + NEW + (j-1-k)*E)
        = NEW + (j-1)*E + cummax_k (c[k] - k*E),
so every DP row is a handful of elementwise ops plus ONE cummax — no
sequential inner loop, no gathers. Each grid program owns a batch tile
and sweeps rows with the working set in VMEM, streaming out 2-bit
traceback directions (0=diag, 1=left/'-in-s1', 2=up/'-in-s2', with the
reference's s==r, then s==t priority) packed 16 per int32.

Runs on TPU via pallas_call; `interpret=True` is used on CPU (tests).
"""
from __future__ import annotations

import functools

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAXPEN = -131072
OPENG = -2
EXTG = -1
NEWG = -3


def _cummax(x):
    """Inclusive running max along the last axis via log-shift doubling
    (lax.cummax has no Pallas TPU lowering)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.pad(x[..., :-k], ((0, 0), (k, 0)),
                          constant_values=MAXPEN)
        x = jnp.maximum(x, shifted)
        k <<= 1
    return x


def _row_sweep(c1_row, c2, t_prev, s_prev, i):
    """One DP row (vectorized over the batch tile).
    c1_row: int32[TB] codes of s1[i-1]; c2: int32[TB, N].
    Returns (t_cur, r_cur, s_cur, dirs) over columns 0..N."""
    TB, N = c2.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (TB, N + 1), 1)
    # column-0 boundary (ref: nw_host.py:44-45)
    s_b0 = OPENG + i * EXTG
    match = jnp.where(c1_row == c2, 2, -2)   # c1_row: [TB, 1] broadcast
    # vertical-gap state (elementwise in j)
    t_cur = jnp.maximum(t_prev + EXTG, s_prev + NEWG)
    t_cur = jnp.where(j == 0, s_b0, t_cur)
    diag = s_prev[:, :-1] + match                       # [TB, N] for j>=1
    # c[k]: the non-horizontal candidate at column k (c[0] = boundary s)
    c = jnp.concatenate(
        [jnp.full((TB, 1), s_b0, dtype=t_cur.dtype),
         jnp.maximum(diag, t_cur[:, 1:])], axis=1)      # [TB, N+1]
    q = c - j * EXTG
    cm = _cummax(q)
    r_cur = NEWG + (j - 1) * EXTG + jnp.concatenate(
        [jnp.full((TB, 1), 0, dtype=cm.dtype), cm[:, :-1]], axis=1)
    r_cur = jnp.where(j == 0, MAXPEN, r_cur)
    s_cur = jnp.maximum(r_cur, c)
    s_cur = jnp.where(j == 0, s_b0, s_cur)
    dirs = jnp.where(s_cur == r_cur, 1,
                     jnp.where(s_cur == t_cur, 2, 0)).astype(jnp.int32)
    return t_cur, r_cur, s_cur, dirs


@functools.lru_cache(maxsize=None)
def build_nw_kernel(M: int, N: int, tile: int = 64, interpret: bool = False):
    """Returns fn(c1 uint8[B,M], c2 uint8[B,N], m int32[B], n int32[B])
    -> (dirs int32[B, M+1, N+1], score int32[B]) for B a multiple of tile.
    The direction matrix is stored unpacked (Mosaic has no vector
    shape-cast for in-kernel bit packing); tile sizes keep the output
    block within VMEM."""
    NP1 = N + 1

    def kernel(c1_ref, c2_ref, m_ref, n_ref, dirs_ref, score_ref,
               t_s, s_s, sc_s):
        # grid = (batch_tiles, M+1); the DP row index is the inner grid
        # dimension, with the previous row carried in VMEM scratch —
        # Mosaic-friendly 2-D stores per row, no dynamic-indexed 3-D ops.
        i = pl.program_id(1)
        TB = tile
        j = jax.lax.broadcasted_iota(jnp.int32, (TB, NP1), 1)

        @pl.when(i == 0)
        def _():
            # row 0 (ref: nw_host.py:46-47): s = r = OPEN+j*EXT -> left
            t_s[:] = jnp.where(j == 0, 0, MAXPEN)
            s_s[:] = jnp.where(j == 0, 0, OPENG + j * EXTG)
            sc_s[:] = jnp.full((TB, 1), MAXPEN, dtype=jnp.int32)
            dirs_ref[0] = jnp.where(j > 0, 1, 0)

        @pl.when(i > 0)
        def _():
            c1 = c1_ref[:].astype(jnp.int32)
            col = jax.lax.broadcasted_iota(jnp.int32, (TB, M), 1)
            c2 = c2_ref[:].astype(jnp.int32)
            nlen = n_ref[:].astype(jnp.int32)        # [TB, 1]
            mlen = m_ref[:].astype(jnp.int32)
            # one-hot column select (dynamic lane-dim slicing needs
            # 128-multiples on Mosaic)
            c1_row = jnp.sum(jnp.where(col == i - 1, c1, 0), axis=1,
                             keepdims=True)
            t_cur, r_cur, s_cur, dirs = _row_sweep(c1_row, c2, t_s[:],
                                                   s_s[:], i)
            dirs_ref[0] = dirs
            at_n = jnp.sum(jnp.where(j == nlen, s_cur, 0), axis=1,
                           keepdims=True)
            sc_s[:] = jnp.where(i == mlen, at_n, sc_s[:])
            t_s[:] = t_cur
            s_s[:] = s_cur

        @pl.when(i == M)
        def _():
            score_ref[:] = sc_s[:]

    def fn(c1, c2, m, n):
        B = c1.shape[0]
        grid = (B // tile, M + 1)
        dirs, score = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile, M), lambda b, i: (b, 0)),
                pl.BlockSpec((tile, N), lambda b, i: (b, 0)),
                pl.BlockSpec((tile, 1), lambda b, i: (b, 0)),
                pl.BlockSpec((tile, 1), lambda b, i: (b, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, tile, NP1), lambda b, i: (i, b, 0)),
                pl.BlockSpec((tile, 1), lambda b, i: (b, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((M + 1, B, NP1), jnp.int32),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile, NP1), jnp.int32),
                pltpu.VMEM((tile, NP1), jnp.int32),
                pltpu.VMEM((tile, 1), jnp.int32),
            ],
            interpret=interpret,
        )(c1.astype(jnp.int32), c2.astype(jnp.int32),
          m.astype(jnp.int32)[:, None], n.astype(jnp.int32)[:, None])
        return jnp.transpose(dirs, (1, 0, 2)), score

    return jax.jit(fn)


def traceback_strings(s1: str, s2: str, dirs: np.ndarray) -> Tuple[str, str]:
    """Host walk over the packed direction matrix — reproduces the
    reference's in-place '-'-insertion traceback (nw_alignment.cpp:59-74)."""
    a1 = list(s1)
    a2 = list(s2)
    i, j = len(s1), len(s2)
    while i > 0 or j > 0:
        d = int(dirs[i, j])
        if d == 1:
            a1.insert(i, "-")
            j -= 1
        elif d == 2:
            a2.insert(j, "-")
            i -= 1
        else:
            i -= 1
            j -= 1
    return "".join(a1), "".join(a2)


@functools.lru_cache(maxsize=None)
def build_nw_traceback(M: int, N: int):
    """On-device traceback: walks the direction matrix per lane and
    returns 2-bit ops packed 16/int32 — ~1500x less device->host
    transfer than downloading the [B, M+1, N+1] direction matrix
    (which made the first wiring of these kernels tunnel-bound)."""
    ND = M + N

    def tb(dirs, m, n):
        B = dirs.shape[0]
        flat = dirs.reshape(B, -1)

        def body(carry, _):
            i, j = carry
            done = (i <= 0) & (j <= 0)
            d = jnp.take_along_axis(flat, (i * (N + 1) + j)[:, None],
                                    axis=1)[:, 0]
            d = jnp.where(done, 3, d)
            ni = jnp.where(done | (d == 1), i, i - 1)
            nj = jnp.where(done | (d == 2), j, j - 1)
            return (ni, nj), d

        _, ops = jax.lax.scan(body, (m, n), None, length=ND)
        ops = ops.T.astype(jnp.uint32)                      # [B, ND]
        ops_p = ops.reshape(B, ND // 16, 16)
        sh = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
        return (ops_p << sh).sum(axis=2, dtype=jnp.uint32)  # [B, ND/16]

    return jax.jit(tb)


def _replay_ops(s1: str, s2: str, words: np.ndarray):
    """Host reconstruction of the '-'-padded strings from packed ops."""
    a1 = list(s1)
    a2 = list(s2)
    i, j = len(s1), len(s2)
    k = 0
    while i > 0 or j > 0:
        d = (int(words[k >> 4]) >> ((k & 15) * 2)) & 3
        if d == 1:
            a1.insert(i, "-")
            j -= 1
        elif d == 2:
            a2.insert(j, "-")
            i -= 1
        else:
            i -= 1
            j -= 1
        k += 1
    return "".join(a1), "".join(a2)


def _encode_side(strs: List[str], width: int, B: int, reverse: bool = False,
                 pad: int = 4):
    """Vectorized 2-bit encode of variable-length strings into a padded
    [B, width] code matrix (pad value 4) + int32 lengths — replaces the
    per-pair Python loop that dominated host time at production batch
    sizes (EXTENSION_BENCH.json)."""
    from ..dna import NT4_TABLE
    bufs = [s.encode() for s in strs]
    lens = np.fromiter((len(b) for b in bufs), np.int32, len(bufs))
    out = np.full((B, width), pad, dtype=np.uint8)
    if bufs:
        codes = NT4_TABLE[np.frombuffer(b"".join(bufs), dtype=np.uint8)]
        row = np.repeat(np.arange(len(bufs)), lens)
        col = np.arange(codes.size) - np.repeat(
            np.cumsum(lens, dtype=np.int64) - lens, lens)
        if reverse:          # right-aligned, reversed (ksw2 query layout)
            out[row, width - 1 - col] = codes
        else:
            out[row, col] = codes
    m = np.zeros(B, dtype=np.int32)
    m[:len(bufs)] = lens
    return out, m


def nw_align_batch(pairs: List[Tuple[str, str]], M: int = 192, N: int = 192,
                   tile: int = 64, interpret: bool = None,
                   return_ops: bool = False):
    """Convenience wrapper: align a list of (s1, s2) pairs on device and
    return '-'-padded strings, bit-identical to ops/nw_host.nw_alignment.
    interpret=None auto-selects pallas interpret mode off-TPU.
    Traceback runs on device; only packed 2-bit ops come back."""
    if interpret is None:
        import jax
        interpret = jax.default_backend() != "tpu"
    B = ((len(pairs) + tile - 1) // tile) * tile
    assert all(len(s1) <= M and len(s2) <= N for s1, s2 in pairs)
    c1, m = _encode_side([a for a, _ in pairs], M, B)
    c2, n = _encode_side([b for _, b in pairs], N, B)
    kern = build_nw_kernel(M, N, tile, interpret=interpret)
    dirs, score = kern(jnp.asarray(c1), jnp.asarray(c2),
                       jnp.asarray(m), jnp.asarray(n))
    words = np.asarray(build_nw_traceback(M, N)(dirs, jnp.asarray(m),
                                                jnp.asarray(n)))
    if return_ops:
        return words[:len(pairs)], np.asarray(score)[:len(pairs), 0]
    out = []
    for k, (s1, s2) in enumerate(pairs):
        out.append(_replay_ops(s1, s2, words[k]))
    return out, np.asarray(score)[:len(pairs), 0]
