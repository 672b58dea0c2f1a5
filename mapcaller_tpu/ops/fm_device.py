"""Device-resident FM-index and batched Occ primitives (JAX).

TPU-first re-design of the reference's occ machinery
(ref: src/bwt_search.cpp:8-119): the interleaved checkpoint/BWT words
become two flat arrays (ckpt[int32/int64], bwt words[uint32]) so that
every occ lookup is two gathers + vectorized popcounts over a whole
batch of query rows at once. The byte-LUT popcount trick (__occ_aux4,
cnt_table) becomes `lax.population_count` on 2-bit-crumb equality
masks.

All row indices fit int32 for genomes up to ~1 Gbp (2 Gbp of fwd+rc
text); larger genomes shard the index along the genome axis (see
parallel/).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex

OCC_INTV_SHIFT = 7


@dataclasses.dataclass(frozen=True)
class DeviceFMIndex:
    primary: jnp.ndarray      # int32 scalar
    L2: jnp.ndarray           # int32[5]
    bwt_words: jnp.ndarray    # uint32[nw]
    ckpt: jnp.ndarray         # int32[nb+1, 4]
    sa_samp: jnp.ndarray      # int32[ns]
    seq_len: int              # static python int
    genome_size: int

    @classmethod
    def from_host(cls, idx: FMIndex) -> "DeviceFMIndex":
        if idx.seq_len >= 2**31:
            raise NotImplementedError("int64 / sharded index path: genome > 1Gbp")
        nw = (idx.seq_len + 15) // 16
        # pad words so every checkpoint block can gather 8 full words
        nb = idx.ckpt.shape[0] - 1
        padded_words = np.zeros(nb * 8 + 8, dtype=np.uint32)
        padded_words[:nw] = idx.bwt_words[:nw]
        return cls(
            primary=jnp.asarray(idx.primary, dtype=jnp.int32),
            L2=jnp.asarray(idx.L2, dtype=jnp.int32),
            bwt_words=jnp.asarray(padded_words),
            ckpt=jnp.asarray(idx.ckpt, dtype=jnp.int32),
            sa_samp=jnp.asarray(idx.sa_samp, dtype=jnp.int32),
            seq_len=int(idx.seq_len),
            genome_size=int(idx.genome_size),
        )


def _crumb_eq_mask(words: jnp.ndarray, c: int) -> jnp.ndarray:
    """01-mask (low bit of each 2-bit crumb) where crumb == c."""
    x = words ^ jnp.uint32(c * 0x55555555)
    nx = ~x
    return nx & (nx >> 1) & jnp.uint32(0x55555555)


def _count4_words(words: jnp.ndarray, valid01: jnp.ndarray) -> jnp.ndarray:
    """Per-base counts over masked crumbs. words/valid01: [..., W] uint32
    -> int32[..., 4]."""
    outs = []
    for c in range(4):
        m = _crumb_eq_mask(words, c) & valid01
        outs.append(jax.lax.population_count(m).sum(axis=-1).astype(jnp.int32))
    return jnp.stack(outs, axis=-1)


def _gather_block_words(fm: DeviceFMIndex, kadj: jnp.ndarray):
    """For adjusted rows kadj[B]: gather the 8 words of each row's
    128-base checkpoint block and build the crumb validity mask
    (words strictly before k's word fully valid; k's word valid through
    k's crumb; rest invalid)."""
    block = kadj >> OCC_INTV_SHIFT                       # [B]
    word_in_block = (kadj >> 4) & 0x7                    # [B]
    crumb = (~kadj) & 0xF                                # position within word
    widx = block[:, None] * 8 + jnp.arange(8, dtype=kadj.dtype)[None, :]
    words = fm.bwt_words[widx]                           # [B, 8] uint32
    j = jnp.arange(8, dtype=kadj.dtype)[None, :]
    full = (j < word_in_block[:, None])
    partial = (j == word_in_block[:, None])
    # crumbs kept in the partial word: the top (16 - crumb_index) crumbs,
    # i.e. bits >= 2*crumb of the 01 mask:  ~((1 << (2*crumb)) - 1)
    keep = (~((jnp.uint32(1) << (2 * crumb).astype(jnp.uint32)) - jnp.uint32(1)))
    valid = jnp.where(full, jnp.uint32(0x55555555),
                      jnp.where(partial, keep[:, None] & jnp.uint32(0x55555555),
                                jnp.uint32(0)))
    return block, words, valid


def occ4(fm: DeviceFMIndex, k: jnp.ndarray) -> jnp.ndarray:
    """Batched bwt_occ4 (ref: bwt_search.cpp:49-66): counts of each base
    in BWT rows [0, k]; k == -1 gives zeros. k: int32[B] -> int32[B, 4]."""
    neg = k < 0
    ksafe = jnp.where(neg, 0, k)
    kadj = ksafe - (ksafe >= fm.primary).astype(ksafe.dtype)
    block, words, valid = _gather_block_words(fm, kadj)
    cnt = fm.ckpt[block] + _count4_words(words, valid)
    return jnp.where(neg[:, None], 0, cnt)


def occ_one(fm: DeviceFMIndex, k: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Batched bwt_occ for a per-row base c (ref: bwt_search.cpp:25-47).
    Handles k == seq_len and k == -1 like the reference."""
    is_full = k == fm.seq_len
    neg = k < 0
    ksafe = jnp.where(neg | is_full, 0, k)
    kadj = ksafe - (ksafe >= fm.primary).astype(ksafe.dtype)
    block, words, valid = _gather_block_words(fm, kadj)
    base = jnp.take_along_axis(fm.ckpt[block], c[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    pattern = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))[:, None]
    x = words ^ pattern
    nx = ~x
    m = nx & (nx >> 1) & jnp.uint32(0x55555555) & valid
    inblock = jax.lax.population_count(m).sum(axis=-1).astype(jnp.int32)
    n = base + inblock
    full_val = fm.L2[c + 1] - fm.L2[c]
    return jnp.where(is_full, full_val, jnp.where(neg, 0, n))


def bwt_code_at(fm: DeviceFMIndex, kadj: jnp.ndarray) -> jnp.ndarray:
    """BWT base at $-removed index (ref: bwt_search.cpp:13-14)."""
    w = fm.bwt_words[kadj >> 4]
    return ((w >> (((~kadj & 0xF) << 1)).astype(jnp.uint32)) & 3).astype(jnp.int32)


def inv_psi(fm: DeviceFMIndex, k: jnp.ndarray) -> jnp.ndarray:
    """Batched LF step (ref: bwt_search.cpp:101-107)."""
    x = k - (k > fm.primary).astype(k.dtype)
    c = bwt_code_at(fm, x)
    val = fm.L2[c] + occ_one(fm, k, c)
    return jnp.where(k == fm.primary, 0, val)


def sa_resolve(fm: DeviceFMIndex, k: jnp.ndarray, active: jnp.ndarray):
    """Batched bwt_sa (ref: bwt_search.cpp:109-119): walk inverse Psi
    until row is a multiple of 32, then add the sampled value.
    k: int32[B]; active: bool[B] lanes to resolve. Returns int32[B]."""
    def cond(state):
        k_, steps_, act_ = state
        return jnp.any(act_ & ((k_ & 31) != 0))

    def body(state):
        k_, steps_, act_ = state
        todo = act_ & ((k_ & 31) != 0)
        k_new = inv_psi(fm, k_)
        k_ = jnp.where(todo, k_new, k_)
        steps_ = jnp.where(todo, steps_ + 1, steps_)
        return k_, steps_, act_

    steps = jnp.zeros_like(k)
    k_f, steps_f, _ = jax.lax.while_loop(cond, body, (k, steps, active))
    return steps_f + fm.sa_samp[k_f >> 5]
