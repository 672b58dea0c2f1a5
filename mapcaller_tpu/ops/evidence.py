"""Shared fast-read evidence scatter (ref: AlignmentProfile.cpp:41-119
via the diff design in pipeline/device_profile.py).

One admitted FAST read contributes: exact-coverage range endpoints at
[g_start, end), an orientation-plane (F1/R2/F2/R1) range, and per
mismatch a coverage hole + a read-base point add. All contributions are
commutative scatter-adds, so the same code serves the stand-alone apply
kernel, the folded chain-kernel apply (speculative, corrected later),
the sparse reject-correction kernel (sign=-1), and the mesh phase-B
evidence builder."""
from __future__ import annotations

import jax.numpy as jnp


def scatter_fast_evidence(exact, fd, acgt, adm, pd, mmp, rlens, b_first,
                          L: int, two_l: int, sign: int = 1):
    """exact [L+2], fd flat [4*(L+2)], acgt flat [4*(L+1)]; adm bool[N],
    pd/rlens int32[N], mmp int32[N, S] packing (r << 2 | base), -1 empty
    (ops/chain_device.classify_reads); b_first bool[N]. Returns the
    updated (exact, fd, acgt)."""
    S = jnp.int32(sign)
    ori = pd < L
    g_start = jnp.clip(jnp.where(ori, pd, two_l - pd - rlens), 0, L - 1)
    end = jnp.minimum(g_start + rlens, L)
    dumpE = jnp.int32(L + 1)
    exact = exact.at[jnp.where(adm, g_start, dumpE)].add(
        jnp.where(adm, S, 0), mode="drop")
    exact = exact.at[jnp.where(adm, end, dumpE)].add(
        jnp.where(adm, -S, 0), mode="drop")
    fpl = jnp.where(b_first, jnp.where(ori, 0, 3),
                    jnp.where(ori, 1, 2)).astype(jnp.int32)
    dumpF = jnp.int32(4 * (L + 2) - 1)
    fd = fd.at[jnp.where(adm, fpl * (L + 2) + g_start, dumpF)].add(
        jnp.where(adm, S, 0), mode="drop")
    fd = fd.at[jnp.where(adm, fpl * (L + 2) + end, dumpF)].add(
        jnp.where(adm, -S, 0), mode="drop")
    dumpA = jnp.int32(4 * (L + 1) - 1)
    for k in range(mmp.shape[1]):
        e = mmp[:, k]
        on = adm & (e >= 0)
        r = e >> 2
        base = e & 3
        p = jnp.clip(jnp.where(ori, pd + r, two_l - 1 - (pd + r)), 0, L - 1)
        exact = exact.at[jnp.where(on, p, dumpE)].add(
            jnp.where(on, -S, 0), mode="drop")
        exact = exact.at[jnp.where(on, p + 1, dumpE)].add(
            jnp.where(on, S, 0), mode="drop")
        pb = jnp.where(ori, base, 3 - base)
        acgt = acgt.at[jnp.where(on, pb * (L + 1) + p, dumpA)].add(
            jnp.where(on, S, 0), mode="drop")
    return exact, fd, acgt
