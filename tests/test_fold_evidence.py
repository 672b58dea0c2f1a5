"""The folded (speculative) evidence apply in the chain kernel must be
bit-identical to the stand-alone apply path, and the sparse reject
correction must be an exact retraction."""
import numpy as np
import pytest

from mapcaller_tpu.index.fmindex import build_index
from mapcaller_tpu.index.packer import PackedReference
from mapcaller_tpu.ops.chain_device import CLASS_FAST, ChainCtx
from mapcaller_tpu.ops.fm3_device import DeviceFM3
from mapcaller_tpu.ops.fm_search import build_seed_chain_kernel
from mapcaller_tpu.pipeline.device_profile import (
    DevicePlanes, build_apply_kernel, build_correct_kernel)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=20000).astype(np.uint8)
    idx = build_index(None, packed=PackedReference(
        ["chr1"], [len(codes)], [0], codes, []))
    B, bucket = 128, 128
    mat = np.zeros((B, bucket), dtype=np.uint8)
    rlens = np.full(B, 100, dtype=np.int32)
    for b in range(B):
        p = int(rng.integers(0, len(codes) - 100))
        r = codes[p:p + 100].copy()
        if b % 3 == 1:                       # SNP -> fast w/ mismatch
            r[40] = (r[40] + 1) % 4
        if b % 7 == 3:                       # rc strand
            r = (3 - r)[::-1]
        mat[b, :100] = r
    packed = np.zeros((B, bucket // 4), dtype=np.uint8)
    for j in range(4):
        packed |= (mat[:, j::4] & 3) << (2 * j)
    return idx, packed, rlens, B, bucket


def _planes_np(planes):
    return tuple(np.asarray(x) for x in (planes.exact_diff, planes.f_diff,
                                         planes.acgt, planes.multi_diff))


@pytest.mark.parametrize("pair_end", [False, True])
def test_folded_apply_bit_identical(setup, pair_end):
    import jax.numpy as jnp
    idx, packed, rlens, B, bucket = setup
    fm3 = DeviceFM3.from_host(idx)
    ctx = ChainCtx.from_host(idx)
    L, two_l = idx.genome_size, ctx.seq_len

    plain = build_seed_chain_kernel(fm3, ctx, bucket, B)
    dev, pd, mmp = plain(jnp.asarray(packed), jnp.asarray(rlens))
    cls = np.asarray(dev)[:B] & 3
    assert (cls == CLASS_FAST).sum() >= B // 2

    # oracle: plain kernel + dense meta-source apply
    kern_meta = build_apply_kernel(L, two_l, B, pair_end, source="meta")
    want = kern_meta(DevicePlanes.zeros(L), pd, mmp, jnp.asarray(rlens), dev)

    folded = build_seed_chain_kernel(fm3, ctx, bucket, B, with_planes=True,
                                     pair_end=pair_end)
    dev2, pd2, mmp2, got = folded(jnp.asarray(packed), jnp.asarray(rlens),
                                  DevicePlanes.zeros(L))
    assert np.array_equal(np.asarray(dev2), np.asarray(dev))
    for a, b in zip(_planes_np(want), _planes_np(got)):
        assert np.array_equal(a, b)

    # sparse correction: retract every 5th fast read == bits-apply of the
    # remaining admitted set
    fast_ix = np.nonzero(cls == CLASS_FAST)[0]
    rej = fast_ix[::5].astype(np.int32)
    R = 64
    rej_pad = np.full(R, B, dtype=np.int32)
    rej_pad[:rej.size] = rej
    corr = build_correct_kernel(L, two_l, B, pair_end, R)
    got2 = corr(got, pd2, mmp2, jnp.asarray(rlens), jnp.asarray(rej_pad))

    adm = np.zeros(B, dtype=bool)
    adm[fast_ix] = True
    adm[rej] = False
    bits = np.zeros((B + 31) // 32, dtype=np.int32)
    for i in np.nonzero(adm)[0]:
        bits[i >> 5] |= np.int32(1 << (i & 31))
    kern_bits = build_apply_kernel(L, two_l, B, pair_end, source="bits")
    want2 = kern_bits(DevicePlanes.zeros(L), pd, mmp, jnp.asarray(rlens),
                      jnp.asarray(bits))
    for a, b in zip(_planes_np(want2), _planes_np(got2)):
        assert np.array_equal(a, b)
