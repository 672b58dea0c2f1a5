"""Multichip device map step on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mapcaller_tpu.index.fmindex import build_index
from mapcaller_tpu.index.packer import PackedReference
from mapcaller_tpu.ops.fm_device import DeviceFMIndex
from mapcaller_tpu.parallel.mesh import build_multichip_map_step, make_mesh


def _pack2(codes):
    B, W = codes.shape
    out = np.zeros((B, W // 4), dtype=np.uint8)
    for j in range(4):
        out |= (codes[:, j::4] & 3) << (2 * j)
    return out


@pytest.mark.parametrize("n_devices", [2, 8])
def test_mesh_map_step_coverage(n_devices, rng):
    codes = rng.integers(0, 4, size=30000).astype(np.uint8)
    ref = PackedReference(["chr1"], [len(codes)], [0], codes, [])
    idx = build_index(None, packed=ref)
    fm = DeviceFMIndex.from_host(idx)
    mesh = make_mesh(n_devices)
    PER_DEV, MAXLEN = 16, 64
    step = build_multichip_map_step(fm, MAXLEN, PER_DEV, n_devices, mesh)

    B = PER_DEV * n_devices
    reads = np.zeros((B, MAXLEN), dtype=np.uint8)
    rlens = np.full(B, 48, dtype=np.int32)
    starts = []
    for b in range(B):
        p = int(rng.integers(0, idx.genome_size - 48))
        starts.append(p)
        reads[b, :48] = codes[p:p + 48]
    packed = jax.device_put(jnp.asarray(_pack2(reads)),
                            NamedSharding(mesh, P("dp", None)))
    rl = jax.device_put(jnp.asarray(rlens), NamedSharding(mesh, P("dp")))
    cov_shard, n_hits = step(packed, rl)
    cov = np.asarray(cov_shard)
    assert int(n_hits) >= B
    # every sampled 48-mer contributes forward coverage over its span
    for p in starts:
        assert cov[p:p + 48].min() >= 1, p
    # total coverage equals the sum of forward-hit span lengths
    assert cov.sum() >= B * 48


def test_multichip_pipeline_bit_identical():
    """The full production pipeline over an 8-device mesh produces a
    variant set bit-identical to the single-device run (VERDICT round-1
    item 4): device mismatch evidence, host slow path (DEL), and
    gap/CNV runs crossing the genome-shard seams."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_multichip_pipeline_two_devices():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)
