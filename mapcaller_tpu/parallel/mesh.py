"""Multi-chip execution: read-batch data parallelism + genome-sharded
PFM reduction over a jax.sharding.Mesh.

The reference is single-node pthreads with four mutexes
(ref: src/main.cpp:27, SURVEY section 2c); the TPU-native equivalent is:
  * the FM-index replicated into every chip's HBM,
  * read batches sharded over the 'dp' mesh axis,
  * per-device PFM partials merged with psum_scatter so each device
    owns a contiguous genome slice (the caller's genome scan then runs
    shard-locally).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.fmindex import FMIndex
from ..ops.fm_device import DeviceFMIndex
from ..ops.fm_search import MIN_SEED_LEN, OCC_THR


def make_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def build_multichip_map_step(fm: DeviceFMIndex, max_len: int,
                             per_device_batch: int, n_devices: int,
                             mesh: Mesh, hits_per_read: int = 8):
    """Full mapping device step, shard_mapped over the 'dp' axis:
    each device seeds its read shard against the replicated index,
    scatter-adds a coverage PFM partial over the whole genome, and the
    partials are reduce-scattered so device i owns genome slice i.

    Returns (jitted_fn, (codes, rlens)) where codes is the global batch
    [n_devices * per_device_batch, max_len].
    """
    from ..ops.fm_search import build_seed_kernel
    G = fm.genome_size
    G_pad = ((G + n_devices - 1) // n_devices) * n_devices
    seed_kernel_local = _seed_body(fm, max_len, per_device_batch, hits_per_read)

    def device_fn(codes, rlens):
        # codes: [per_device_batch, max_len] (this device's shard)
        hit_rpos, hit_len, hit_loc, hit_valid = seed_kernel_local(fm, codes, rlens)
        # PFM coverage partial: +1 over [loc, loc+len) for forward-strand
        # hits (bounded per-seed length <= max_len)
        loc = jnp.where(hit_valid & (hit_loc < G), hit_loc, G_pad)
        offs = jnp.arange(max_len, dtype=jnp.int32)[None, :]
        span_pos = loc[:, None] + offs                       # [H, max_len]
        span_ok = (offs < hit_len[:, None]) & (span_pos < G_pad)
        flat = jnp.where(span_ok, span_pos, G_pad).reshape(-1)
        pfm = jnp.zeros(G_pad + 1, dtype=jnp.int32).at[flat].add(1)[:G_pad]
        # reduce-scatter: device i ends up owning genome slice i
        pfm_shard = jax.lax.psum_scatter(pfm.reshape(n_devices, -1),
                                         "dp", scatter_dimension=0,
                                         tiled=False)
        n_hits = hit_valid.sum()
        return pfm_shard, jax.lax.psum(n_hits, "dp")

    fn = jax.jit(
        jax.shard_map(device_fn, mesh=mesh,
                      in_specs=(P("dp", None), P("dp")),
                      out_specs=(P("dp"), P()))
    )
    return fn


def _seed_body(fm: DeviceFMIndex, max_len: int, batch: int, hits_per_read: int):
    """Per-device seeding body (same state machine as
    ops/fm_search.build_seed_kernel, trimmed to the outputs the
    multichip PFM step needs)."""
    from ..ops.fm_search import build_seed_kernel
    inner = build_seed_kernel(fm, max_len, batch, hits_per_read)

    H = inner.H

    def body(fm_arg, codes, rlens):
        packed = inner.raw_kernel(fm_arg, codes, rlens)
        meta = packed[0:H]
        hit_loc = packed[H:2 * H]
        hit_len = meta & 0x1FF
        hit_rpos = (meta >> 9) & 0x1FF
        hit_valid = hit_len > 0
        return hit_rpos, hit_len, hit_loc, hit_valid

    return body
