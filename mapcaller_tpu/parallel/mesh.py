"""Multi-chip device step: data-parallel seeding + collective evidence
reduction over a jax.sharding.Mesh.

The reference is single-node pthreads with four mutexes
(ref: src/main.cpp:27, SURVEY section 2c); the TPU-native equivalent:
  * the FM-index replicated into every chip's HBM,
  * read batches sharded over the 'dp' mesh axis,
  * evidence accumulated as +1/-1 diff-array endpoints (the production
    design, see pipeline/profile.py) and reduced with psum_scatter so
    each device owns a contiguous genome slice,
  * the cross-shard cumsum carry resolved with an all_gather of shard
    totals — the same stitch the genome-sharded caller scan uses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.fm_device import DeviceFMIndex, sa_resolve
from ..ops.fm_search import _seed_scan, crumb_lookup


def make_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def build_multichip_map_step(fm: DeviceFMIndex, max_len: int,
                             per_device_batch: int, n_devices: int,
                             mesh: Mesh, hits_per_read: int = 8):
    """Full mapping device step, shard_mapped over the 'dp' axis: each
    device seeds its read shard (2-bit packed codes) against the
    replicated index, builds an exact-coverage diff-array partial over
    the whole genome, and the partials are reduce-scattered so device i
    owns genome slice i; the coverage cumsum is stitched across shards
    via an all_gather of shard totals.

    Returns a jitted fn (packed_codes [B_global, max_len/4], rlens
    [B_global]) -> (cov_shard [G_pad] sharded over dp, total_hits)."""
    G = fm.genome_size
    MIN_SEED_LEN = 16
    max_seeds = max_len // (MIN_SEED_LEN + 1) + 2
    B = per_device_batch
    H = B * hits_per_read
    G_pad = ((G + n_devices - 1) // n_devices) * n_devices

    def device_fn(packed, rlens):
        codes_fn = lambda row, pos: crumb_lookup(packed, row, pos)
        (n_seeds, s_rpos, s_len, s_x0, s_freq, overflow) = _seed_scan(
            fm, codes_fn, rlens, B, max_len, max_seeds, has_n=False)
        sidx = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
        seed_valid = sidx < n_seeds[:, None]
        freqs = jnp.where(seed_valid, s_freq, 0).reshape(-1)
        x0s = s_x0.reshape(-1)
        lens = s_len.reshape(-1)
        total = freqs.sum()
        csum = jnp.cumsum(freqs) - freqs
        hpos = jnp.arange(H, dtype=jnp.int32)
        within = hpos - jnp.repeat(csum, freqs, total_repeat_length=H)
        hit_row = jnp.repeat(x0s, freqs, total_repeat_length=H) + within
        hit_len = jnp.repeat(lens, freqs, total_repeat_length=H)
        hit_valid = hpos < jnp.minimum(total, H)
        hit_loc, resolved = sa_resolve(fm, jnp.where(hit_valid, hit_row, 32),
                                       hit_valid)

        # exact-coverage evidence partial as +1/-1 endpoints (production
        # design: pipeline/profile.py exact_diff), forward-strand spans
        ok = hit_valid & resolved & (hit_loc < G)
        start = jnp.where(ok, hit_loc, G_pad)
        end = jnp.where(ok, jnp.minimum(hit_loc + hit_len, G), G_pad)
        diff = (jnp.zeros(G_pad + 1, dtype=jnp.int32)
                .at[start].add(1).at[end].add(-1))[:G_pad]

        # reduce-scatter: device i owns genome slice i of the summed diff
        diff_shard = jax.lax.psum_scatter(diff.reshape(n_devices, -1),
                                          "dp", scatter_dimension=0,
                                          tiled=False)
        # stitch the cumsum across shards: all_gather shard totals and
        # offset by the prefix owned by lower-indexed shards
        my = jax.lax.axis_index("dp")
        totals = jax.lax.all_gather(diff_shard.sum(), "dp")
        base = jnp.where(jnp.arange(n_devices) < my, totals, 0).sum()
        cov_shard = base + jnp.cumsum(diff_shard)
        return cov_shard, jax.lax.psum(ok.sum(), "dp")

    fn = jax.jit(
        jax.shard_map(device_fn, mesh=mesh,
                      in_specs=(P("dp", None), P("dp")),
                      out_specs=(P("dp"), P()))
    )
    return fn
