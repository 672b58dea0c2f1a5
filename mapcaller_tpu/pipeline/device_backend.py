"""Device batch runner: TPU seeding for the mapping engine.

Batches reads across input chunks into fixed-size device batches,
runs the lockstep FM-search kernel, and hands per-read FragPair lists
back to the host pipeline. Falls back to the host oracle for reads the
fixed-capacity kernel flags as overflowed (seed- or hit-buffer).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..index.fmindex import FMIndex
from ..ops.fm_device import DeviceFMIndex
from ..ops.fm_search import build_seed_kernel, seeds_to_frag_pairs
from .seeding import identify_simple_pairs


class DeviceBackend:
    BUCKETS = (128, 192, 256)

    def __init__(self, idx: FMIndex, cfg: Config):
        import jax
        self.idx = idx
        self.cfg = cfg
        self.fm = DeviceFMIndex.from_host(idx)
        self.batch = cfg.batch_size
        self.max_len = cfg.max_read_len
        self._kernels = {}

    def _kernel_for(self, bucket: int):
        if bucket not in self._kernels:
            self._kernels[bucket] = build_seed_kernel(self.fm, bucket, self.batch)
        return self._kernels[bucket]

    def seed_batch(self, codes_list: List[np.ndarray]) -> List[tuple]:
        """codes_list: per-read uint8 code arrays. Returns per-read flat
        seed arrays (rpos int32[], gpos int64[], length int32[]) with the
        PosDiff > 0 filter applied — the exact seed set of
        identify_simple_pairs, unsorted and without the sentinel."""
        return self.collect(self.submit(codes_list))

    def submit(self, codes_list: List[np.ndarray]):
        """Enqueue device seeding for all sub-batches (async dispatch);
        returns a token for collect()."""
        n = len(codes_list)
        pending = []
        for lo in range(0, n, self.batch):
            chunk = codes_list[lo:lo + self.batch]
            pending.append(self._submit_one(chunk))
        return pending

    def collect(self, pending) -> List[tuple]:
        out: List[tuple] = []
        for item in pending:
            out.extend(self._collect_one(item))
        return out

    def _oracle_arrays(self, c: np.ndarray) -> tuple:
        pairs = identify_simple_pairs(self.idx, c)[:-1]  # drop sentinel
        return (np.array([p.rPos for p in pairs], dtype=np.int32),
                np.array([p.gPos for p in pairs], dtype=np.int64),
                np.array([p.rLen for p in pairs], dtype=np.int32))

    def _submit_one(self, chunk: List[np.ndarray]):
        B = self.batch
        longest = max((c.shape[0] for c in chunk), default=0)
        bucket = next((b for b in self.BUCKETS
                       if b >= min(longest, self.max_len)), self.BUCKETS[-1])
        codes = np.full((B, bucket), 4, dtype=np.uint8)
        rlens = np.zeros(B, dtype=np.int32)
        fallback = [False] * len(chunk)
        for i, c in enumerate(chunk):
            if c.shape[0] > bucket:
                fallback[i] = True
                continue
            codes[i, :c.shape[0]] = c
            rlens[i] = c.shape[0]
        kernel = self._kernel_for(bucket)
        dev = kernel.submit(jnp.asarray(codes), jnp.asarray(rlens))
        return (kernel, dev, chunk, fallback)

    def _collect_one(self, item) -> List[tuple]:
        kernel, dev, chunk, fallback = item
        B = self.batch
        (hit_read, hit_rpos, hit_len, hit_loc, hit_valid,
         total, overflow, buf_ovf) = kernel.collect(dev)
        if bool(buf_ovf):
            # batch-level hit-buffer overflow: host fallback for everything
            return [self._oracle_arrays(c) for c in chunk]
        pd = hit_loc.astype(np.int64) - hit_rpos
        keep = hit_valid & (pd > 0)
        order_read = hit_read[keep]
        rp = hit_rpos[keep].astype(np.int32)
        gp = hit_loc[keep].astype(np.int64)
        ln = hit_len[keep].astype(np.int32)
        # hits are already grouped by read (flattened seed order)
        bounds = np.searchsorted(order_read, np.arange(B + 1))
        result = []
        for i, c in enumerate(chunk):
            if fallback[i] or overflow[i]:
                result.append(self._oracle_arrays(c))
            else:
                s, e = bounds[i], bounds[i + 1]
                result.append((rp[s:e], gp[s:e], ln[s:e]))
        return result
