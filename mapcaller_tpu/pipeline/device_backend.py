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
    def __init__(self, idx: FMIndex, cfg: Config):
        import jax
        self.idx = idx
        self.cfg = cfg
        self.fm = DeviceFMIndex.from_host(idx)
        self.batch = cfg.batch_size
        self.max_len = cfg.max_read_len
        self.kernel = build_seed_kernel(self.fm, self.max_len, self.batch)

    def seed_batch(self, codes_list: List[np.ndarray]) -> List[list]:
        """codes_list: per-read uint8 code arrays (any length <= max_len
        after truncation guard). Returns per-read sorted FragPair lists
        with sentinel, exactly as identify_simple_pairs would."""
        n = len(codes_list)
        out: List[list] = []
        for lo in range(0, n, self.batch):
            chunk = codes_list[lo:lo + self.batch]
            out.extend(self._one_batch(chunk))
        return out

    def _one_batch(self, chunk: List[np.ndarray]) -> List[list]:
        B = self.batch
        codes = np.full((B, self.max_len), 4, dtype=np.uint8)
        rlens = np.zeros(B, dtype=np.int32)
        fallback = [False] * len(chunk)
        for i, c in enumerate(chunk):
            if c.shape[0] > self.max_len:
                fallback[i] = True
                continue
            codes[i, :c.shape[0]] = c
            rlens[i] = c.shape[0]
        outs = self.kernel(jnp.asarray(codes), jnp.asarray(rlens))
        (hit_read, hit_rpos, hit_len, hit_loc, hit_valid,
         total, overflow, buf_ovf) = (np.asarray(x) for x in outs)
        if bool(buf_ovf):
            # batch-level hit-buffer overflow: host fallback for everything
            return [identify_simple_pairs(self.idx, c) for c in chunk]
        pairs = seeds_to_frag_pairs(hit_read, hit_rpos, hit_len, hit_loc,
                                    hit_valid, B, self.idx.seq_len)
        result = []
        for i, c in enumerate(chunk):
            if fallback[i] or overflow[i]:
                result.append(identify_simple_pairs(self.idx, c))
            else:
                result.append(pairs[i])
        return result
