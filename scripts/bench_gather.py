"""Gather-bandwidth roofline microbench (VERDICT r2 weak #7).

Measures the TPU's random row-gather throughput as a function of row
width and table size, using the exact access pattern of the seeding hot
loop (ops/fm_search._seed_scan3): STEPS sequentially-dependent batched
gathers of G lanes each, fused in one jitted fori_loop (so per-call
tunnel latency amortizes over the whole chain, matching the production
kernel's shape).

This substantiates (or refutes) PERF.md's claims that
  * the 288 B occ3 row rides a fast row-copy path (~constant rows/s for
    rows >= 256 B), i.e. the 3-step scan is at the gather knee, and
  * a 4-step occ table (1 KiB+ rows) loses on bandwidth: same rows/s
    ceiling but 3.6x the bytes for only 4/3 fewer steps.

Writes GATHER_ROOFLINE.json at the repo root:
  rows: [{row_bytes, table_mb, rows_per_s, bytes_per_s}], plus a
  derived occ3-vs-occ4 step-time comparison.

Run alone (the axon tunnel falsifies timings if another TPU process is
active, and timing is only honest after a first device->host copy —
done below before any measurement).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 48          # ~ the seed scan's lockstep iteration count
G = 32768           # lanes (reads) per gather, = production batch
REPS = 3


def bench_one(width: int, table_mb: int) -> dict:
    R = max(1 << 14, (table_mb << 20) // (width * 4))
    R = 1 << int(np.log2(R))            # power of two for cheap masking
    table = jnp.asarray(
        np.random.randint(0, 3, size=(R, width), dtype=np.int32))
    idx0 = jnp.asarray(np.random.randint(0, R, size=G, dtype=np.int32))

    @jax.jit
    def kern(table, idx0):
        def body(i, carry):
            idx, acc = carry
            rows = table[idx]                       # [G, width] gather
            s = rows.sum(axis=1)
            nxt = (idx * 1103515245 + s + i) & (R - 1)   # dependent chain
            return nxt, acc + s
        idx, acc = jax.lax.fori_loop(0, STEPS, body, (idx0, idx0 * 0))
        return acc[0] + idx[0]

    out = kern(table, idx0)
    _ = int(out)                        # sync + honest-timing trigger
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = int(kern(table, idx0))
        best = min(best, time.perf_counter() - t0)
    rows_s = STEPS * G / best
    return {"row_bytes": width * 4, "table_mb": R * width * 4 >> 20,
            "rows_per_s": round(rows_s),
            "bytes_per_s": round(rows_s * width * 4),
            "t_ms": round(best * 1e3, 3)}


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)
    # honest-timing trigger: one D2H before any measurement
    _ = np.asarray(jnp.zeros(8))

    rows = []
    cfg = os.environ.get(
        "MC_GATHER_CONFIGS",
        "256:8,256:16,256:32,256:64,256:72,256:128,256:272,"
        "1024:8,1024:72,1024:272,2048:72")
    prior = os.environ.get("MC_GATHER_MERGE")
    if prior and os.path.exists(prior):
        with open(prior) as f:
            rows = json.load(f)["rows"]
    done = {(r["table_mb"], r["row_bytes"]) for r in rows}
    for item in cfg.split(","):
        mb, width = (int(x) for x in item.split(":"))
        if any(tm >= mb * 0.5 and tm <= mb and rb == width * 4
               for tm, rb in done):
            continue
        r = bench_one(width, mb)
        rows.append(r)
        print(json.dumps(r), file=sys.stderr)

    # occ3 (72 int32 = 288 B, 2 gathers / 3 bases) vs hypothetical occ4
    # (4^4 counts + syms ~ 272 int32 = 1088 B, 2 gathers / 4 bases),
    # at the production table size (256 MB class)
    def t_row(width):
        cand = [r for r in rows if r["row_bytes"] == width * 4
                and r["table_mb"] >= 128 and r["table_mb"] < 1024]
        return 1.0 / cand[0]["rows_per_s"] if cand else None
    t3, t4 = t_row(72), t_row(272)
    verdictd = None
    if t3 and t4:
        per_base_3 = 2 * t3 / 3
        per_base_4 = 2 * t4 / 4
        verdictd = {"occ3_s_per_base": per_base_3,
                    "occ4_s_per_base": per_base_4,
                    "occ4_vs_occ3": round(per_base_4 / per_base_3, 3)}
    out = {"device": f"{dev.platform}:{dev.device_kind}",
           "steps": STEPS, "lanes": G, "rows": rows,
           "occ_step_comparison": verdictd}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GATHER_ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(verdictd))


if __name__ == "__main__":
    main()
