#!/usr/bin/env python
"""Scaled calling validation (VERDICT r2 missing #5): plant SNVs and
small indels in a 10 Mb window of the 60 Mb chr-scale genome, simulate
paired reads from the two mutated haplotypes at ~16x over the window,
then run BOTH the reference binary (/tmp/refbuild/src/MapCaller, -t 1)
and this pipeline against the ORIGINAL reference genome and compare the
record sets byte for byte.  Writes SCALED_CALLING.json.

Ref call path being validated at scale: VariantCalling.cpp:550-680
(dense scan), :576-597 (indels), :632-651 (gap/CNV runs).

Env: MC_SCV_DIR (workdir), MC_SCV_DEPTH (default 16), MC_SCV_PLATFORM
(cpu|default: force jax platform), MC_SCV_SHARDS (index_shards).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = os.environ.get("MC_SCV_DIR", "/tmp/scv")
SRC_FA = "/tmp/chrscale2/chr.fa"          # made by chr_scale_smoke.py
SRC_IDX = "/tmp/chrscale2/idx"
REF_BIN = "/tmp/refbuild/src/MapCaller"
W0, W1 = 10_000_000, 20_000_000           # mutated + sequenced window
DEPTH = int(os.environ.get("MC_SCV_DEPTH", 16))
RLEN, FRAG_LO, FRAG_HI = 100, 350, 550


def make_truth_and_reads(rng, codes):
    """Plant hom/het SNVs + 1-8 bp indels; return (truth list,
    hap0, hap1 code arrays for the window)."""
    import numpy as np
    truth = []
    occupied = np.zeros(W1 - W0, bool)
    n_snv, n_ind = 10_000, 2_000
    pos_all = rng.choice(W1 - W0 - 100, size=n_snv + n_ind, replace=False)
    pos_all.sort()
    # enforce >=60 bp spacing so events don't interact
    keep = np.concatenate([[True], np.diff(pos_all) >= 60])
    pos_all = pos_all[keep]
    kinds = rng.permutation(
        ["snv"] * min(n_snv, pos_all.size - n_ind) + ["ind"] * n_ind)
    edits = []           # (win_pos, kind, het, payload)
    for p, kind in zip(pos_all.tolist(), kinds.tolist()):
        het = bool(rng.integers(0, 2))
        if kind == "snv":
            alt = (int(codes[W0 + p]) + int(rng.integers(1, 4))) % 4
            edits.append((p, "snv", het, alt))
        else:
            ln = int(rng.integers(1, 9))
            if rng.integers(0, 2):       # insertion after p
                ins = rng.integers(0, 4, size=ln).astype(np.uint8)
                edits.append((p, "ins", het, ins))
            else:                        # deletion of [p+1, p+1+ln)
                edits.append((p, "del", het, ln))
    # build haplotype sequences for the window (hom -> both haps)
    import numpy as np

    def apply(edits_sel):
        parts, last = [], 0
        win = codes[W0:W1]
        for p, kind, _h, pay in edits_sel:
            parts.append(win[last:p])
            if kind == "snv":
                parts.append(np.array([pay], np.uint8))
                last = p + 1
            elif kind == "ins":
                parts.append(win[p:p + 1])
                parts.append(pay)
                last = p + 1
            else:
                parts.append(win[p:p + 1])
                last = p + 1 + pay
        parts.append(win[last:])
        return np.concatenate(parts)

    hap0 = apply([e for e in edits if not e[2]])     # hom only
    hap1 = apply(edits)                              # hom + het
    for p, kind, het, pay in edits:
        truth.append(dict(gpos=W0 + p, kind=kind, het=het,
                          payload=(int(pay) if kind in ("snv", "del")
                                   else "".join("ACGT"[c] for c in pay))))
    return truth, hap0, hap1


def write_reads(rng, hap0, hap1, fq1, fq2):
    from mapcaller_tpu.dna import decode
    n_pairs = (W1 - W0) * DEPTH // (2 * RLEN) // 2 * 2
    comp0, comp1 = 3 - hap0, 3 - hap1
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for k in range(n_pairs):
            hap, cmp_ = (hap0, comp0) if rng.integers(0, 2) else (hap1,
                                                                  comp1)
            p = int(rng.integers(0, hap.size - FRAG_HI - 1))
            frag = int(rng.integers(FRAG_LO, FRAG_HI))
            r1 = hap[p:p + RLEN]
            r2 = cmp_[p + frag - RLEN:p + frag][::-1]
            f1.write(f"@v{k}/1\n{decode(r1)}\n+\n{'I' * RLEN}\n")
            f2.write(f"@v{k}/2\n{decode(r2)}\n+\n{'I' * RLEN}\n")
    return 2 * n_pairs


def vcf_records(path):
    return [l for l in open(path) if not l.startswith("#")]


def _compare(out, rv, tv, truth):
    out["ref_records"] = len(rv)
    out["tpu_records"] = len(tv)
    out["vcf_byte_identical"] = rv == tv
    if rv != tv:
        out["first_diffs"] = {"ref_only": sorted(set(rv) - set(tv))[:5],
                              "tpu_only": sorted(set(tv) - set(rv))[:5]}
    # recall vs planted truth (sanity, both callers)
    called = set()
    for l in rv:
        f = l.split("\t")
        if "TYPE=" not in f[7]:
            continue                    # gap/CNV run records carry END=
        typ = f[7].split("TYPE=")[1].split(";")[0].lower()
        called.add((int(f[1]) - 1, typ))
    n_snv = sum(t["kind"] == "snv" for t in truth)
    n_ind = len(truth) - n_snv
    snv_hit = sum(1 for t in truth if t["kind"] == "snv"
                  and (t["gpos"], "snv") in called)
    ind_hit = sum(1 for t in truth if t["kind"] != "snv"
                  and any((t["gpos"] + d, ty) in called
                          for d in (-1, 0, 1) for ty in ("ins", "del")))
    out["ref_snv_recall"] = round(snv_hit / max(n_snv, 1), 4)
    out["ref_indel_recall"] = round(ind_hit / max(n_ind, 1), 4)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALED_CALLING.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))


def main():
    import numpy as np
    out = {"window": [W0, W1], "depth": DEPTH}
    os.makedirs(DIR, exist_ok=True)
    if not (os.path.exists(SRC_FA) and os.path.exists(REF_BIN)):
        sys.exit("run scripts/chr_scale_smoke.py and "
                 "scripts/build_reference.sh first")
    from mapcaller_tpu.index.fmindex import load_index
    idx = load_index(SRC_IDX)
    codes = idx.ref.codes
    rng = np.random.default_rng(1234)
    fq1, fq2 = f"{DIR}/r1.fq", f"{DIR}/r2.fq"
    truth_p = f"{DIR}/truth.json"
    if not os.path.exists(fq1):
        truth, hap0, hap1 = make_truth_and_reads(rng, codes)
        json.dump(truth, open(truth_p, "w"))
        out["n_reads"] = write_reads(rng, hap0, hap1, fq1, fq2)
    truth = json.load(open(truth_p))
    out["n_truth_snv"] = sum(t["kind"] == "snv" for t in truth)
    out["n_truth_indel"] = sum(t["kind"] != "snv" for t in truth)

    # ---- reference binary ----
    ref_idx = f"{DIR}/refidx"
    ref_vcf = f"{DIR}/ref.vcf"
    if not os.path.exists(ref_vcf):
        if not os.path.exists(ref_idx + ".sa"):
            t0 = time.time()
            subprocess.run([REF_BIN, "index", SRC_FA, ref_idx], check=True,
                           capture_output=True)
            out["ref_index_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        subprocess.run([REF_BIN, "-i", ref_idx, "-t", "1", "-f", fq1,
                        "-f2", fq2, "-vcf", ref_vcf, "-sam",
                        f"{DIR}/ref.sam", "-log", f"{DIR}/ref.log"],
                       check=True, capture_output=True)
        out["ref_map_call_s"] = round(time.time() - t0, 1)

    # ---- this pipeline ----
    if os.path.exists(f"{DIR}/tpu.vcf") and os.environ.get("MC_SCV_REUSE"):
        rv, tv = vcf_records(ref_vcf), vcf_records(f"{DIR}/tpu.vcf")
        _compare(out, rv, tv, truth)
        return
    import jax
    if os.environ.get("MC_SCV_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["MC_SCV_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from mapcaller_tpu.config import Config
    from mapcaller_tpu.pipeline.stream import run_stream_mapping
    from mapcaller_tpu.runner import make_engine, run_calling
    cfg = Config(sam_file=f"{DIR}/tpu.sam", vcf_file=f"{DIR}/tpu.vcf",
                 log_file=f"{DIR}/tpu.log", batch_size=8192,
                 stream_batch_size=32768, max_read_len=128,
                 index_shards=int(os.environ.get("MC_SCV_SHARDS", 0)))
    engine = make_engine(idx, cfg)
    cfg.read_files1, cfg.read_files2 = [fq1], [fq2]
    sam_parts = []
    t0 = time.time()
    run_stream_mapping(engine, cfg, t0, sam_parts.append)
    out["tpu_map_s"] = round(time.time() - t0, 1)
    engine.finalize()
    t0 = time.time()
    out["variant_counts"] = run_calling(engine, cfg, "scaled-validation")
    out["tpu_call_s"] = round(time.time() - t0, 1)
    with open(f"{DIR}/tpu_body.sam", "w") as f:
        f.write("".join(sam_parts))

    # ---- compare ----
    _compare(out, vcf_records(ref_vcf), vcf_records(f"{DIR}/tpu.vcf"),
             truth)


if __name__ == "__main__":
    main()
