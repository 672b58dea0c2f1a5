"""Device-backend end-to-end: TPU-kernel seeding feeding the pipeline
must reproduce the golden SAM bit-for-bit (CPU backend here)."""
import gzip
import os

import pytest

from mapcaller_tpu.config import Config
from mapcaller_tpu.index.fmindex import build_index
from mapcaller_tpu.io.fastq import iter_chunks
from mapcaller_tpu.io.sam import sam_headers
from mapcaller_tpu.pipeline.device_backend import DeviceBackend
from mapcaller_tpu.pipeline.engine import MappingEngine
from mapcaller_tpu.pipeline.read import ReadState

DATA = os.path.join(os.path.dirname(__file__), "data", "subset")


def read_lines(path):
    with gzip.open(path, "rt") as f:
        return f.read().splitlines()


def test_device_seeding_matches_golden_sam(toy_fasta):
    idx = build_index(toy_fasta)
    cfg = Config(sam_file="x", vcf_output=False, batch_size=256, max_read_len=128)
    backend = DeviceBackend(idx, cfg)
    engine = MappingEngine(idx, cfg, backend=backend)
    sam = sam_headers(engine.genome, "0.9.9.41")
    chunks = list(iter_chunks(os.path.join(DATA, "sub_r1.fq.gz"),
                              os.path.join(DATA, "sub_r2.fq.gz")))
    buffered = [[ReadState(r.header, r.seq, r.qual) for r in ch] for ch in chunks]
    flat = [rd for ch in buffered for rd in ch]
    engine.preseed(flat, True)
    for ch in buffered:
        sam.extend(engine.process_chunk(ch, True))
    golden = read_lines(os.path.join(DATA, "sub_ref.sam.gz"))
    assert sam == golden


def test_occ3_hbm_budget_predicate():
    """The 3-step table is selected only when table + SA + evidence
    planes + workspace fit the chip (a 200 Mb genome with calling
    measured 20.3 GB on a 15.75 GB v5e — compile-time OOM); oversize
    genomes must fall back to the 1-step kernel instead of crashing."""
    be = DeviceBackend.__new__(DeviceBackend)

    class _I:
        pass

    class _CfgCall:
        vcf_output = True

    class _CfgMap:
        vcf_output = False

    for mb, call_ok, map_ok in ((4.6, True, True), (60, True, True),
                                (200, False, True), (500, False, False)):
        i = _I()
        i.genome_size = int(mb * 1e6)
        i.seq_len = 2 * i.genome_size
        assert be._occ3_fits(i, _CfgCall()) == call_ok, mb
        assert be._occ3_fits(i, _CfgMap()) == map_ok, mb
