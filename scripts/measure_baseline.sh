#!/bin/bash
# Re-measure the reference binary's throughput on the bench dataset
# (the vs_baseline denominator in bench.py; see BASELINE.md).
set -e
[ -x /tmp/refbuild/src/MapCaller ] || "$(dirname "$0")/build_reference.sh"
python3 - <<'EOF'
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__ if '__file__' in dir() else 'scripts/x')))))
EOF
# ensure bench fixtures exist (builds /tmp/benchdata via our simulator)
cd "$(dirname "$0")/.."
python3 -c "import sys; sys.path.insert(0,'.'); import bench; bench.ensure_fixtures()"
cd /tmp/benchdata
[ -f refidx.ann ] || /tmp/refbuild/src/MapCaller index ecoli.fa refidx
python3 - <<'EOF'
import subprocess, time
ts = []
for _ in range(3):
    t = time.time()
    subprocess.run(["/tmp/refbuild/src/MapCaller", "-i", "refidx",
                    "-f", "sub_r1.fq", "-f2", "sub_r2.fq", "-t", "1",
                    "-vcf", "ref_out.vcf", "-log", "ref_job.log"],
                   capture_output=True, check=True)
    ts.append(time.time() - t)
best = min(ts)
print(f"reference binary: 200k reads map+call best {best:.2f}s "
      f"= {200000/best:.0f} reads/s (runs: {[round(x,2) for x in ts]})")
EOF
