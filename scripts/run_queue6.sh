#!/bin/bash
cd /root/repo
while ! grep -q QUEUE5-DONE /tmp/q5_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== batch_bench B=64 rerun (barrier slope, raw walls) ==="
timeout 4000 python scripts/batch_bench.py --config 2_18r --cached --batch 64 > /tmp/q_bb64_v2.log 2>&1
echo rc=$?
echo "=== bench.py rerun (fixed extract + barrier batched slope) ==="
timeout 4000 python bench.py > /tmp/q_bench_v2.log 2>&1
echo rc=$?
echo QUEUE6-DONE
