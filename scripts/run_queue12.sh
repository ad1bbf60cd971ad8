#!/bin/bash
cd /root/repo
while ! grep -q QUEUE11-DONE /tmp/q11_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== batch_bench B=64 SLICED pack ==="
timeout 4000 python scripts/batch_bench.py --config 2_18r --cached --batch 64 > /tmp/q_bb64_sliced.log 2>&1
echo rc=$?
echo "=== batch_bench B=256 SLICED pack ==="
timeout 4000 python scripts/batch_bench.py --config 2_18r --cached --batch 256 > /tmp/q_bb256_sliced.log 2>&1
echo rc=$?
echo QUEUE12-DONE
