#!/bin/bash
cd /root/repo
while ! grep -q QUEUE4-DONE /tmp/q4_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== batch_bench 2_18r cached B=512 ==="
timeout 4000 python scripts/batch_bench.py --config 2_18r --cached --batch 512 > /tmp/q_bb512.log 2>&1
echo rc=$?
echo "=== batch_bench 2_18r cached B=1024 ==="
timeout 4000 python scripts/batch_bench.py --config 2_18r --cached --batch 1024 > /tmp/q_bb1024.log 2>&1
echo rc=$?
echo QUEUE5-DONE
