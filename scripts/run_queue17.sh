#!/bin/bash
cd /root/repo
while ! grep -q QUEUE16-DONE /tmp/q16_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== 2^24 READOPT single read (round-4 kernels) ==="
timeout 4000 python scripts/batch_bench.py --config 2_24r --batch 1 > /tmp/q_224r.log 2>&1
echo rc=$?
echo QUEUE17-DONE
