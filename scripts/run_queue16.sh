#!/bin/bash
cd /root/repo
while ! grep -q QUEUE15-DONE /tmp/q15_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== bench.py NEW DEFAULT (turbo cross, with batch) ==="
timeout 4000 python bench.py > /tmp/q_bench_default.log 2>&1
echo rc=$?
echo QUEUE16-DONE
