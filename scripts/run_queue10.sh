#!/bin/bash
cd /root/repo
while ! grep -q QUEUE9-DONE /tmp/q9_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== bench.py turbo x readopt cross (split kernel + restructure) ==="
timeout 4000 env FHERAM_BENCH_DECOMP=turbo FHERAM_BENCH_BATCH=0 python bench.py > /tmp/q_bench_turbo.log 2>&1
echo rc=$?
echo QUEUE10-DONE
