#!/bin/bash
cd /root/repo
while ! grep -q QUEUE13-DONE /tmp/q13_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== final bench.py READOPT ==="
timeout 4000 python bench.py > /tmp/q_bench_final.log 2>&1
echo rc=$?
echo "=== turbo read re-sample (no batch) ==="
timeout 4000 env FHERAM_BENCH_DECOMP=turbo FHERAM_BENCH_BATCH=0 python bench.py > /tmp/q_bench_turbo2.log 2>&1
echo rc=$?
echo QUEUE14-DONE
