#!/bin/bash
# Sequential TPU measurement queue (single chip: jobs must not overlap).
# Waits for an existing bench.py PID if given as $1.
cd /root/repo
if [ -n "$1" ]; then
  echo "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
export FHERAM_NTT=pallas
echo "=== bench.py turbo x readopt cross ==="
timeout 3600 env FHERAM_BENCH_DECOMP=turbo python bench.py > /tmp/q_turbo.log 2>&1
echo rc=$?
echo "=== batch_bench 2_18r B=256 ==="
timeout 3600 python scripts/batch_bench.py --config 2_18r --batch 256 > /tmp/q_b256r.log 2>&1
echo rc=$?
echo "=== write_phase_probe 2_18r ==="
timeout 3600 env FHERAM_CONFIG=2_18r python scripts/write_phase_probe.py > /tmp/q_wphase_r.log 2>&1
echo rc=$?
echo QUEUE-DONE
