#!/bin/bash
# Sequential TPU measurement queue (single chip: jobs must not overlap).
# Waits for an existing bench.py PID if given as $1.
cd /root/repo
if [ -n "$1" ]; then
  echo "waiting for pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
export FHERAM_NTT=pallas
echo "=== batch_bench 2_18 B=16 (MXU) ==="
timeout 3600 python scripts/batch_bench.py --config 2_18 --batch 16 > /tmp/q_batch16.log 2>&1
echo rc=$?
echo "=== batch_bench 2_24 B=1 pallas ==="
timeout 5400 python scripts/batch_bench.py --config 2_24 --batch 1 > /tmp/q_b24p.log 2>&1
echo rc=$?
echo "=== vm_smoke (jitted loops, post-compile latency) ==="
timeout 5400 python scripts/vm_smoke.py > /tmp/q_vmsmoke.log 2>&1
echo rc=$?
echo "=== phase_probe (MXU attribution) ==="
timeout 5400 python scripts/phase_probe.py --k 8 > /tmp/q_phase.log 2>&1
echo rc=$?
echo QUEUE-DONE
