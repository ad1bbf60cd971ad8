#!/bin/bash
# Sequential TPU measurement queue (single chip: jobs must not overlap).
cd /root/repo
export FHERAM_NTT=pallas
echo "=== batch_phase_probe 2_18r cached B=64 ==="
timeout 3600 python scripts/batch_phase_probe.py --config 2_18r --cached --b 64 --k 4 > /tmp/q_bphase_r64.log 2>&1
echo rc=$?
echo "=== batch_bench 2_18r cached B=64 (wall+slope) ==="
timeout 3600 python scripts/batch_bench.py --config 2_18r --cached --batch 64 > /tmp/q_bb64.log 2>&1
echo rc=$?
echo "=== batch_bench 2_18r cached B=256 ==="
timeout 3600 python scripts/batch_bench.py --config 2_18r --cached --batch 256 > /tmp/q_bb256.log 2>&1
echo rc=$?
echo "=== bench.py (read + RMW + batched_rps) ==="
timeout 3600 python bench.py > /tmp/q_bench.log 2>&1
echo rc=$?
echo "=== vm_cycle_probe ==="
timeout 3600 python scripts/vm_cycle_probe.py --k 3 > /tmp/q_vmcycle.log 2>&1
echo rc=$?
echo QUEUE-DONE
