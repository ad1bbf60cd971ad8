#!/bin/bash
cd /root/repo
while ! grep -q QUEUE8-DONE /tmp/q8_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== smoke_tpu 2_18 writes (split-kernel extract decode check) ==="
timeout 4000 python scripts/smoke_tpu.py --config 2_18 --writes --iters 1 > /tmp/q_smoke_split.log 2>&1
echo rc=$?
echo "=== write_phase_probe 2_18r (split kernel) ==="
timeout 4000 env FHERAM_CONFIG=2_18r python scripts/write_phase_probe.py > /tmp/q_wphase_split.log 2>&1
echo rc=$?
echo QUEUE9-DONE
