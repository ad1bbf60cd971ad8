#!/bin/bash
# Third TPU queue: write-path attribution after the split-tree halving.
cd /root/repo
while ! grep -q QUEUE2-DONE /tmp/q2_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== write_phase_probe 2_18r (post extract-halving) ==="
timeout 4000 env FHERAM_CONFIG=2_18r python scripts/write_phase_probe.py > /tmp/q_wphase_r.log 2>&1
echo rc=$?
echo "=== write_phase_probe 2_18tr (turbo cross) ==="
timeout 4000 env FHERAM_CONFIG=2_18tr python scripts/write_phase_probe.py > /tmp/q_wphase_tr.log 2>&1
echo rc=$?
echo QUEUE3-DONE
