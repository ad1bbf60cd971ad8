#!/bin/bash
cd /root/repo
while ! grep -q QUEUE6-DONE /tmp/q6_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== vm_cycle_probe rerun (keys as args) ==="
timeout 4000 python scripts/vm_cycle_probe.py --k 3 > /tmp/q_vmcycle2.log 2>&1
echo rc=$?
echo QUEUE7-DONE
