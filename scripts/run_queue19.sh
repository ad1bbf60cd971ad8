#!/bin/bash
cd /root/repo
export FHERAM_NTT=pallas
echo "=== vm_cycle_probe (shift-trunc) ==="
timeout 4000 python scripts/vm_cycle_probe.py --k 3 > /tmp/q_vmcycle3.log 2>&1
echo rc=$?
echo QUEUE19-DONE
