#!/bin/bash
cd /root/repo
while ! grep -q QUEUE10-DONE /tmp/q10_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== merge_probe --trunc (READOPT merge shapes) ==="
timeout 3600 python scripts/merge_probe.py --trunc > /tmp/q_merge_trunc.log 2>&1
echo rc=$?
echo QUEUE11-DONE
