#!/bin/bash
cd /root/repo
while ! grep -q QUEUE12-DONE /tmp/q12_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== rpw_probe 2_18r ==="
timeout 4000 python scripts/rpw_probe.py --k 4 > /tmp/q_rpw.log 2>&1
echo rc=$?
echo QUEUE13-DONE
