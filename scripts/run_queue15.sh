#!/bin/bash
cd /root/repo
while ! grep -q QUEUE14-DONE /tmp/q14_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== write_probe 2_18r (independent RMW cross-check) ==="
timeout 4000 env FHERAM_CONFIG=2_18r python scripts/write_probe.py > /tmp/q_wprobe_r.log 2>&1
echo rc=$?
echo QUEUE15-DONE
