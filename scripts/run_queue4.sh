#!/bin/bash
cd /root/repo
while ! grep -q QUEUE3-DONE /tmp/q3_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== merge_probe (kernel-only us/merge vs nb) ==="
timeout 3600 python scripts/merge_probe.py > /tmp/q_merge.log 2>&1
echo rc=$?
echo QUEUE4-DONE
