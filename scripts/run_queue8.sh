#!/bin/bash
cd /root/repo
while ! grep -q QUEUE7-DONE /tmp/q7_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== pack_scale_probe TBT=8 (nb 4,64,256) ==="
timeout 3600 env FHERAM_TBT=8 python scripts/pack_scale_probe.py --nbs 4,64,256 > /tmp/q_pack_t8.log 2>&1
echo rc=$?
echo QUEUE8-DONE
