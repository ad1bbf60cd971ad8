#!/bin/bash
# Second TPU queue: waits for run_queue.sh's QUEUE-DONE, then probes the
# pack scaling question (batched-pack regression) + TBT sweep.
cd /root/repo
while ! grep -q QUEUE-DONE /tmp/q_main.log 2>/dev/null; do sleep 30; done
export FHERAM_NTT=pallas
echo "=== pack_scale_probe TBT=4 ==="
timeout 3600 python scripts/pack_scale_probe.py > /tmp/q_pack_t4.log 2>&1
echo rc=$?
echo "=== pack_scale_probe TBT=16 (nb 64,256) ==="
timeout 3600 env FHERAM_TBT=16 python scripts/pack_scale_probe.py --nbs 64,256 > /tmp/q_pack_t16.log 2>&1
echo rc=$?
echo QUEUE2-DONE
