#!/bin/bash
cd /root/repo
export FHERAM_NTT=pallas
echo "=== rmw_batch_probe B=16 turbo ==="
timeout 4000 python scripts/rmw_batch_probe.py --b 16 --k 3 > /tmp/q_rmwb16.log 2>&1
echo rc=$?
echo "=== rmw_batch_probe B=64 turbo ==="
timeout 4000 python scripts/rmw_batch_probe.py --b 64 --k 3 > /tmp/q_rmwb64.log 2>&1
echo rc=$?
echo QUEUE18-DONE
