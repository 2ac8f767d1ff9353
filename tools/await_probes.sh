#!/bin/bash
# Patiently run hardware probes across axon-tunnel outages.
#
# Each attempt is ONE python client that either reaches the device and
# runs the probes, or exits cleanly with the backend's UNAVAILABLE
# error after its internal wait (never killed mid-init — a killed TPU
# client can wedge the tunnel for an hour).  Retries with a pause.
#
#   tools/await_probes.sh OUTFILE probe_a probe_b ...
set -u
out="$1"
shift
for attempt in $(seq 1 10); do
    echo "=== attempt $attempt $(date -u +%H:%M:%S)" >> "$out"
    python tools/run_probes.py "$@" >> "$out" 2>&1
    if grep -q "ms/step\|^OK$" "$out"; then
        echo "=== probes completed on attempt $attempt" >> "$out"
        exit 0
    fi
    sleep 240
done
echo "=== gave up after 10 attempts" >> "$out"
exit 1
