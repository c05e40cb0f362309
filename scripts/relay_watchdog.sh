#!/bin/bash
# Relay watchdog: probe the TPU relay until it answers, then fire the TPU
# work queue ONCE.  This is the round-opening move whenever the relay is
# down (observed outages run 3-11+ h).
#
# Usage:
#   nohup bash scripts/relay_watchdog.sh <deadline-epoch-secs> \
#       >> /tmp/relay_watch.log 2>&1 &
# where <deadline-epoch-secs> is ~1 h before the round's end (the driver
# runs bench.py on the TPU at round end; probes themselves touch the TPU
# and MUST NOT collide with it — CLAUDE.md one-TPU-process rule).
#
# Probes are bounded (a wedged relay hangs attaches ~25 min otherwise) and
# spaced 7 min apart.  The queue inherits the deadline via
# QUEUE_HARD_DEADLINE and self-limits every step.
set -u
DEADLINE=${1:?usage: relay_watchdog.sh <deadline-epoch-secs>}
QUEUE=${2:-/root/repo/scripts/r6_tpu_queue.sh}

while true; do
    ts=$(date '+%F %T')
    if [ "$(date +%s)" -ge $((DEADLINE - 300)) ]; then
        echo "$ts deadline; watchdog exiting without firing"
        exit 0
    fi
    if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "$ts UP - firing queue"
        QUEUE_HARD_DEADLINE=$DEADLINE bash "$QUEUE"
        echo "$(date '+%F %T') queue finished"
        exit 0
    fi
    echo "$ts down"
    sleep 420
done
