#!/bin/bash
# Round-6 TPU queue — fired by relay_watchdog.sh on the first relay window.
#   QUEUE_HARD_DEADLINE=<epoch ~1 h before round end> bash scripts/r6_tpu_queue.sh [start-step]
#
# State it builds on (r5 warm session, 2026-08-20):
#   - dd fp64 is PROVEN on TPU (i32 index-map fix, 5a55354): diag COMPILES
#     ACCURATE + first archive row dd div 116.7 GOp/s (11.7x chunked-XLA).
#     The div row is the FIRST point tried — the whole dd family is untuned.
#   - headline 82.03/1.529 live; grad4 72.2 / grad10 76.6 still under the
#     north star; smallndof ceiling probe results were lost to a reboot
#     (/tmp) — rerun and COPY INTO THE REPO.
#   - bench-first stays: the live line + warm champion cache is the round's
#     most important artifact.  bench's fp64 section sickens the compile
#     helpers for FRESH compiles afterward (dd sweeps still land, ~10x
#     slower per point — budget accordingly).
#
# Ops rules (CLAUDE.md): one TPU process at a time; never SIGTERM a python
# mid-remote-compile (GNU timeout forwards signals — bounded steps may be
# timeout-wrapped ONLY because a wedge loses one step, not the round; the
# dd diag pattern of unkillable children is for diagnostics); launch with
# setsid nohup or the tree dies with the claude session; capture real pids
# from ps, not $! (setsid wrapper exits instantly).
set -u
cd /root/repo
LOG=/tmp/r6_queue.log
DEADLINE=${QUEUE_HARD_DEADLINE:?set QUEUE_HARD_DEADLINE (epoch secs)}
START=${1:-0}

if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "r6_queue: deadline already passed; refusing" | tee -a $LOG
    exit 2
fi

(cd / && python -c "import feinsum_tpu") 2>/dev/null || \
    pip install -e . --no-deps --no-build-isolation >> $LOG 2>&1

wait_up() {
    local tries=0
    while true; do
        if [ "$(date +%s)" -ge $((DEADLINE - 300)) ]; then
            return 1
        fi
        if timeout 240 python -c "import jax; jax.devices()" \
                >/dev/null 2>&1; then
            return 0
        fi
        tries=$((tries+1))
        echo "    relay down (probe $tries); sleeping 420 s" | tee -a $LOG
        sleep 420
    done
}

STEP=-1
run() {
    STEP=$((STEP+1))
    local budget=$1; shift
    [ "$STEP" -lt "$START" ] && { echo "=== [$STEP] SKIP (start) $*"; return; }
    wait_up || { echo "=== [$STEP] SKIPPED (relay/deadline) $*" | tee -a $LOG;
                 return; }
    local remain=$((DEADLINE - $(date +%s)))
    if [ "$budget" -gt "$remain" ]; then
        echo "=== [$STEP] SKIPPED (deadline: need ${budget}s, have" \
            "${remain}s) $*" | tee -a $LOG
        return
    fi
    echo "=== [$STEP] $(date '+%T') $*" | tee -a $LOG
    timeout "$budget" "$@" >> $LOG 2>&1
    echo "=== [$STEP] rc=$? $(date '+%T')" | tee -a $LOG
}

# [0] live line + champion cache warm (headline prints first AND last)
BENCH_DEADLINE=$(($(date +%s) + 2400)) run 2600 python bench.py

# [1][2] dd fp64 family sweeps (BONUS rotates mass/face resp. curl/matvec)
run 1800 python scripts/tune_dd.py div 1500
run 1800 python scripts/tune_dd.py grad 1500

# [3] consumer-path end-to-end ratio reconfirmation (>=1.0x bar)
run 1200 python scripts/tpu_consumer_probe.py

# [4][5] the two rows furthest under the north star
run 1600 python scripts/tune_small_ndof.py grad4 900
run 1600 python scripts/tune_small_ndof.py grad10 900

# [6] per-class practical-ceiling evidence — copy into the repo this time
run 1800 python scripts/tpu_smallndof_ceiling.py grad4 grad10 div4
[ -f /tmp/smallndof_ceiling.json ] && \
    cp /tmp/smallndof_ceiling.json doc/smallndof_ceiling_r6.json

# leftover window: weakest-row rotation; reserve 3300 s for the tail bench
while [ $(($(date +%s) + 1600 + 3300)) -lt "$DEADLINE" ]; do
    for cls in div4 div10 matvec face mass grad4 grad10; do
        [ $(($(date +%s) + 1600 + 3300)) -lt "$DEADLINE" ] || break
        if ! timeout 240 python -c "import jax; jax.devices()" \
                >/dev/null 2>&1; then
            echo "=== [opportunistic] relay down; stopping" | tee -a $LOG
            break 2
        fi
        echo "=== [opportunistic] $(date '+%T') $cls" | tee -a $LOG
        timeout 1400 python scripts/tune_small_ndof.py "$cls" 700 \
            >> $LOG 2>&1
        echo "=== [opportunistic] rc=$? $(date '+%T')" | tee -a $LOG
    done
done

# FINAL bench: re-warm every (possibly new) champion for the driver's capture
run 3100 python bench.py
echo "=== R6 QUEUE DONE $(date '+%T')" | tee -a $LOG
