#!/bin/bash
# Round-3 TPU work queue. ONE TPU process at a time; each step is its own
# short process (a wedge loses one step, not the round — CLAUDE.md relay
# ops guidance). Generous timeouts: SIGTERM mid-compile has wedged the
# relay before, so budgets are set to never fire on a healthy run.
# Usage: bash scripts/r3_tpu_queue.sh [start-step]
set -u
cd /root/repo
LOG=/tmp/r3_queue.log
START=${1:-0}
step=0

# A VM reboot can wipe site-packages (observed r4: every step died with
# ModuleNotFoundError while the relay window burned).  Self-heal before
# touching the TPU.
if ! python -c "import feinsum_tpu" >/dev/null 2>&1; then
    echo "r3_tpu_queue: feinsum_tpu not importable; reinstalling" \
        | tee -a $LOG
    pip install -e . --no-deps --no-build-isolation -q >> $LOG 2>&1
fi

# HARD DEADLINE: the driver runs its own bench.py on the TPU at round end
# (~16:45 UTC 2026-08-18); a queue step still running then would violate
# the one-TPU-process rule and wedge the driver's capture.  Every step's
# budget is clipped so it ENDS before the deadline; too-small remainders
# skip.  Round 4 reuses this script: set QUEUE_HARD_DEADLINE (epoch secs,
# ~1 h before the round's end) — the baked-in r3 date is a fallback that
# REFUSES to run once stale, so a forgotten env can't silently skip all
# steps or collide with a future driver's bench.
DEADLINE=${QUEUE_HARD_DEADLINE:-$(date -d '2026-08-18 15:45 UTC' +%s \
    2>/dev/null || echo 0)}
if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "r3_tpu_queue: deadline $DEADLINE already passed — set" \
        "QUEUE_HARD_DEADLINE for this round (epoch secs, ~1 h before" \
        "round end). Refusing to run." | tee -a $LOG
    exit 2
fi

wait_up() {
    # relay may wedge mid-queue: block (up to ~6 h) until a bounded probe
    # succeeds so later steps don't burn their budgets on a dead relay.
    # NEVER probe past the deadline: the probe itself touches the TPU and
    # would collide with the driver's round-end bench.
    local tries=0
    while true; do
        if [ "$DEADLINE" -gt 0 ] \
                && [ "$(date +%s)" -ge $((DEADLINE - 300)) ]; then
            echo "    deadline reached while waiting; stopping probes" \
                | tee -a $LOG
            return 1
        fi
        if timeout 240 python -c "import jax; jax.devices()" \
                >/dev/null 2>&1; then
            return 0
        fi
        tries=$((tries+1))
        echo "    relay down (probe $tries); sleeping 420 s" | tee -a $LOG
        if [ $tries -ge 50 ]; then
            echo "    giving up waiting for relay" | tee -a $LOG
            return 1
        fi
        sleep 420
    done
}

run() {
    local budget=$1; shift
    if [ $step -lt $START ]; then
        echo "=== [$step] SKIP $*" | tee -a $LOG
        step=$((step+1)); return
    fi
    wait_up || { echo "=== [$step] SKIPPED (relay down) $*" | tee -a $LOG;
                 step=$((step+1)); return; }
    # deadline check AFTER wait_up: waiting for the relay may itself have
    # eaten hours.  SKIP rather than truncate: a clipped `timeout` fires
    # SIGTERM mid-compile, which has wedged the relay for 8 h before
    # (CLAUDE.md relay ops).  Self-limiting steps (r3_reevaluate.sh reads
    # QUEUE_DEADLINE and stops between classes) pass a pre-shrunk budget.
    if [ "$DEADLINE" -gt 0 ]; then
        local remain=$((DEADLINE - $(date +%s)))
        if [ "$budget" -gt "$remain" ]; then
            echo "=== [$step] SKIPPED (deadline: need ${budget}s," \
                "have ${remain}s) $*" | tee -a $LOG
            step=$((step+1)); return
        fi
    fi
    echo "=== [$step] $(date '+%T') $*" | tee -a $LOG
    timeout "$budget" "$@" >> $LOG 2>&1
    echo "=== [$step] rc=$? $(date '+%T')" | tee -a $LOG
    step=$((step+1))
}

# bench with a window-adapted budget: a full run gets 5400 s; a LATE
# relay window (remain < 5400) still runs bench, self-limited via
# BENCH_DEADLINE (bench exits CLEANLY between rows — no SIGTERM
# mid-compile; the 900 s gap below the hard budget absorbs one
# worst-case in-flight compile).  Below 2400 s remaining a headline
# can't finish even warm-cache: skip.
run_bench() {
    local remain=5400
    if [ "$DEADLINE" -gt 0 ]; then
        remain=$((DEADLINE - $(date +%s)))
    fi
    if [ "$remain" -ge 5400 ]; then
        run 5400 python bench.py
    elif [ "$remain" -ge 2400 ]; then
        export BENCH_DEADLINE=$(($(date +%s) + remain - 900))
        run "$remain" python bench.py
        unset BENCH_DEADLINE
    else
        echo "=== [$step] SKIPPED bench (only ${remain}s before deadline)" \
            | tee -a $LOG
        step=$((step+1))
    fi
}

# 0: probe (fast fail if relay is down again)
run 300 python -c "import jax; print(jax.devices())"

# 1: bench FIRST — if the relay window turns out short, a green
# driver-verifiable bench (r2's missing artifact) beats everything else;
# champions are warm in the persistent compile cache from r2
run_bench

# 2-3: lane_pack sweeps (new knob, VERDICT #3)
run 2700 python scripts/tune_lane_pack.py matvec 1800
run 1900 python scripts/tune_lane_pack.py vecmat 1000

# r4: the DG lane-pack rewrite (div/grad P1-P2 unlock) gets its first TPU
# evidence BEFORE the long reevaluate, so even a short window scores the
# model-ranked g=32 seeds on the weakest rows
run 1500 python scripts/tune_small_ndof.py div4 600
run 1500 python scripts/tune_small_ndof.py grad4 600

# 4: EARLY bounded reevaluate pass (VERDICT #2 is priority #2 after the
# green bench): ~70 min over the priority classes, self-limited from its
# own start time.  Resumable — the done-file means the full pass below
# never re-times these.
export REEVAL_WINDOW=4200
run 6000 bash scripts/r3_reevaluate.sh
unset REEVAL_WINDOW

# 3-8: small-ndof retune under the consolidated space (+ the uncovered
# single-output div class)
run 1500 python scripts/tune_small_ndof.py div_single 600
run 1500 python scripts/tune_small_ndof.py div4 600
run 1500 python scripts/tune_small_ndof.py grad4 600
run 1500 python scripts/tune_small_ndof.py div10 600
run 1500 python scripts/tune_small_ndof.py grad10 600
run 1500 python scripts/tune_small_ndof.py div20 600
run 1500 python scripts/tune_small_ndof.py grad20 600
run 1500 python scripts/tune_small_ndof.py div35 600
run 1500 python scripts/tune_small_ndof.py grad35 600
run 1500 python scripts/tune_small_ndof.py curl 600
# face/mass sit AT the 80% north star; copy at 85 — consolidated-space
# knobs (mfold/rowcat) they never searched + headroom insurance
run 1500 python scripts/tune_small_ndof.py face 600
run 1500 python scripts/tune_small_ndof.py mass 600
run 1300 python scripts/tune_small_ndof.py copy 400

# 9: dd fp64 (pure-f32 Mosaic: does NOT poison the compile helpers);
# grad covers the new bench fp64 evidence row
run 2700 python scripts/tune_dd.py div 1800
run 1500 python scripts/tune_dd.py grad 800

# 10: tc_pallas_v0 evidence (VERDICT #4a) — enumerated, not random: the
# guarded space has only 0-8 valid points per benchmark
run 2400 python scripts/tune_tc_pallas.py 1500

# ttgt_v1 evidence (structured-permutation space must not ship with zero
# facts): seeded from each class's v0 champion, short structured search
run 1200 python scripts/tune_ttgt_v1.py 12 400
run 1200 python scripts/tune_ttgt_v1.py 5 400

# 11: re-validate the archive under proto3 (one process per class inside;
# ends with the untagged-over-reporter retire pass) — VERDICT r2 #2.
# Self-limiting: the class loop stops when QUEUE_DEADLINE leaves no room
# for another 1500 s class, so the whole-window budget below never
# SIGTERMs it mid-compile; reserve 5700 s after it for the final bench.
export QUEUE_DEADLINE=$((DEADLINE > 0 ? DEADLINE - 5700 : 0))
if [ "$DEADLINE" -gt 0 ]; then
    reeval_budget=$((DEADLINE - $(date +%s) - 5500))
    [ $reeval_budget -gt 14000 ] && reeval_budget=14000
else
    reeval_budget=14000
fi
if [ "$reeval_budget" -gt 1800 ]; then
    run "$reeval_budget" bash scripts/r3_reevaluate.sh
else
    echo "=== [11] SKIPPED (no room before deadline)" | tee -a $LOG
    step=$((step+1))
fi
# retire pass again as its OWN step (CPU/sqlite only — run directly, NOT
# via run(): it must fire even when the relay is down): if the sweep above
# hit its outer timeout mid-class, the in-script retire never ran
echo "=== [retire] $(date '+%T')" | tee -a $LOG
timeout 600 python scripts/r3_retire_untagged.py >> $LOG 2>&1
echo "=== [retire] rc=$? $(date '+%T')" | tee -a $LOG

# 12: bench (warms every champion into the persistent compile cache so the
# driver's capture is fast + green; f64 runs last inside bench itself)
run_bench

# 13: round-4 design probe (cheap, ~5 min): in-VMEM lane reshape cost —
# decides whether div/grad get a lane_pack rewrite next round
run 1200 python scripts/tpu_lane_reshape_probe.py

# 14: consumer path end-to-end at E=1M (VERDICT r3 #7): plan latency,
# full-length numeric check, compiled-vs-raw-XLA per-call ratio
run 1800 python scripts/tpu_consumer_probe.py

# opportunistic: fill any window left before the deadline with extra
# tuning cycles on the weakest rows.  Safe for the driver's capture:
# autotune compiles every measured config at the bench shapes (E=1M)
# into the SHARED persistent compile cache, so any new champion is warm.
while [ "$DEADLINE" -gt 0 ] \
        && [ $(($(date +%s) + 1600)) -lt "$DEADLINE" ]; do
    for cls in matvec div4 grad4 div10 grad10 face mass div20 grad20 \
               div35 grad35 copy curl; do
        [ $(($(date +%s) + 1600)) -lt "$DEADLINE" ] || break
        # a mid-loop wedge must not burn the rest of the window 1400 s
        # at a time: cheap bounded probe first
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

echo "=== QUEUE DONE $(date '+%T')" | tee -a $LOG
