#!/bin/bash
# VERDICT r2 next #2: re-validate the archive under the proto3 timing
# protocol — re-time the top-2 facts of every f32 class (one process per
# class: a relay wedge loses one class, not the sweep), then retire
# untagged rows that over-report past the proto3 champion.
#
# Bench-suite classes are re-timed FIRST so a truncated sweep still covers
# every row the driver measures; a bounded relay probe runs before each
# class so a mid-sweep wedge skips classes instead of burning their
# budgets.  The retire pass is CPU-only and runs regardless (also exposed
# as scripts/r3_retire_untagged.py for a separate queue step).
set -u
cd /root/repo
LOG=/tmp/r3_reeval.log
DB=feinsum_tpu/data/transform_archive_v1_tpu.sqlite

# class list read on CPU (sqlite only — no TPU touch), bench classes first
python - <<'EOF' > /tmp/r3_classes.txt
import jax
jax.config.update("jax_platforms", "cpu")
import feinsum_tpu as f
from feinsum_tpu import sql_utils
import bench
# the driver-visible bench rows, headline first — DB keys are CANONICAL
PRIORITY = []
for e in ([e for _n, e, _r in list(bench.suite())
           + list(bench.extended_suite())]
          + [f.get_tccg_benchmark(i, dtype="float32")
             for i in bench.TCCG_SAMPLE]):
    s = f.canonicalize_einsum(e).get_subscripts()
    if s not in PRIORITY:
        PRIORITY.append(s)
seen = []
for e in sql_utils.get_timed_einsums_in_db():
    if any(dt.name == "float64" for dt in e.arg_to_dtype.values()):
        continue
    s = e.get_subscripts()
    if s not in seen:
        seen.append(s)
seen.sort(key=lambda s: (PRIORITY.index(s) if s in PRIORITY
                         else len(PRIORITY), s))
for s in seen:
    print(s)
EOF
echo "$(wc -l < /tmp/r3_classes.txt) classes to re-time" | tee -a $LOG

# QUEUE_DEADLINE (epoch secs) / REEVAL_WINDOW (seconds from NOW): stop
# starting classes when no room remains for a full 1500 s class — a clean
# exit here is what lets the caller avoid SIGTERM-ing a mid-compile
# process (wedge risk).  REEVAL_WINDOW is measured from this script's own
# start (the caller's wait_up may have eaten hours before it launched us).
QD=${QUEUE_DEADLINE:-0}
if [ "${REEVAL_WINDOW:-0}" -gt 0 ]; then
    W=$(($(date +%s) + REEVAL_WINDOW))
    if [ "$QD" -eq 0 ] || [ "$W" -lt "$QD" ]; then
        QD=$W
    fi
fi
# resumable across invocations: completed classes are recorded here, so
# an early bounded pass (priority classes) and the later full pass never
# re-time the same class twice
DONE=/tmp/r3_reeval_done.txt
touch $DONE

while IFS= read -r subs; do
    if grep -qxF "$subs" $DONE; then
        continue
    fi
    if [ "$QD" -gt 0 ] && [ $(($(date +%s) + 1600)) -gt "$QD" ]; then
        echo "=== $(date '+%T') deadline; stopping before [$subs]" \
            | tee -a $LOG
        break
    fi
    # bounded probe: a wedged relay must cost ~4 min, not 25 per class
    if ! timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1
    then
        echo "=== $(date '+%T') relay down; SKIP [$subs]" | tee -a $LOG
        continue
    fi
    echo "=== $(date '+%T') re-timing [$subs]" | tee -a $LOG
    timeout 1500 python feinsum_tpu/data/bin/reevaluate_best_k_configurations.py \
        --dst "$DB" -k 2 --skip-dtypes float64 \
        --only-subscripts "$subs" --long-dim-length 1000000 >> $LOG 2>&1
    rc=$?
    echo "=== rc=$rc" | tee -a $LOG
    [ $rc -eq 0 ] && echo "$subs" >> $DONE
done < /tmp/r3_classes.txt

# retire untagged over-reporters (CPU, sqlite only)
python scripts/r3_retire_untagged.py | tee -a $LOG
echo "REEVALUATE DONE" | tee -a $LOG
