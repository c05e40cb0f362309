#!/bin/bash
# VERDICT r2 next #2: re-validate the archive under the proto3 timing
# protocol — re-time the top-2 facts of every f32 class (one process per
# class: a relay wedge loses one class, not the sweep), then retire
# untagged rows that over-report past the proto3 champion.
set -u
cd /root/repo
LOG=/tmp/r3_reeval.log
DB=feinsum_tpu/data/transform_archive_v1_tpu.sqlite

# class list read on CPU (sqlite only — no TPU touch)
python - <<'EOF' > /tmp/r3_classes.txt
import jax
jax.config.update("jax_platforms", "cpu")
from feinsum_tpu import sql_utils
seen = []
for e in sql_utils.get_timed_einsums_in_db():
    if any(dt.name == "float64" for dt in e.arg_to_dtype.values()):
        continue
    s = e.get_subscripts()
    if s not in seen:
        seen.append(s)
for s in seen:
    print(s)
EOF
echo "$(wc -l < /tmp/r3_classes.txt) classes to re-time" | tee -a $LOG

while IFS= read -r subs; do
    echo "=== $(date '+%T') re-timing [$subs]" | tee -a $LOG
    timeout 1500 python feinsum_tpu/data/bin/reevaluate_best_k_configurations.py \
        --dst "$DB" -k 2 --skip-dtypes float64 \
        --only-subscripts "$subs" --long-dim-length 1000000 >> $LOG 2>&1
    echo "=== rc=$?" | tee -a $LOG
done < /tmp/r3_classes.txt

# retire untagged over-reporters (CPU, sqlite only)
python scripts/r3_retire_untagged.py | tee -a $LOG
echo "REEVALUATE DONE" | tee -a $LOG
