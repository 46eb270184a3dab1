#!/bin/bash
# Final-round quiet-bench hunter: N spaced attempts, each gated on an
# idle box (l1<0.2, l5<0.5), tree restored first so git_dirty stays
# false. Saves each run's contract line + BENCH_DETAIL copy under
# /tmp/qb_run<i>.{log,json} for post-hoc selection.
cd /root/repo || exit 1
N="${1:-3}"
for i in $(seq 1 "$N"); do
  git checkout BENCH_DETAIL.json
  while true; do
    read -r l1 l5 _ < /proc/loadavg
    ok=$(python3 -c "print(1 if $l1<0.2 and $l5<0.5 else 0)")
    [ "$ok" = 1 ] && break
    sleep 20
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    tools/run-main.sh graft.Bench > "/tmp/qb_run$i.log" 2>&1
  cp BENCH_DETAIL.json "/tmp/qb_run$i.json"
  grep -o '"value":[0-9.]*' "/tmp/qb_run$i.log" | head -1
  echo "QB_RUN_${i}_DONE"
  sleep 30
done
echo QB_ALL_DONE
