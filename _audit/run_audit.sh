#!/bin/bash
# Headline-drift audit (VERDICT r4 weak#1 / next#3):
# 3 fresh-process bench.py runs on the r4 tree, then 3 on the r3 tree
# (git worktree at 18c0d31), identical ordering, one TPU process at a time.
set -u
cd /root/repo
for i in 1 2 3; do
  echo "=== r4 tree run $i $(date +%T) ==="
  timeout 850 python bench.py > _audit/bench_r4_run$i.json 2> _audit/bench_r4_run$i.log
  rc=$?
  echo "exit $rc"
  if [ $rc -eq 124 ]; then sleep 300; else sleep 30; fi
done
git worktree add _audit/r3tree 18c0d31 2>&1 | tail -1
cd /root/repo/_audit/r3tree
for i in 1 2 3; do
  echo "=== r3 tree run $i $(date +%T) ==="
  timeout 850 python bench.py > /root/repo/_audit/bench_r3_run$i.json 2> /root/repo/_audit/bench_r3_run$i.log
  rc=$?
  echo "exit $rc"
  if [ $rc -eq 124 ]; then sleep 300; else sleep 30; fi
done
echo "AUDIT DONE $(date +%T)"
