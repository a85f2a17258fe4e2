#!/bin/bash
# Chained WᵀW-precision A/B at n=8192: one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
rm -f /tmp/wtw_ab_results.jsonl
for args in "potgrad" "nuts compensated" "nuts default"; do
  echo "=== $args $(date -u +%H:%M:%S) ==="
  timeout 1500 python scripts/tpu_wtw_ab.py $args
  rc=$?
  echo "=== $args rc=$rc $(date -u +%H:%M:%S) ==="
  sleep 30
done
echo ALL DONE
