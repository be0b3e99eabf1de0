#!/bin/bash
# Round-5 device-window measurement battery.  Run ONLY when the TPU is
# free (the flagship run's graph phase or after it completes); each
# step appends one JSON line to tools/round5_window.out.
#
# Usage: bash tools/round5_window.sh [quick|full]
set -u
cd /root/repo
OUT=tools/round5_window.out
MODE=${1:-quick}
echo "=== window $(date -u +%H:%M:%S) mode=$MODE ===" >> $OUT

# A/B: device-DP with default vs prefix+walk variants (1.5Mb workload,
# the round-4 measurement scale; dp-only + skip-ref halves the window)
echo "--- dp default ---" >> $OUT
timeout 1200 python bench_consensus.py --genome-size 1500000 \
    --paths dp --skip-ref 2>>$OUT | tail -1 >> $OUT
echo "--- dp prefix+walk ---" >> $OUT
FTPU_CNS_PREFIX=1 FTPU_CNS_WALK=1 \
timeout 1200 python bench_consensus.py --genome-size 1500000 \
    --paths dp --skip-ref 2>>$OUT | tail -1 >> $OUT

if [ "$MODE" = full ]; then
    # hostmsa + reference pool for the full round-5 consensus table
    echo "--- hostmsa + ref ---" >> $OUT
    timeout 1800 python bench_consensus.py --genome-size 1500000 \
        --paths hostmsa 2>>$OUT | tail -1 >> $OUT
    # E. coli e2e, 3 warm repeats (VERDICT r4 #5)
    echo "--- ecoli e2e x3 ---" >> $OUT
    timeout 3000 python bench_e2e.py --genome-size 4600000 \
        --coverage 24 --repeats 3 --out /root/repo/runs/ecoli_r5 \
        2>>$OUT | tail -1 >> $OUT
fi
echo "=== done $(date -u +%H:%M:%S) ===" >> $OUT
