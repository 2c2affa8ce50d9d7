#!/bin/bash
# Measure 8B Q4_K_M B=1 decode at a given commit, in an isolated worktree.
# Usage: bisect_commit_decode.sh <commit>
set -e
C=$1
WT=/tmp/bisect_wt_$C
git -C /root/repo worktree add -f $WT $C >/dev/null 2>&1 || true
cd $WT
timeout 600 python scripts/bench_batched_8b.py 1 2>&1 | grep -E "B=|build"
