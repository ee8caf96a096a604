#!/bin/bash
# Synthetic trigger test for the wedge watchdog (VERDICT r4 item 9: "a logged
# synthetic-trigger test"). Two cases, pure bash — safe to run any time:
#   1. a fake wedge (process alive, zero output progress) must be killed
#      within ~STALL_S + poll + kill-grace;
#   2. a healthy producer (touches its watchdir) must NOT be killed.
# Usage: bash scripts/watchdog_selftest.sh   (exits 0 on PASS)
set -u
cd /root/repo
export Q=/tmp/watchdog_selftest.log
export STALL_S=20
export WATCH_POLL_S=5
. scripts/watchdog_lib.sh
: > "$Q"
rm -rf /tmp/wd_test && mkdir -p /tmp/wd_test

# Case 1: wedge — sleeps silently far past STALL_S.
t0=$(date +%s)
watched 300 /tmp/wd_test/wedge.log /tmp/wd_test/wedge_dir sleep 300
rc=$?
dt=$(( $(date +%s) - t0 ))
grep -q "WEDGE" "$Q" || { echo "FAIL: no WEDGE log line"; exit 1; }
[ "$dt" -lt 90 ] || { echo "FAIL: wedge kill took ${dt}s"; exit 1; }
echo "case1 PASS: wedged leg killed after ${dt}s rc=$rc"

# Case 2: healthy — touches its watchdir every 5 s for 35 s (> STALL_S).
: > "$Q"
t0=$(date +%s)
watched 300 /tmp/wd_test/ok.log /tmp/wd_test/ok_dir \
  bash -c 'for i in $(seq 7); do touch /tmp/wd_test/ok_dir/tick; sleep 5; done'
rc=$?
dt=$(( $(date +%s) - t0 ))
grep -q "WEDGE" "$Q" && { echo "FAIL: healthy leg was killed"; exit 1; }
[ "$rc" -eq 0 ] || { echo "FAIL: healthy leg rc=$rc"; exit 1; }
echo "case2 PASS: healthy leg survived (${dt}s) rc=$rc"
echo "watchdog selftest PASS"
