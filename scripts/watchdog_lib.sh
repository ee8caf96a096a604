# Wedge watchdog (VERDICT r4 item 9) — source this; requires $Q (log file)
# and $STALL_S (stall threshold, seconds) in the environment.
#
# watched <tmo> <log> <watchdir> <cmd...>: run cmd under `timeout -k 30` in
# the background and kill it if neither the log nor anything under watchdir
# gains mtime for STALL_S seconds — the recorded axon futex-wedge signature
# (main thread parked in futex_do_wait, CSV mtime frozen, tunnel healthy;
# two round-4 incidents each silently burned the rest of a chip window).
# Kills are by explicit PID only: TERM to the timeout wrapper (which forwards
# it), then direct TERM/KILL of surviving children found via `ps --ppid` —
# never by name pattern. Returns the command's rc (124 timeout, 137/143 on a
# watchdog kill).
watched() {
  local tmo="$1" log="$2" wdir="$3"; shift 3
  mkdir -p "$wdir"
  timeout -k 30 "$tmo" "$@" > "$log" 2>&1 &
  local pid=$!
  local t0
  t0=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep "${WATCH_POLL_S:-30}"
    # Fresh-box lesson (r5): a cold leg can sit inside ONE remote XLA
    # compile for >STALL_S with no file activity anywhere — mtime silence
    # in that phase is not the wedge signature. Two guards: a no-kill grace
    # window covering the first compile, and the compilation cache counted
    # as progress (each completed sub-program writes an entry).
    if [ $(( $(date +%s) - t0 )) -lt "${COLD_GRACE_S:-2400}" ]; then
      continue
    fi
    local fresh
    fresh=$(find "$wdir" "$log" \
            "${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}" \
            -newermt "-${STALL_S} seconds" -print -quit 2>/dev/null)
    if [ -z "$fresh" ]; then
      echo "=== WEDGE: no mtime progress in ${STALL_S}s — killing leg pid=$pid $(date) ===" >> "$Q"
      local kids
      kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
      kill "$pid" 2>/dev/null
      sleep 10
      for k in $kids; do kill -0 "$k" 2>/dev/null && kill -9 "$k" 2>/dev/null; done
      kill -0 "$pid" 2>/dev/null && kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  return $?
}
