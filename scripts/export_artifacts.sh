#!/bin/bash
# Export trained state into git so it survives machine swaps.
#
# Round-2 lesson: runs/ is gitignored and the box was swapped mid-round, which
# destroyed the 67k-iteration flagship checkpoint (BASELINE.md round-2 tail
# rows) and every queued probe's state — the ROADMAP's continuation arms died
# with it. Committed artifacts make restore-and-continue work ACROSS rounds:
# point cfg.log.restore_path at artifacts/<run>/ (checkpoint.find_last_checkpoint
# scans any directory) or copy the file back under runs/<run>/.
#
# Copies, for each runs/<name> directory that has checkpoints:
#   - the LATEST qmcjax_ckpt_*.npz (full state: walkers, params, opt state,
#     extras incl. EMA) -> artifacts/<name>/
#   - train_states.csv, gzipped (the energy trace behind BASELINE.md rows)
#
# Usage: bash scripts/export_artifacts.sh [name ...]   # default: all of runs/
set -u
cd /root/repo
mkdir -p artifacts
names=("$@")
if [ "${#names[@]}" -eq 0 ]; then
  for d in runs/*/; do
    [ -d "$d" ] && names+=("$(basename "$d")")
  done
fi
for name in "${names[@]}"; do
  dir="runs/$name"
  [ -d "$dir" ] || { echo "skip $name (no dir)"; continue; }
  # Version sort: orders on the embedded step number wherever it sits in the
  # path (run names themselves contain underscores, so field-based sort keyed
  # on a fixed '_' field compared non-numeric keys as equal and fell back to
  # lexicographic order — ADVICE round-4).
  last=$(ls "$dir"/qmcjax_ckpt_*.npz 2>/dev/null | sort -V | tail -1)
  # Eval-only runs (e.g. forces, save_frequency=1e9) write traces but no
  # checkpoints — export the CSVs regardless instead of skipping the run.
  mkdir -p "artifacts/$name"
  if [ -z "$last" ]; then
    echo "note: $name has no checkpoints (csv-only export)"
  else
    cp -f "$last" "artifacts/$name/"
  fi
  # train.py REWRITES train_states.csv on restore-and-continue, so suffix the
  # export with the leg's starting step — successive exports of successive
  # legs then accumulate instead of clobbering the earlier trace (the bare
  # train_states.csv.gz name is kept for pre-suffix artifacts).
  #
  # ADVICE round-3 hardening: (a) a heartbeat tick in the post-restart window
  # (header only, no data row yet) must NOT export — 'start' would be empty
  # and the t0 default clobbered the real leg-0 trace with an empty gzip;
  # (b) never replace an existing t*.csv.gz with a SMALLER file (the trace
  # only grows within a leg); (c) the trainer appends concurrently, so strip
  # a truncated final row (field count != header's) before gzipping.
  if [ -f "$dir/train_states.csv" ]; then
    start=$(sed -n 2p "$dir/train_states.csv" | cut -d, -f1)
    if [ -z "$start" ]; then
      echo "skip $name csv (no data rows yet)"
    else
      dest="artifacts/$name/train_states.t${start}.csv.gz"
      tmp="${dest}.tmp"
      # A concurrent append shows up as a final line with no trailing
      # newline (possibly truncated mid-field, so NF alone can't catch it).
      { if [ -n "$(tail -c1 "$dir/train_states.csv")" ]; then
          head -n -1 "$dir/train_states.csv"
        else
          cat "$dir/train_states.csv"
        fi; } | awk -F, 'NR==1{n=NF} NF==n' | gzip -c > "$tmp"
      if [ -f "$dest" ] && \
         [ "$(stat -c%s "$tmp")" -lt "$(stat -c%s "$dest")" ]; then
        echo "skip $name csv (existing $dest is larger)"
        rm -f "$tmp"
      else
        mv -f "$tmp" "$dest"
      fi
    fi
  fi
  if [ -f "$dir/DMC_states.csv" ]; then
    # DMC restarts reset block numbering to 0 with a fresh CSV, so a new
    # export can legitimately hold FEWER rows than the artifact — that means
    # it is a NEW leg, not a shrunken trace. Rotate the old trace aside
    # (DMC_states.prevN.csv.gz) instead of clobbering it (a 07:54 export
    # this round destroyed the round-3 60-block C2 trace this way).
    dest="artifacts/$name/DMC_states.csv.gz"
    tmp="${dest}.tmp"
    gzip -c "$dir/DMC_states.csv" > "$tmp"
    if [ -f "$dest" ]; then
      new_rows=$(zcat "$tmp" | wc -l); old_rows=$(zcat "$dest" | wc -l)
      if [ "$new_rows" -lt "$old_rows" ]; then
        n=1
        while [ -f "artifacts/$name/DMC_states.prev${n}.csv.gz" ]; do
          n=$(( n + 1 ))
        done
        mv "$dest" "artifacts/$name/DMC_states.prev${n}.csv.gz"
        echo "rotated $name DMC trace (${old_rows} rows) to prev${n}"
      fi
    fi
    mv -f "$tmp" "$dest"
  fi
  [ -n "$last" ] && \
    echo "exported $name: $(basename "$last") ($(du -h "$last" | cut -f1))"
done
du -sh artifacts 2>/dev/null
