#!/bin/bash
# Wait for a steal-calm window (col-9 delta < $1 ticks over 15 s, up to
# $2 attempts), then exec the rest of the args. Prints probe readings.
thr=${1:-8}; tries=${2:-60}; shift 2
for i in $(seq "$tries"); do
  s0=$(awk 'NR==1{print $9}' /proc/stat)
  sleep 15
  s1=$(awk 'NR==1{print $9}' /proc/stat)
  d=$((s1 - s0))
  echo "probe $i: steal=$d/15s" >&2
  if [ "$d" -lt "$thr" ]; then
    echo "calm at probe $i (steal=$d), running: $*" >&2
    exec "$@"
  fi
done
echo "no calm window after $tries probes; running anyway: $*" >&2
exec "$@"
