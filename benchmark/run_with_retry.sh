#!/bin/bash
# Runs a python benchmark; if its log doesn't grow within 150s of start
# (axon tunnel init hang), kills and retries (up to 3 attempts).
LOG=$1; shift
for attempt in 1 2 3; do
  rm -f "$LOG"
  python -u "$@" > "$LOG" 2>&1 &
  PID=$!
  sleep 150
  if ! kill -0 $PID 2>/dev/null; then break; fi          # finished already
  if grep -qv WARNING "$LOG" 2>/dev/null && [ $(grep -cv WARNING "$LOG") -gt 0 ]; then
    wait $PID; break                                      # making progress
  fi
  echo "attempt $attempt hung; retrying" >> "$LOG.retries"
  kill $PID 2>/dev/null; sleep 20
done
