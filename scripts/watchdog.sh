#!/bin/bash
# Failure-detection watchdog (reference scripts/resubmit_failed_job.sh,
# Slurm-free): relaunches the given command if it exits non-zero, up to
# MAX_RETRIES times. Training resumes from checkpoint/<exp>/models/resume.pkl
# automatically, so a relaunch continues the same run (preemption-safe
# resume, reference train.py:51-63).
#
#   MAX_RETRIES=10 ./scripts/watchdog.sh python train.py --params ...
MAX_RETRIES=${MAX_RETRIES:-10}
SLEEP_SECS=${SLEEP_SECS:-60}

for i in $(seq 0 $MAX_RETRIES)
do
    "$@"
    code=$?
    if [ $code -eq 0 ]; then
        echo "[watchdog] command finished cleanly"
        exit 0
    fi
    if [ "$i" -ge "$MAX_RETRIES" ]; then
        # last attempt: no phantom "retry 11/10" announcement, no idle sleep
        break
    fi
    echo "[watchdog] exit code $code; retry $((i+1))/$MAX_RETRIES in ${SLEEP_SECS}s"
    sleep $SLEEP_SECS
done
echo "[watchdog] giving up after $MAX_RETRIES retries (last exit code $code)"
exit 1
