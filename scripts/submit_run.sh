#!/bin/bash
# TPU-native job submission (the reference's scripts/sbatch_run.sh role:
# generate a job file from env vars, wire the distributed launch, submit,
# then spawn the retry watchdog).
#
# Backends (BACKEND=...):
#   slurm  - writes a .slrm file and submits with sbatch (TPU partitions)
#   tpuvm  - runs the job on every worker of a Cloud TPU pod slice via
#            `gcloud compute tpus tpu-vm ssh --worker=all`, exporting the
#            JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
#            triple that train.py consumes for jax.distributed init
#   local  - nohup under scripts/watchdog.sh on this machine (default)
#
# Multi-host wiring: unlike the reference (torch.distributed.launch, one
# process per GPU), a TPU slice runs ONE process per host and jax.distributed
# handles the rest — so the job file exports the coordinator triple instead
# of spawning per-device workers.
#
# Usage:
#   BACKEND=local  ./scripts/submit_run.sh myjob train.py --params configs/...
#   BACKEND=slurm PARTITION=tpu QOS=normal TIME=08:00:00 \
#     ./scripts/submit_run.sh myjob train.py --params configs/...
#   BACKEND=tpuvm TPU_NAME=v5e-pod ZONE=us-central2-b NUM_HOSTS=4 \
#     ./scripts/submit_run.sh myjob train.py --params configs/...
#   DRYRUN=1 generates the job file without submitting (used by the tests).
set -u

BACKEND=${BACKEND:-local}
DRYRUN=${DRYRUN:-0}
JOB_NAME=${1:?usage: submit_run.sh JOB_NAME SCRIPT [args...]}
PY_FILE=${2:?missing python entry point}
# shell-quote each argument so spaces/quotes survive the job-file round trip
# (printf with no args still runs its format once, which would inject a
# spurious '' argv entry — hence the guard)
if [ $# -gt 2 ]; then PY_ARGS=$(printf ' %q' "${@:3}"); else PY_ARGS=""; fi

# resources (slurm backend)
PARTITION=${PARTITION:-tpu}
CPUS=${CPUS:-16}
MEM_GB=${MEM_GB:-64}
QOS=${QOS:-normal}
TIME=${TIME:-16:00:00}
# topology (tpuvm backend)
TPU_NAME=${TPU_NAME:-}
ZONE=${ZONE:-}
NUM_HOSTS=${NUM_HOSTS:-1}
COORD_PORT=${COORD_PORT:-8476}

SAFE_NAME=${JOB_NAME//\//_}
REPO_ROOT=$(pwd)
LOG_DIR=${LOG_DIR:-checkpoint/$SAFE_NAME}
mkdir -p "$LOG_DIR"
JOB_FILE="$LOG_DIR/job-$SAFE_NAME.sh"
LOG_FILE="$LOG_DIR/run.log"

# every backend runs this inner command; resume.pkl makes retries continue
# the same run (run_id.txt keeps the metric curve identity stable too)
INNER="python $PY_FILE$PY_ARGS"

case "$BACKEND" in
  slurm)
    cat > "$JOB_FILE" <<EOF
#!/bin/bash
#SBATCH --job-name=$SAFE_NAME
#SBATCH --partition=$PARTITION
#SBATCH --qos=$QOS
#SBATCH --time=$TIME
#SBATCH --cpus-per-task=$CPUS
#SBATCH --mem=${MEM_GB}G
#SBATCH --nodes=$NUM_HOSTS
#SBATCH --ntasks-per-node=1
#SBATCH --output=$LOG_FILE
#SBATCH --error=$LOG_FILE
#SBATCH --open-mode=append
# one process per TPU host; jax.distributed wires the slice from this triple
export JAX_COORDINATOR_ADDRESS=\$(scontrol show hostnames "\$SLURM_JOB_NODELIST" | head -n1):$COORD_PORT
export JAX_NUM_PROCESSES=\$SLURM_NNODES
# SLURM_PROCID is only correct inside the srun task, so the single-quoted
# inner script reads it per task; the command arrives as positionals, parsed
# exactly once by this job file's shell (no double evaluation of quoting)
srun --kill-on-bad-exit=1 bash -c 'export JAX_PROCESS_ID=\$SLURM_PROCID; exec "\$@"' -- $INNER
EOF
    chmod +x "$JOB_FILE"
    echo "[submit] wrote $JOB_FILE"
    if [[ "$DRYRUN" == "1" ]]; then exit 0; fi
    job_id=$(sbatch --parsable "$JOB_FILE") || { echo "[submit] sbatch failed"; exit 1; }
    echo "[submit] slurm job $job_id"
    # requeue-on-failure watchdog (reference resubmit_failed_job.sh role);
    # only the INITIAL id is baked in — after a resubmission the loop polls
    # the replacement job, not the dead original
    nohup bash -c "
      cur=$job_id
      unknown=0
      while true; do
        sleep \${POLL_SECS:-600}
        st=\$(sacct -j \$cur --format=State --noheader -X 2>/dev/null | head -n1 | tr -d ' ')
        case \"\$st\" in
          FAILED*|OUT_OF_MEMORY*|TIMEOUT*|NODE_FAIL*|PREEMPTED*)
            unknown=0
            echo \"[watchdog] job \$cur \$st -> resubmitting\" >> '$LOG_FILE'
            # keep the old id on a failed sbatch: its state stays FAILED,
            # so the next poll retries the resubmission instead of going
            # blind on an empty id
            if new=\$(sbatch --parsable '$JOB_FILE') && [ -n \"\$new\" ]; then
              cur=\$new
            else
              echo \"[watchdog] sbatch failed; retrying next poll\" >> '$LOG_FILE'
            fi;;
          COMPLETED*|CANCELLED*) exit 0;;
          '')
            # sacct empty: accounting down or unavailable on this cluster.
            # Bounded patience, then exit loudly rather than spin forever.
            unknown=\$((unknown + 1))
            if [ \$unknown -ge \${MAX_UNKNOWN_POLLS:-12} ]; then
              echo \"[watchdog] no job state from sacct after \$unknown polls; giving up (is accounting enabled?)\" >> '$LOG_FILE'
              exit 1
            fi;;
          *) unknown=0;;
        esac
      done" >/dev/null 2>&1 &
    ;;
  tpuvm)
    [[ -n "$TPU_NAME" && -n "$ZONE" ]] || { echo "[submit] tpuvm needs TPU_NAME and ZONE"; exit 1; }
    REMOTE_DIR=${REMOTE_DIR:-\$HOME/eventclip_tpu}
    cat > "$JOB_FILE" <<EOF
#!/bin/bash
# runs on every worker of the pod slice (scp'd to /tmp, so the repo dir is
# configured, not derived from \$0)
cd $REMOTE_DIR || { echo "[job] repo not found at $REMOTE_DIR (set REMOTE_DIR at submit time)"; exit 1; }
# per-worker rank from the TPU-VM metadata server; the coordinator is
# worker 0's hostname (Cloud TPU VM hostnames end in -w-<rank>)
WORKER_ID=\$(curl -sf -H 'Metadata-Flavor: Google' \\
  'http://metadata.google.internal/computeMetadata/v1/instance/attributes/agent-worker-number')
export JAX_COORDINATOR_ADDRESS=\${COORDINATOR:-\${HOSTNAME%-w-*}-w-0}:$COORD_PORT
export JAX_NUM_PROCESSES=$NUM_HOSTS
export JAX_PROCESS_ID=\${WORKER_ID:?metadata lookup failed - set WORKER_ID}
MAX_RETRIES=\${MAX_RETRIES:-10} ./scripts/watchdog.sh $INNER
EOF
    chmod +x "$JOB_FILE"
    echo "[submit] wrote $JOB_FILE"
    if [[ "$DRYRUN" == "1" ]]; then exit 0; fi
    gcloud compute tpus tpu-vm scp "$JOB_FILE" "$TPU_NAME:/tmp/$SAFE_NAME.sh" \
      --zone "$ZONE" --worker=all
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
      --command "nohup bash /tmp/$SAFE_NAME.sh >> /tmp/$SAFE_NAME.log 2>&1 &"
    echo "[submit] launched on $NUM_HOSTS worker(s) of $TPU_NAME"
    ;;
  local)
    cat > "$JOB_FILE" <<EOF
#!/bin/bash
cd "$REPO_ROOT"
MAX_RETRIES=\${MAX_RETRIES:-10} ./scripts/watchdog.sh $INNER
EOF
    chmod +x "$JOB_FILE"
    echo "[submit] wrote $JOB_FILE"
    if [[ "$DRYRUN" == "1" ]]; then exit 0; fi
    nohup "$JOB_FILE" >> "$LOG_FILE" 2>&1 &
    echo "[submit] local pid $! (log: $LOG_FILE)"
    ;;
  *)
    echo "[submit] unknown BACKEND=$BACKEND (slurm|tpuvm|local)"; exit 1;;
esac
