"""Job-submission script tests (reference scripts/sbatch_run.sh role).

Dry-run mode generates the job file without touching sbatch/gcloud, so the
launch wiring (the jax.distributed coordinator triple train.py consumes) is
testable anywhere.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(REPO, "scripts", "submit_run.sh")


def _submit(tmp_path, backend, extra_env=None, job="j1"):
    env = dict(os.environ, DRYRUN="1", BACKEND=backend,
               LOG_DIR=str(tmp_path / job), **(extra_env or {}))
    r = subprocess.run(
        ["bash", SUBMIT, job, "train.py", "--params", "configs/p.py"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return (tmp_path / job / f"job-{job}.sh").read_text()


def test_slurm_jobfile_wires_coordinator_triple(tmp_path):
    body = _submit(tmp_path, "slurm", {"NUM_HOSTS": "4", "TIME": "08:00:00"})
    assert "#SBATCH --nodes=4" in body
    assert "#SBATCH --time=08:00:00" in body
    assert "JAX_COORDINATOR_ADDRESS=" in body
    assert "JAX_NUM_PROCESSES=$SLURM_NNODES" in body
    # the per-task rank must be resolved inside the srun task: the inner
    # script is single-quoted so $SLURM_PROCID survives the batch prologue
    # (test_slurm_args_evaluated_exactly_once proves this behaviorally)
    assert "srun" in body
    assert "bash -c 'export JAX_PROCESS_ID=$SLURM_PROCID" in body
    assert "train.py --params configs/p.py" in body


def test_tpuvm_jobfile_one_process_per_host(tmp_path):
    body = _submit(
        tmp_path, "tpuvm",
        {"TPU_NAME": "v5e-pod", "ZONE": "us-central2-b", "NUM_HOSTS": "2"},
    )
    assert "JAX_NUM_PROCESSES=2" in body
    # rank comes from the TPU-VM metadata server and must hard-fail if the
    # lookup comes back empty (an empty JAX_PROCESS_ID would crash train.py
    # with a confusing int() error on every worker)
    assert "agent-worker-number" in body
    assert "JAX_PROCESS_ID=${WORKER_ID:?" in body
    # repo dir is configured, never derived from the scp'd file's location
    assert "cd $HOME/eventclip_tpu ||" in body
    assert "watchdog.sh" in body


def test_local_jobfile_runs_under_watchdog(tmp_path):
    body = _submit(tmp_path, "local")
    assert "watchdog.sh python train.py" in body
    assert f'cd "{tmp_path}"' in body


def test_tpuvm_requires_topology(tmp_path):
    env = dict(os.environ, DRYRUN="1", BACKEND="tpuvm",
               LOG_DIR=str(tmp_path / "x"))
    env.pop("TPU_NAME", None)
    env.pop("ZONE", None)
    r = subprocess.run(
        ["bash", SUBMIT, "x", "train.py"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert r.returncode != 0


def test_args_with_spaces_survive_the_jobfile(tmp_path):
    """Arguments are shell-quoted into the job file: a --prompt with spaces
    must reach the python process as ONE argv entry after the round trip."""
    env = dict(os.environ, DRYRUN="1", BACKEND="local",
               LOG_DIR=str(tmp_path / "q"))
    r = subprocess.run(
        ["bash", SUBMIT, "q", "train.py", "--prompt", "a photo of a {}"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    job = str(tmp_path / "q" / "job-q.sh")
    # execute the job file with a stub watchdog+python that dump argv
    bindir = tmp_path / "bin"
    bindir.mkdir()
    (bindir / "python").write_text(
        "#!/bin/bash\nfor a in \"$@\"; do echo \"ARG:$a\"; done\n"
    )
    (bindir / "python").chmod(0o755)
    scripts = tmp_path / "scripts"
    scripts.mkdir(exist_ok=True)
    wd = scripts / "watchdog.sh"
    wd.write_text('#!/bin/bash\nexec "$@"\n')
    wd.chmod(0o755)
    env2 = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
    r2 = subprocess.run(["bash", job], cwd=str(tmp_path), env=env2,
                        capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr
    assert "ARG:a photo of a {}" in r2.stdout


def test_slurm_args_evaluated_exactly_once(tmp_path):
    """The srun line passes the command as positionals into a single-quoted
    inner script, so %q-quoted args are parsed exactly once — dollar signs,
    quotes, and spaces survive; SLURM_PROCID resolves in the task shell."""
    env = dict(os.environ, DRYRUN="1", BACKEND="slurm",
               LOG_DIR=str(tmp_path / "s"))
    r = subprocess.run(
        ["bash", SUBMIT, "s", "train.py", "--note", 'cost $5 "x" `y`'],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    body = (tmp_path / "s" / "job-s.sh").read_text()
    line = next(l for l in body.splitlines() if l.startswith("srun"))
    # execute the launch line sans srun, with a stub python dumping argv
    bindir = tmp_path / "bin"
    bindir.mkdir()
    (bindir / "python").write_text(
        "#!/bin/bash\nfor a in \"$@\"; do echo \"ARG:$a\"; done\n"
        "echo \"RANK:$JAX_PROCESS_ID\"\n"
    )
    (bindir / "python").chmod(0o755)
    env2 = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}",
                SLURM_PROCID="3")
    r2 = subprocess.run(
        ["bash", "-c", line.replace("srun --kill-on-bad-exit=1 ", "")],
        env=env2, capture_output=True, text=True,
    )
    assert r2.returncode == 0, r2.stderr
    assert 'ARG:cost $5 "x" `y`' in r2.stdout
    assert "RANK:3" in r2.stdout


def test_no_extra_args_adds_no_empty_argv(tmp_path):
    """printf %q with zero args would emit a spurious '' argument."""
    env = dict(os.environ, DRYRUN="1", BACKEND="local",
               LOG_DIR=str(tmp_path / "n"))
    r = subprocess.run(
        ["bash", SUBMIT, "n", "train.py"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    body = (tmp_path / "n" / "job-n.sh").read_text()
    assert "python train.py ''" not in body
    assert "python train.py\n" in body


def test_watchdog_retries_until_success(tmp_path):
    """The retry watchdog (reference resubmit_failed_job.sh role) must
    relaunch a failing command and stop as soon as it exits cleanly."""
    marker = tmp_path / "attempts"
    script = tmp_path / "flaky.sh"
    script.write_text(
        "#!/bin/bash\n"
        f"echo x >> {marker}\n"
        f"[ $(wc -l < {marker}) -ge 3 ] && exit 0\n"
        "exit 1\n"
    )
    script.chmod(0o755)
    env = dict(os.environ, MAX_RETRIES="5", SLEEP_SECS="0")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "watchdog.sh"), str(script)],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert marker.read_text().count("x") == 3


def test_watchdog_gives_up_after_max_retries(tmp_path):
    env = dict(os.environ, MAX_RETRIES="2", SLEEP_SECS="0")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "watchdog.sh"), "false"],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 1
    assert "giving up" in r.stdout


def _slurm_stub_env(tmp_path, states_script):
    """PATH-prefix stub scheduler: `sbatch` logs each submit and prints a
    fresh job id; `sacct` replays the given state sequence (one per poll)."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    (bindir / "sbatch").write_text(
        "#!/bin/bash\n"
        f"echo submit >> {tmp_path}/sbatch.log\n"
        f"echo $(( $(wc -l < {tmp_path}/sbatch.log) + 100 ))\n"
    )
    (bindir / "sacct").write_text(
        "#!/bin/bash\n"
        f"n=$(cat {tmp_path}/poll 2>/dev/null || echo 0)\n"
        f"echo $((n + 1)) > {tmp_path}/poll\n"
        + states_script
    )
    for f in ("sbatch", "sacct"):
        os.chmod(str(bindir / f), 0o755)
    return dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}",
                BACKEND="slurm", POLL_SECS="1")


def _run_slurm_submit(tmp_path, env, job="wd"):
    env = dict(env, LOG_DIR=str(tmp_path / job))
    r = subprocess.run(
        ["bash", SUBMIT, job, "train.py", "--params", "c.py"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return tmp_path / job / "run.log"


def test_slurm_watchdog_resubmits_then_stops(tmp_path):
    """FAILED -> resubmit (second sbatch call) -> COMPLETED -> exit."""
    import time

    env = _slurm_stub_env(
        tmp_path,
        'case $n in 0) echo " FAILED ";; *) echo " COMPLETED ";; esac\n',
    )
    log = _run_slurm_submit(tmp_path, env)
    deadline = time.time() + 30
    while time.time() < deadline:
        if log.exists() and "resubmitting" in log.read_text():
            subs = (tmp_path / "sbatch.log").read_text().count("submit")
            if subs >= 2:
                return
        time.sleep(0.5)
    raise AssertionError(
        f"watchdog never resubmitted: log={log.read_text() if log.exists() else '<absent>'}, "
        f"sbatch calls={(tmp_path / 'sbatch.log').read_text()}"
    )


def test_slurm_watchdog_bounded_when_accounting_absent(tmp_path):
    """Empty sacct output (no accounting) must give up loudly after
    MAX_UNKNOWN_POLLS instead of spinning forever."""
    import time

    env = _slurm_stub_env(tmp_path, "echo ''\n")
    env["MAX_UNKNOWN_POLLS"] = "2"
    log = _run_slurm_submit(tmp_path, env, job="wd2")
    deadline = time.time() + 30
    while time.time() < deadline:
        if log.exists() and "giving up" in log.read_text():
            return
        time.sleep(0.5)
    raise AssertionError(
        f"watchdog never gave up: {log.read_text() if log.exists() else '<absent>'}"
    )


@pytest.mark.slow  # ~22 grid points x one interpreter spawn each (~50 s)
def test_sweep_helpers_enumerate_the_reference_grids(tmp_path):
    """train_all_shots / test_all_arch / test_all_subset must invoke the
    wrapped command once per grid point with the right flag (reference
    scripts of the same names)."""
    import sys

    rec = tmp_path / "calls.log"
    stub = (f"{sys.executable} -c \"import sys;"
            f"open(r'{rec}','a').write(' '.join(sys.argv[1:]) + chr(10))\"")

    def calls(script, *extra):
        rec.write_text("")
        r = subprocess.run(
            ["bash", os.path.join(REPO, "scripts", script), stub, *extra],
            capture_output=True, text=True, cwd=str(tmp_path),
        )
        assert r.returncode == 0, r.stderr
        return rec.read_text().strip().splitlines()

    shots = calls("train_all_shots.sh")
    assert [c.split("--num_shots ")[1] for c in shots] == \
        ["20", "10", "5", "3", "1"]  # the paper grid, reference order

    archs = calls("test_all_arch.sh")
    got = [c.split("--arch ")[1].split(" ")[0] for c in archs]
    assert "ViT-L/14" in got and "RN50" in got and len(got) == 8
    # RN50x64 gets the reduced batch like the reference
    rn64 = [c for c in archs if "RN50x64" in c][0]
    assert "--bs 32" in rn64

    subsets = calls("test_all_subset.sh")
    assert [c.split("--subset ")[1] for c in subsets] == \
        ["-1"] + [str(i) for i in range(1, 10)]  # plain val + 9 variants


def test_convert_checkpoint_cli(tmp_path):
    """scripts/convert_checkpoint.py end-to-end: a reference-shaped .pth
    (FS adapter + prompt leaf, nerv 'state_dict' wrapper) converts to a
    trainable-leaf npz with the framework's tree paths. The numeric
    parity of the mapping is tests/test_convert_method.py's job — this
    pins the CLI wiring (unwrap, save format, usage error)."""
    import numpy as np
    import torch

    enc = torch.nn.TransformerEncoderLayer(
        16, 2, 64, norm_first=True, batch_first=True)

    class Ref(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.transformer_encoder = torch.nn.TransformerEncoder(enc, 2)
            self.in_proj = torch.nn.Linear(32, 16)
            self.out_proj = torch.nn.Linear(16, 32)

    sd = {f"adapter.{k}": v for k, v in Ref().state_dict().items()}
    sd["text_feats"] = torch.randn(3, 32)
    src = tmp_path / "best.pth"
    dst = tmp_path / "best.npz"
    torch.save({"state_dict": sd}, src)

    script = os.path.join(REPO, "scripts", "convert_checkpoint.py")
    r = subprocess.run(["python", script, str(src), str(dst)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with np.load(dst) as z:
        keys = set(z.files)
        assert "text_feats" in keys
        assert "adapter/in_proj/w" in keys
        assert z["adapter/blocks/attn/wqkv"].shape == (2, 48, 16)
    assert "adapter/blocks/attn/wqkv" in r.stdout  # the summary listing

    # wrong arity prints usage and exits non-zero
    r = subprocess.run(["python", script], capture_output=True, text=True)
    assert r.returncode == 1 and "convert_checkpoint" in r.stdout


@pytest.mark.e2e
def test_parity_check_harness_synthetic(tmp_path):
    """scripts/parity_check.py end to end on a synthetic tiny .pt: the
    one-command harness must convert, verify tower parity vs the torch
    oracle, skip the asset-gated stages loudly, evaluate a
    reference-shaped method checkpoint, train+eval(+roundtrip) a K-shot
    model from the converted weights, and emit PARITY_RESULT.json — so
    the day real assets land NO leg of the parity matrix has rotted."""
    import json
    import sys

    import torch

    from .test_e2e import make_tree
    from .torch_oracle import random_clip_state_dict

    tree = make_tree(str(tmp_path / "tree"))
    ckpt = tmp_path / "tiny_clip.pt"
    torch.save(random_clip_state_dict(np.random.default_rng(7)), ckpt)

    # a reference-shaped FS method checkpoint (nerv 'state_dict' wrapper,
    # reference models/clip_cls.py:208-219): adapter dims from
    # configs/debug/fsclip_tiny_params.py (d_model 16, 2 heads, 2 layers),
    # embed dim 48 from the synthetic tower, 3 classes from make_tree
    enc = torch.nn.TransformerEncoderLayer(
        16, 2, 64, norm_first=True, batch_first=True)

    class RefAdapter(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.transformer_encoder = torch.nn.TransformerEncoder(enc, 2)
            self.in_proj = torch.nn.Linear(48, 16)
            self.out_proj = torch.nn.Linear(16, 48)

    msd = {f"adapter.{k}": v for k, v in RefAdapter().state_dict().items()}
    msd["text_feats"] = torch.randn(3, 48)
    method_pth = tmp_path / "method_best.pth"
    torch.save({"state_dict": msd}, method_pth)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1-device CPU: the tiny FS train run
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_check.py"),
         "--clip_ckpt", str(ckpt), "--data_root", tree, "--bs", "8",
         "--method_ckpt", str(method_pth),
         "--method_params", "configs/debug/fsclip_tiny_params.py",
         "--fs_shots", "2", "--fs_epochs", "1", "--fs_roundtrip",
         "--fs_params", "configs/debug/fsclip_tiny_params.py",
         "--workdir", str(tmp_path / "fswork"),
         "--cpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    with open(tmp_path / "PARITY_RESULT.json") as f:
        res = json.load(f)
    assert res["ok"] is True
    assert res["tower_parity"]["ok"] is True
    assert res["tower_parity"]["image_max_abs_diff"] < 2e-3
    assert os.path.exists(res["converted_npz"])
    # asset-gated stages skip with notes, never silently pass
    assert res["tokenizer"]["ok"] is None and "BPE" in res["tokenizer"]["note"]
    assert res["zero_shot"]["ok"] is None

    # the FS/FT leg: a reference .pth evaluated through the same
    # evaluate() as test.py, on the checkpoint's inferred tower; the
    # prompt-tuned leaf comes from the checkpoint (random_text_init notes
    # that only the overwritten INIT was random, BPE being absent)
    me = res["method_evals"][0]
    assert me["ok"] is True, me
    assert me["arch"] == res["arch"]
    assert me["random_text_init"] is True
    assert 0.0 <= me["probs_top1"] <= 1.0

    # the train-from-converted-weights leg, incl. the .pth roundtrip:
    # export to the reference key space must re-evaluate bit-identically
    fs = res["few_shot"]
    assert fs["ok"] is True, fs
    assert os.path.exists(fs["weight"])
    assert fs["params"].endswith("_ckptarch.py")  # derived-arch config
    assert fs["roundtrip"]["bit_equal"] is True
    assert fs["roundtrip"]["probs_top1"] == fs["probs_top1"]
