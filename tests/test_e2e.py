"""End-to-end CLI smoke tests: train -> checkpoint -> test -> gen_data ->
re-train on pseudo labels, on a tiny synthetic N-Caltech tree (CPU).

This is the system-level guard the reference lacks entirely (SURVEY.md §4);
every layer (datasets, loader, on-device pipeline, model, optimizer,
checkpointing, CLIs) runs through its real entry point.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_tree(root, classes=("airplanes", "ant", "brain"), rng=None):
    rng = rng or np.random.default_rng(7)
    for c in classes:
        for split, k in (("training", 6), ("testing", 4)):
            d = os.path.join(root, split, c)
            os.makedirs(d, exist_ok=True)
            for i in range(k):
                n = 2500 + int(rng.integers(0, 1000))
                ev = np.stack(
                    [
                        rng.integers(0, 240, n),
                        rng.integers(0, 180, n),
                        np.sort(rng.uniform(0, 0.3, n)),
                        rng.choice([-1.0, 1.0], n),
                    ],
                    axis=1,
                )
                np.save(os.path.join(d, f"{c}_{i}.npy"), ev)
    return root


def make_nin_tree(root, n_classes=6, rng=None):
    """Synthetic N-ImageNet-shaped tree: wnid dirs of structured npz events
    (x/y uint16, t int64 µs, p uint8 0/1 — datasets.py::load_event_npz), a
    val split, and one robustness variant dir (extracted_val_mode_1)."""
    rng = rng or np.random.default_rng(13)
    wnids = []
    asset = os.path.join(REPO, "eventclip_tpu", "assets",
                         "CLIP-IN_ClassNames.txt")
    with open(asset) as f:
        for ln in f:
            wnids.append(ln.split(" ")[0])
            if len(wnids) == n_classes:
                break
    dtype = np.dtype([("x", "<u2"), ("y", "<u2"), ("t", "<i8"), ("p", "u1")])
    for wnid in wnids:
        for split, k in (("extracted_train", 3), ("extracted_val", 2),
                         ("extracted_val_mode_1", 2)):
            d = os.path.join(root, split, wnid)
            os.makedirs(d, exist_ok=True)
            for i in range(k):
                n = 1500 + int(rng.integers(0, 500))
                ev = np.zeros(n, dtype=dtype)
                ev["x"] = rng.integers(0, 640, n)
                ev["y"] = rng.integers(0, 480, n)
                ev["t"] = np.sort(rng.integers(0, 50000, n))  # µs
                ev["p"] = rng.integers(0, 2, n)
                np.savez(os.path.join(d, f"{wnid}_{i}.npz"), event_data=ev)
    return root


def make_separable_tree(root, rng=None):
    """3 classes distinguishable by event *shape*.

    Each sample is a solid filled region whose pixels receive an (almost)
    equal number of events, so the reference rasterization semantics keep
    the pattern intact: equal counts normalize to full intensity (the
    normalize-by-max step washes out Poisson-sparse patterns), the active
    area is >1% of the frame (hot-pixel removal clips concentrated
    patterns, vis.py:17-24), the shapes are location-free (center_events
    re-centers the bounding box) and mirror-safe (hflip augmentation).
    """
    rng = rng or np.random.default_rng(11)

    def block_pts(x0, y0, w, h):
        xs, ys = np.meshgrid(np.arange(x0, x0 + w), np.arange(y0, y0 + h))
        return np.stack([xs.ravel(), ys.ravel()], axis=1)

    def sample(cls):
        n = 3000
        j = lambda a, b: int(rng.integers(a, b))
        if cls == "block":  # one solid 32x32 square
            pts = block_pts(j(60, 150), j(40, 110), 32, 32)
        elif cls == "twins":  # two 24x24 squares, vertically separated
            x, y = j(70, 140), j(20, 50)
            pts = np.concatenate([
                block_pts(x, y, 24, 24),
                block_pts(x + j(-10, 10), y + 90, 24, 24),
            ])
        else:  # bar: thin tall 12x88 bar
            pts = block_pts(j(70, 150), j(30, 60), 12, 88)
        idx = np.arange(n) % len(pts)  # equal counts -> solid after normalize
        pts = pts[rng.permutation(len(pts))]
        x, y = pts[idx, 0].astype(float), pts[idx, 1].astype(float)
        order = rng.permutation(n)
        t = np.sort(rng.uniform(0, 0.3, n))
        p = rng.choice([-1.0, 1.0], n)
        return np.stack([x[order], y[order], t, p], axis=1)

    for c in ("block", "twins", "bar"):
        for split, k in (("training", 16), ("testing", 5)):
            d = os.path.join(root, split, c)
            os.makedirs(d, exist_ok=True)
            for i in range(k):
                np.save(os.path.join(d, f"{c}_{i}.npy"), sample(c))
    return root


# fine-tunes the tiny debug ResNet tower: a frozen RANDOM tower cannot
# separate anything (feature collapse - all inputs map to nearly the same
# vector), and a tiny random-init ViT plateaus at the class prior (uniform
# attention averages spatial structure away), so the FT regime with the
# conv tower is the one tiny setup whose accuracy reflects real learning.
FT_LEARN_CONFIG = """
from eventclip_tpu.utils.config import Params


class EventCLIPParams(Params):
    gpus = 1
    max_epochs = 20
    save_interval = 10
    eval_interval = 1
    optimizer = 'Adam'
    lr = 1e-3
    clip_lr = 1e-3
    weight_decay = 0.0
    warmup_steps_pct = 0.05
    img_aug = False
    bf16 = False  # random debug weights need f32 (see trainer dtype note)

    dataset = 'n_caltech'
    data_root = './unused'
    num_shots = None
    repeat_data = True
    train_batch_size = 8
    val_batch_size = 8
    num_workers = 2

    quantize_args = dict(
        max_imgs=2, N=1000, split_method='event_count',
        convert_method='event_histogram', grayscale=True,
        count_non_zero=False, background_mask=True,
    )

    model = 'FTCLIP'
    clip_dict = dict(
        arch='RN-T@32',
        prompt='a point cloud image of a {}',
        agg_func='mean',
        logit_scale=10.0,
    )
    adapter_dict = dict(adapter_type='text-identity')
    loss_dict = dict(use_logits_loss=True, use_probs_loss=False)
    ce_loss_w = 1.
    ckp_monitor = 'val/probs_acc'
    ckp_monitor_type = 'max'
"""


def run(args, single_device=False, **kw):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the CLIs force CPU via --cpu
    if single_device:
        # drop conftest's 8-virtual-device flag: the fake mesh multiplies
        # per-step work ~12x on one real CPU, which matters for the
        # many-epoch learning test
        env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, capture_output=True,
        text=True, timeout=1200, **kw,
    )


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_tree(str(tmp_path_factory.mktemp("synth_nc")))


@pytest.fixture(scope="module")
def ckpt_base(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ckpt"))


@pytest.mark.e2e
def test_train_test_cycle(tree, ckpt_base):
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base,
        "--max_epochs", "1", "--san_check_val_step", "1", "--profile", "1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[val]" in r.stdout
    mdir = os.path.join(ckpt_base, "fsclip_tiny_params", "models")
    assert os.path.exists(os.path.join(mdir, "best.npz"))
    assert os.path.exists(os.path.join(mdir, "resume.pkl"))
    # --profile N captured a jax.profiler trace (the observability contract;
    # the reference has no profiling at all)
    pdir = os.path.join(ckpt_base, "fsclip_tiny_params", "profile")
    traces = [os.path.join(dp, f) for dp, _, fs in os.walk(pdir) for f in fs]
    assert traces, f"no profiler trace written under {pdir}"
    # metrics JSONL written
    with open(os.path.join(ckpt_base, "fsclip_tiny_params",
                           "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any(rec["split"] == "train" for rec in recs)
    assert any(rec["split"] == "val" for rec in recs)

    r = run([
        "test.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu",
        "--weight", os.path.join(mdir, "best.npz"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy@1 (probs)" in r.stdout

    # fast inference path: int8 tower + token pruning through the same CLI
    # contract (tiny tower: 4x4 grid, keep 8 of 16 patches)
    r = run([
        "test.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--int8", "--prune_tokens", "8",
        "--weight", os.path.join(mdir, "best.npz"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy@1 (probs)" in r.stdout

    # calibrated static activation scales ride the same flag set
    r = run([
        "test.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--int8", "--int8_calib", "1",
        "--weight", os.path.join(mdir, "best.npz"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy@1 (probs)" in r.stdout

    # warm-start training from a checkpoint (reference
    # method.fit(resume_from=args.weight), train.py:94): fresh exp dir,
    # weights seeded from the previous run's best
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base + "-warm",
        "--max_epochs", "1", "--san_check_val_step", "0",
        "--weight", os.path.join(mdir, "best.npz"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"Loaded weights from {os.path.join(mdir, 'best.npz')}" in r.stdout
    assert os.path.exists(os.path.join(ckpt_base + "-warm",
                                       "fsclip_tiny_params", "models",
                                       "best.npz"))


@pytest.mark.e2e
@pytest.mark.slow  # ~77 s on the 1-core CI host
def test_cli_tensor_parallel_train_and_eval(tree, ckpt_base):
    """--n_model 2 through the CLIs: a 4x2 ('data','model') mesh trains and
    the produced checkpoint evaluates under the same TP layout (the
    flag existed but no test ever drove TP through train.py/test.py)."""
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base + "-tp",
        "--max_epochs", "1", "--san_check_val_step", "0", "--n_model", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "data=4 model=2" in r.stdout
    mdir = os.path.join(ckpt_base + "-tp", "fsclip_tiny_params", "models")
    assert os.path.exists(os.path.join(mdir, "best.npz"))

    r = run([
        "test.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--n_model", "2",
        "--weight", os.path.join(mdir, "best.npz"),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy@1 (probs)" in r.stdout


@pytest.mark.e2e
def test_train_shots_sweep_averages_dups(tree, ckpt_base):
    """--train_shots discovers `<cfg>[-dupX]-<K>shot/models` checkpoint dirs,
    averages accuracies over the dups, and prints the LaTeX-ready row
    (reference test.py:137-186). Runs after test_train_test_cycle so a real
    trained checkpoint exists to clone into the sweep layout."""
    import shutil

    src = os.path.join(ckpt_base, "fsclip_tiny_params")
    if not os.path.exists(os.path.join(src, "models")):
        pytest.skip("train cycle has not produced a checkpoint")
    for dup in ("fsclip_tiny_params-2shot", "fsclip_tiny_params-dup1-2shot",
                "fsclip_tiny_params-1shot"):
        dst = os.path.join(ckpt_base, dup)
        if not os.path.exists(dst):
            shutil.copytree(src, dst)
    r = run([
        "test.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu",
        "--ckpt_base", ckpt_base, "--train_shots", "2", "1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mean over 2 duplicate runs" in r.stdout  # 2-shot: base + dup1
    assert "Mean over 1 duplicate runs" in r.stdout  # 1-shot: base only
    assert "&" in r.stdout  # LaTeX row joins the per-shot accuracies


@pytest.mark.e2e
@pytest.mark.slow  # ~70 s on the 1-core CI host
def test_preemption_resume_continues_same_run(tree, ckpt_base):
    """Relaunching into the same ckpt dir must restore the full state from
    resume.pkl, train only the REMAINING epochs, and keep the metric-curve
    identity (one run_id across both processes) — the reference's Slurm
    requeue contract (train.py:51-82). Runs after test_train_test_cycle,
    whose 1-epoch run left resume.pkl at epoch 1."""
    exp = os.path.join(ckpt_base, "fsclip_tiny_params")
    if not os.path.exists(os.path.join(exp, "models", "resume.pkl")):
        pytest.skip("train cycle has not produced a resume file")
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base,
        "--max_epochs", "2", "--san_check_val_step", "0",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Resumed full state from epoch 1" in r.stdout
    with open(os.path.join(exp, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    train_epochs = [rec["epoch"] for rec in recs if rec["split"] == "train"]
    assert train_epochs == [0, 1]  # epoch 0 from run 1, only epoch 1 here
    run_ids = {rec["run_id"] for rec in recs if "run_id" in rec}
    assert len(run_ids) == 1, run_ids  # same curve identity across requeue


@pytest.mark.e2e
def test_serve_predictor_with_trained_checkpoint(tree, ckpt_base):
    """The serving API must load a CLI-trained checkpoint and classify raw
    event files from disk (the deployment path: train with train.py, serve
    with serve.Predictor). Runs after test_train_test_cycle."""
    best = os.path.join(ckpt_base, "fsclip_tiny_params", "models", "best.npz")
    if not os.path.exists(best):
        pytest.skip("train cycle has not produced a checkpoint")
    import glob

    import jax

    jax.config.update("jax_platforms", "cpu")

    from eventclip_tpu.serve import Predictor
    from eventclip_tpu.utils.config import load_params

    params = load_params("configs/debug/fsclip_tiny_params.py")
    pred = Predictor(params, class_names=["airplanes", "ant", "brain"],
                     weight=best, smoke=True, batch_size=4)
    files = sorted(glob.glob(os.path.join(tree, "testing", "*", "*.npy")))[:5]
    out = pred.predict([np.load(f) for f in files])
    assert out["probs"].shape == (5, 3)
    assert all(n in ("airplanes", "ant", "brain") for n in out["names"])


@pytest.mark.e2e
def test_zs_only_overrides_rejected_for_trainable_models(tree, ckpt_base):
    """--arch/--prompt are zero-shot-only overrides (reference test.py
    asserts, :116-124): using them with a trained FSCLIP checkpoint must
    fail loudly, not silently evaluate a different tower."""
    mdir = os.path.join(ckpt_base, "fsclip_tiny_params", "models")
    if not os.path.exists(os.path.join(mdir, "best.npz")):
        pytest.skip("train cycle has not produced a checkpoint")
    r = run([
        "test.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu",
        "--weight", os.path.join(mdir, "best.npz"), "--arch", "ViT-B/32",
    ])
    assert r.returncode != 0
    assert "zero-shot" in (r.stderr + r.stdout)


@pytest.mark.e2e
def test_cli_overrides_rename_experiment(tree, tmp_path):
    """--N (thousands of events/window) and --num_shots must mutate the
    config AND suffix the experiment dir the reference way
    (`<cfg>-N_<k>-<s>shot`, reference train.py:120-127) — the sweep
    discovery in test.py depends on this naming."""
    ckpt_base = str(tmp_path / "ck")
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base,
        "--max_epochs", "1", "--san_check_val_step", "0",
        "--N", "2", "--num_shots", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    exp = os.path.join(ckpt_base, "fsclip_tiny_params-N_2-2shot")
    assert os.path.exists(os.path.join(exp, "models")), os.listdir(ckpt_base)


@pytest.mark.e2e
@pytest.mark.slow  # ~64 s on the 1-core CI host
def test_dup_run_trains_seed_duplicates(tree, tmp_path):
    """scripts/dup_run.sh copies the params file as -dupN.py and trains each
    with a distinct seed (reference dup_run_sbatch.sh); the resulting ckpt
    dirs follow the naming test.py's sweep discovers."""
    import shutil
    import subprocess

    cfg = tmp_path / "fsclip_tiny_params.py"
    shutil.copy(os.path.join(REPO, "configs/debug/fsclip_tiny_params.py"),
                cfg)
    ckpt_base = str(tmp_path / "ck")
    env = dict(os.environ, REPEAT="2")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1-device CPU: two trainings back to back
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "dup_run.sh"),
         f"{sys.executable} train.py",
         str(cfg),
         "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base,
         "--max_epochs", "1", "--san_check_val_step", "0"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert (tmp_path / "fsclip_tiny_params-dup1.py").exists()
    for d in ("fsclip_tiny_params", "fsclip_tiny_params-dup1"):
        assert os.path.exists(os.path.join(ckpt_base, d, "models",
                                           "best.npz")), d
    # distinct seeds -> distinct trained weights
    import numpy as np_

    a = dict(np_.load(os.path.join(ckpt_base, "fsclip_tiny_params",
                                   "models", "best.npz")))
    b = dict(np_.load(os.path.join(ckpt_base, "fsclip_tiny_params-dup1",
                                   "models", "best.npz")))
    diff = any(
        not np_.array_equal(a[k], b[k]) for k in a if not k.startswith("__")
    )
    assert diff, "dup run produced identical weights (seed not applied?)"


@pytest.mark.e2e
def test_nimagenet_eval_top5_and_subset(tmp_path):
    """ZS evaluation on an N-ImageNet-shaped npz tree: top-5 reporting
    (reference test.py:55-93) and --subset robustness-variant selection
    (imagenet.py:89-99) through the real CLI."""
    tree = make_nin_tree(str(tmp_path / "nin"))
    cfg = tmp_path / "zs_nin_tiny_params.py"
    cfg.write_text(f"""
from eventclip_tpu.utils.config import Params

class EventCLIPParams(Params):
    gpus = 1
    dataset = 'n_imagenet'
    data_root = {tree!r}
    train_batch_size = 4
    val_batch_size = 8
    num_workers = 2
    quantize_args = dict(
        max_imgs=2, N=1000, split_method='event_count',
        convert_method='event_histogram', grayscale=True,
        count_non_zero=False, background_mask=True,
    )
    model = 'ZSCLIP'
    clip_dict = dict(arch='ViT-T/8@32',
                     prompt='a point cloud image of a {{}}',
                     agg_func='mean')
""")
    r = run(["test.py", "--params", str(cfg), "--cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy@5 (probs)" in r.stdout  # N-IN reports top-5 too
    r = run(["test.py", "--params", str(cfg), "--cpu", "--subset", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "accuracy@1" in r.stdout


@pytest.mark.e2e
def test_training_actually_learns(tmp_path):
    """Guard the optimizer/schedule/loss wiring: fine-tuning the tiny conv
    tower on a synthetically separable 3-class tree must cut the train CE
    loss and beat chance (1/3) on val by a wide margin. A silent optimizer
    break (zero grads, LR=0, wrong loss sign, frozen-leaf mixups) turns this
    red where the plumbing tests stay green. Seed 0 is pinned: random-init
    training on this tiny budget is bimodal across seeds (verified: seeds
    0/1 reach 2/3 val acc, seed 2 stalls at the uniform attractor).
    """
    tree = make_separable_tree(str(tmp_path / "sep_nc"))
    cfg = tmp_path / "ft_learn_params.py"
    cfg.write_text(FT_LEARN_CONFIG)
    ckpt_base = str(tmp_path / "ckpt")
    r = run([
        "train.py", "--params", str(cfg),
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base,
        "--seed", "0", "--san_check_val_step", "0",
    ], single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(os.path.join(ckpt_base, "ft_learn_params",
                           "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    train_loss = [rec["ce_loss"] for rec in recs if rec["split"] == "train"]
    val_acc = [rec["probs_acc"] for rec in recs if rec["split"] == "val"]
    assert len(train_loss) == 20 and val_acc
    assert train_loss[-1] < 0.8 * train_loss[0], (
        f"train ce_loss did not decrease: {train_loss}"
    )
    assert max(val_acc) >= 0.6, f"val probs_acc never beat chance: {val_acc}"


@pytest.mark.e2e
@pytest.mark.slow  # ~58 s on the 1-core CI host
def test_gen_data_and_selftrain(tree, tmp_path):
    cfg = tmp_path / "zs_tiny_params.py"
    cfg.write_text(f"""
from eventclip_tpu.utils.config import Params

class EventCLIPParams(Params):
    gpus = 1
    dataset = 'n_caltech'
    data_root = {tree!r}
    train_batch_size = 4
    val_batch_size = 8
    num_workers = 2
    quantize_args = dict(
        max_imgs=2, N=1000, split_method='event_count',
        convert_method='event_histogram', grayscale=True,
        count_non_zero=False, background_mask=True,
    )
    model = 'ZSCLIP'
    clip_dict = dict(arch='ViT-T/8@32',
                     prompt='a point cloud image of a {{}}',
                     agg_func='mean')
""")
    pseudo = str(tmp_path / "pseudo_nc")
    r = run([
        "gen_data.py", "--params", str(cfg), "--cpu",
        "--save_path", pseudo, "--conf_thresh", "0.3",
        "--tta", "--tta_consistent", "--tta_min_prob", "--topk", "2",
        "--int8", "--int8_calib", "1",  # calibrated static teacher rides
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Pseudo-label dataset tree written to" in r.stdout
    gen_stdout_8dev = r.stdout
    # symlinked training tree with all class dirs
    train_dir = os.path.join(pseudo, "training")
    assert sorted(os.listdir(train_dir)) == ["airplanes", "ant", "brain"]
    links = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(train_dir) for f in fs
    ]
    assert links and all(os.path.islink(l) for l in links)
    # testing split symlinked alongside
    assert os.path.islink(os.path.join(pseudo, "testing"))

    # student training consumes the pseudo tree
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", pseudo, "--cpu",
        "--ckpt_base", str(tmp_path / "ck2"),
        "--max_epochs", "1", "--san_check_val_step", "0",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Using pseudo" not in r.stderr  # no crash; dataset detected via root

    # the run above labeled on the 8-virtual-device mesh (gen_data shards
    # the TTA teacher forward over the data axis); the SAME command on one
    # device must select the SAME pseudo labels — per-sample math only, so
    # the mesh cannot change a single selection
    pseudo1 = str(tmp_path / "pseudo_nc_1dev")
    r = run([
        "gen_data.py", "--params", str(cfg), "--cpu",
        "--save_path", pseudo1, "--conf_thresh", "0.3",
        "--tta", "--tta_consistent", "--tta_min_prob", "--topk", "2",
        "--int8", "--int8_calib", "1",
    ], single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]

    def tree_links(root):
        return {
            os.path.relpath(os.path.join(dp, f), root):
                os.path.realpath(os.path.join(dp, f))
            for dp, _, fs in os.walk(os.path.join(root, "training"))
            for f in fs
        }

    assert tree_links(pseudo1) == tree_links(pseudo)
    # the printed per-class selection report must match too (counts + acc)
    stats = lambda out: out[  # noqa: E731
        out.index("Class stats:"):out.index("Pseudo-label dataset tree")]
    assert stats(r.stdout) == stats(gen_stdout_8dev)


@pytest.mark.e2e
@pytest.mark.slow  # ~74 s on the 1-core CI host
def test_gen_data_few_shot_teacher_merges_gt(tmp_path):
    """The self-training loop's few-shot-teacher half (reference
    gen_data.py:99-118 + docs/benchmark.md:112-128): train a 1-shot teacher,
    pseudo-label with `--weight ... --gt_shots 1`, and check the GT merge —
    every shipped-split sample lands in the pseudo tree under its ORIGINAL
    folder (first-match rename inversion: face -> Faces, so Faces_easy's GT
    file moves into Faces/ and no Faces_easy/ dir exists), with no
    missing-GT warning because the tree holds all 101 split files."""
    from eventclip_tpu.data.datasets import load_split_asset

    split = load_split_asset("NCaltech101", 1, True) \
        or load_split_asset("NCaltech101", 1, False)
    assert split and len(split) == 101

    # 101-class tree containing each split file (so the shipped split and
    # the GT merge both resolve) plus one extra train + one test file
    tree = str(tmp_path / "nc101")
    rng = np.random.default_rng(3)

    def write_events(path):
        n = 1200 + int(rng.integers(0, 300))
        ev = np.stack(
            [
                rng.integers(0, 240, n),
                rng.integers(0, 180, n),
                np.sort(rng.uniform(0, 0.3, n)),
                rng.choice([-1.0, 1.0], n),
            ],
            axis=1,
        )
        np.save(path, ev)

    gt_names = {}
    for rel in split:
        cls, fn = rel.replace("\\", "/").split("/")[-2:]
        gt_names[cls] = fn
        d = os.path.join(tree, "training", cls)
        os.makedirs(d, exist_ok=True)
        write_events(os.path.join(d, fn))
        write_events(os.path.join(d, f"{cls}_x0.npy"))
        td = os.path.join(tree, "testing", cls)
        os.makedirs(td, exist_ok=True)
        write_events(os.path.join(td, f"{cls}_t0.npy"))

    # 1-shot teacher: exp dir gains the -1shot suffix the weight/save-path
    # consistency asserts key on (reference gen_data.py:106-112)
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--num_shots", "1",
        "--ckpt_base", str(tmp_path / "ck"),
        "--max_epochs", "1", "--san_check_val_step", "0",
    ], single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]
    weight = str(tmp_path / "ck" / "fsclip_tiny_params-1shot" / "models"
                 / "best.npz")
    assert os.path.exists(weight)

    pseudo = str(tmp_path / "pseudo_nc_1shot")
    r = run([
        "gen_data.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--weight", weight, "--gt_shots", "1",
        "--conf_thresh", "0.999", "--save_path", pseudo,
    ], single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Loading weight" in r.stdout
    assert "not found" not in r.stdout  # every GT split file resolved

    train_dir = os.path.join(pseudo, "training")
    dirs = set(os.listdir(train_dir))
    # 'face' inverts to the rename table's FIRST match 'Faces' (a folder the
    # dataset doesn't even have — N-Caltech ships Faces_easy only), so the
    # pseudo tree holds Faces/ instead of Faces_easy/, like reference trees
    src_dirs = {rel.replace("\\", "/").split("/")[-2] for rel in split}
    assert dirs == (src_dirs - {"Faces_easy"}) | {"Faces"}
    # every GT sample was merged (the protocol guarantee), symlinked to the
    # real file under its inverted folder
    gt_cls_of = {"Faces_easy": "Faces"}
    for cls, fn in gt_names.items():
        link = os.path.join(train_dir, gt_cls_of.get(cls, cls), fn)
        assert os.path.islink(link), f"GT {cls}/{fn} missing from pseudo tree"
        assert os.path.realpath(link) == os.path.realpath(
            os.path.join(tree, "training", cls, fn))

@pytest.mark.e2e
@pytest.mark.slow  # ~109 s on the 1-core CI host
def test_hard_kill_mid_training_resumes_cleanly(tree, tmp_path):
    """Real preemption: SIGKILL the trainer MID-RUN (no grace, the Slurm
    timeout contract the watchdog resubmits after), then relaunch into the
    same ckpt dir. The atomic resume.pkl (os.replace) from the last
    completed epoch must restore; the relaunch trains only the remainder,
    keeps one run_id, and every epoch is covered. Also tolerates the torn
    final metrics line a KILL can leave behind."""
    import re
    import signal
    import time

    ckpt_base = str(tmp_path / "ck")
    args = [
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", ckpt_base,
        "--max_epochs", "12", "--san_check_val_step", "0",
    ]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1-device CPU: fast epochs, wide kill window
    metrics = os.path.join(ckpt_base, "fsclip_tiny_params", "metrics.jsonl")

    def read_recs():
        try:
            with open(metrics) as f:
                lines = f.readlines()
        except FileNotFoundError:
            return []
        recs = []
        for ln in lines:  # lenient: a SIGKILL can tear the last line
            try:
                recs.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
        return recs

    proc = subprocess.Popen(
        [sys.executable] + args, cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 900
        while time.time() < deadline:
            if any(r.get("split") == "val" and r.get("epoch", 0) >= 1
                   for r in read_recs()):
                break
            assert proc.poll() is None, "trainer exited before the kill window"
            time.sleep(0.05)
        else:
            pytest.fail("never saw epoch-1 val metrics")
        proc.send_signal(signal.SIGKILL)
    finally:
        proc.wait(timeout=60)

    r = run(args, single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"Resumed full state from epoch (\d+)", r.stdout)
    assert m and 1 <= int(m.group(1)) < 12, r.stdout[-2000:]
    recs = read_recs()
    train_epochs = [rec["epoch"] for rec in recs if rec["split"] == "train"]
    assert set(train_epochs) == set(range(12))  # nothing lost, rest trained
    assert len({rec["run_id"] for rec in recs if "run_id" in rec}) == 1
    assert os.path.exists(os.path.join(ckpt_base, "fsclip_tiny_params",
                                       "models", "best.npz"))


@pytest.mark.e2e
@pytest.mark.slow  # ~88 s on the 1-core CI host
def test_sigterm_graceful_preemption_saves_and_resumes(tree, tmp_path):
    """Graceful preemption: SIGTERM mid-run must finish the in-flight
    epoch, FORCE a boundary save even off save_interval (here 100, so
    without the preempt path no resume.pkl would exist at all), log a
    'preempt' record, die by the signal (so watchdogs resubmit), and
    resume from the preempted epoch on relaunch."""
    import re
    import signal
    import time

    with open(os.path.join(REPO, "configs/debug/fsclip_tiny_params.py")) as f:
        src = f.read()
    src += ("\n\nEventCLIPParams.max_epochs = 12\n"
            "EventCLIPParams.save_interval = 100\n"
            "EventCLIPParams.eval_interval = 100\n"
            "EventCLIPParams.n_samples = 0\n")
    cfg = str(tmp_path / "fsclip_preempt_params.py")
    with open(cfg, "w") as f:
        f.write(src)

    ckpt_base = str(tmp_path / "ck")
    args = [
        "train.py", "--params", cfg, "--data_root", tree, "--cpu",
        "--ckpt_base", ckpt_base, "--san_check_val_step", "0",
    ]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1-device CPU: fast epochs
    exp = os.path.join(ckpt_base, "fsclip_preempt_params")
    metrics = os.path.join(exp, "metrics.jsonl")

    def read_recs():
        try:
            with open(metrics) as f:
                lines = f.readlines()
        except FileNotFoundError:
            return []
        recs = []
        for ln in lines:
            try:
                recs.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
        return recs

    proc = subprocess.Popen(
        [sys.executable] + args, cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 900
        while time.time() < deadline:
            if any(r.get("split") == "train" and r.get("epoch", 0) >= 1
                   for r in read_recs()):
                break
            assert proc.poll() is None, "trainer exited before the signal"
            time.sleep(0.05)
        else:
            pytest.fail("never saw epoch-1 train metrics")
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=60)
    assert rc == -signal.SIGTERM, f"expected death by SIGTERM, got {rc}"

    recs = read_recs()
    preempts = [r for r in recs if r.get("split") == "preempt"]
    assert len(preempts) == 1 and preempts[0]["signal"] == signal.SIGTERM
    stopped_after = preempts[0]["epoch"] + 1
    assert 1 <= stopped_after < 12
    assert os.path.exists(os.path.join(exp, "models", "resume.pkl"))

    r = run(args, single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"Resumed full state from epoch (\d+)", r.stdout)
    assert m and int(m.group(1)) == stopped_after, r.stdout[-2000:]
    recs = read_recs()
    train_epochs = [rec["epoch"] for rec in recs if rec["split"] == "train"]
    assert set(train_epochs) == set(range(12))
    assert sorted(train_epochs) == sorted(set(train_epochs))  # no redo
    assert len({rec["run_id"] for rec in recs if "run_id" in rec}) == 1


ZS_SERVER_CONFIG = """
from eventclip_tpu.utils.config import Params


class EventCLIPParams(Params):
    gpus = 1
    dataset = 'n_caltech'
    data_root = '/nonexistent'
    train_batch_size = 4
    val_batch_size = 8
    quantize_args = dict(
        max_imgs=2, N=1000, split_method='event_count',
        convert_method='event_histogram', grayscale=True,
        count_non_zero=False, background_mask=True,
    )
    model = 'ZSCLIP'
    clip_dict = dict(arch='ViT-T/8@32',
                     prompt='a point cloud image of a {}',
                     agg_func='mean')
    bf16 = False
"""


@pytest.mark.e2e
def test_server_cli(tmp_path):
    """`python -m eventclip_tpu.server`: the deployment entry point comes
    up from a config file + class list, serves /healthz and /predict over
    real HTTP with micro-batching on, and answers correctly-shaped JSON.
    (The in-process HTTP layer is covered by tests/test_server.py; this
    pins the argparse/warm-up/ready-line path a user actually runs.)"""
    import time
    import urllib.request

    cfg = tmp_path / "zs_tiny_params.py"
    cfg.write_text(ZS_SERVER_CONFIG)
    names = tmp_path / "names.txt"
    names.write_text("airplanes\nant\nbrain\n")

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # 1-device CPU
    proc = subprocess.Popen(
        [sys.executable, "-m", "eventclip_tpu.server",
         "--params", str(cfg), "--classes", str(names), "--smoke",
         "--cpu", "--batch_size", "4", "--port", "0",
         "--microbatch_ms", "5"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # the ready line prints AFTER the warm-up predict compiles; read on
        # a helper thread so a wedged (silent, never-exiting) server still
        # fails at the deadline instead of blocking readline() forever
        import queue
        import threading

        lines = queue.Queue()

        def _pump():
            for ln in proc.stdout:
                lines.put(ln)

        threading.Thread(target=_pump, daemon=True).start()
        deadline = time.time() + 600
        line = ""
        while "serving ZSCLIP" not in line:
            assert proc.poll() is None, "server exited before ready"
            try:
                line = lines.get(
                    timeout=max(0.1, min(5.0, deadline - time.time())))
            except queue.Empty:
                if time.time() >= deadline:
                    pytest.fail("never saw the ready line")
        port = int(line.split("http://127.0.0.1:")[1].split()[0])
        url = f"http://127.0.0.1:{port}"

        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["n_classes"] == 3

        rng = np.random.default_rng(0)
        k = 2500
        stream = np.stack([
            rng.integers(0, 240, k), rng.integers(0, 180, k),
            np.sort(rng.uniform(0, 0.3, k)), rng.choice([-1.0, 1.0], k),
        ], axis=1)
        body = json.dumps({"streams": [stream.tolist()],
                           "top_k": 2}).encode()
        req = urllib.request.Request(
            url + "/predict", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            resp = json.loads(r.read())
        assert len(resp["label"]) == 1
        assert resp["names"][0] in ("airplanes", "ant", "brain")
        assert len(resp["topk"][0]) == 2

        # graceful drain: SIGTERM (the scheduler signal) must exit 0
        import signal

        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait(timeout=60)


@pytest.mark.e2e
def test_accum_cli_one_update_per_global_batch(tree, tmp_path):
    """--accum K through the real CLI: the step count stays batches per
    epoch (one optimizer update per GLOBAL batch), not microbatches —
    accumulation changes memory, never the schedule/step accounting."""
    base = str(tmp_path / "ckpt")
    r = run([
        "train.py", "--params", "configs/debug/fsclip_tiny_params.py",
        "--data_root", tree, "--cpu", "--ckpt_base", base,
        "--max_epochs", "1", "--san_check_val_step", "0", "--accum", "2",
    ], single_device=True)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(os.path.join(base, "fsclip_tiny_params",
                           "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    tr = [x for x in recs if x["split"] == "train"]
    # 18 samples / batch 4 (drop_last) = 4 steps, same as accum=1
    assert tr and tr[-1]["steps"] == 4, tr
