"""Convert trained EventCLIP method checkpoints between torch and npz.

Import (migrate FROM the reference — .pth in, npz out):

    python scripts/convert_checkpoint.py best.pth best.npz

The input is a checkpoint the reference trainer saved
(``checkpoint/<exp>/models/{best.pth,model_<it>.pth}``): CLIP-free state
dicts holding the trained adapter / prompt-tuned text features / LoRA
deltas / fine-tuned visual tower (reference models/clip_cls.py:208-219,
models/clip_cls_ft.py:313-333). The output npz is this framework's
trainable-leaf checkpoint — pass it to test.py / serve via ``--weight``
with the SAME experiment config the reference run used.

Export (take weights trained here back to torch — npz in, .pth out):

    python scripts/convert_checkpoint.py best.npz best.pth [clip_base]

Emits the reference's exact state-dict key space (wrapped under
'state_dict'), loadable by its ``model.load_weight``. FT checkpoints
(LoRA / partial fine-tune) additionally need ``clip_base`` — the frozen
CLIP tower (a converted .npz or the original .pt) — because the
reference saves the whole ``model.visual.*`` while this framework's
checkpoints keep only the trainable leaves.

(For the base CLIP weights themselves, see scripts/convert_clip.py.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def describe(tree, prefix=""):
    import numpy as np

    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            describe(v, f"{prefix}{k}/")
        else:
            print(f"  {prefix}{k}  {np.shape(v)}")


def _load_clip_visual(path):
    if path.endswith(".npz"):
        import numpy as np

        from eventclip_tpu.models.clip.convert_method import unflatten

        with np.load(path, allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files
                    if not k.startswith("__extra__/")}
        return unflatten(flat)["visual"]
    from eventclip_tpu.models.clip.convert import load_clip_checkpoint

    return load_clip_checkpoint(path)[0]["visual"]


def _export(src, dst, clip_base):
    import numpy as np

    from eventclip_tpu.models.clip.convert_method import (
        save_method_checkpoint,
        unflatten,
    )

    with np.load(src, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files if not k.startswith("__extra__/")}
    tree = unflatten(flat)
    clip_visual = _load_clip_visual(clip_base) if clip_base else None
    save_method_checkpoint(dst, tree, clip_visual=clip_visual)
    print(f"wrote {dst} ({os.path.getsize(dst) / 1e6:.1f} MB) in the "
          "reference's .pth key space")


def main():
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    clip_base = sys.argv[3] if len(sys.argv) == 4 else ""

    if src.endswith(".npz"):  # export: npz -> torch .pth
        _export(src, dst, clip_base)
        return

    from eventclip_tpu.engine.checkpoint import save_checkpoint
    from eventclip_tpu.models.clip.convert_method import load_method_checkpoint

    tree = load_method_checkpoint(src)
    save_checkpoint(dst, tree)
    print(f"wrote {dst} ({os.path.getsize(dst) / 1e6:.1f} MB) holding:")
    describe(tree)


if __name__ == "__main__":
    main()
