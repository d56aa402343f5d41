"""Convert a reference-trained EventCLIP method checkpoint (.pth) to npz.

    python scripts/convert_checkpoint.py best.pth best.npz

The input is a checkpoint the reference trainer saved
(``checkpoint/<exp>/models/{best.pth,model_<it>.pth}``): CLIP-free state
dicts holding the trained adapter / prompt-tuned text features / LoRA
deltas / fine-tuned visual tower (reference models/clip_cls.py:208-219,
models/clip_cls_ft.py:313-333). The output npz is this framework's
trainable-leaf checkpoint — pass it to test.py / serve via ``--weight``
with the SAME experiment config the reference run used.

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


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]

    from eventclip_tpu.engine.checkpoint import save_checkpoint
    from eventclip_tpu.models.clip.convert_method import load_method_checkpoint

    tree = load_method_checkpoint(src)
    save_checkpoint(dst, tree)
    print(f"wrote {dst} ({os.path.getsize(dst) / 1e6:.1f} MB) holding:")
    describe(tree)


if __name__ == "__main__":
    main()
