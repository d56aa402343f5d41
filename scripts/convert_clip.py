"""Convert an OpenAI CLIP checkpoint (.pt) to the framework's npz format.

    python scripts/convert_clip.py ViT-L-14.pt clip_vitl14.npz

The .pt may be a torchscript archive (as distributed by OpenAI and cached by
`clip.load`, reference train.py:26) or a plain state dict. The npz holds the
layer-stacked parameter pytree consumed by eventclip_tpu.models.clip, keyed
by '/'-joined tree paths; pass it to train.py/test.py via --clip_ckpt (or
the CLIP_CKPT env var).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]

    from eventclip_tpu.engine.checkpoint import save_checkpoint
    from eventclip_tpu.models.clip.convert import load_clip_checkpoint

    params, cfg = load_clip_checkpoint(src)
    save_checkpoint(dst, params, extra={"arch": cfg.name})
    size = os.path.getsize(dst) / 1e6
    print(f"{cfg.name}: wrote {dst} ({size:.1f} MB)")
    print(f"vision: {cfg.vision}")
    print(f"text:   {cfg.text}")


if __name__ == "__main__":
    main()
