"""Debug/smoke config: zero-shot variant of the tiny tower.

Not part of the reference's 15 experiment configs — used by CLI smoke
runs (serve/export need no checkpoint for ZSCLIP) to exercise the full
serving/export path in seconds.
"""

from eventclip_tpu.utils.config import Params


class EventCLIPParams(Params):
    project = 'EventCLIP-TPU'

    gpus = 1
    n_samples = 2

    dataset = 'n_caltech'
    data_root = './data/N-Caltech101/'
    train_batch_size = 4
    val_batch_size = 8
    num_workers = 2

    quantize_args = dict(
        max_imgs=2,
        N=1000,
        split_method='event_count',
        convert_method='event_histogram',
        grayscale=True,
        count_non_zero=False,
        background_mask=True,
    )

    model = 'ZSCLIP'
    clip_dict = dict(
        arch='ViT-T/8@32',
        prompt='a point cloud image of a {}',
        agg_func='mean',
    )
