"""Experiment config: zero-shot EventCLIP on N-Caltech101.

Hyper-parameters mirror the reference config of the same name
(/root/reference/configs/zsclip/zsclip_ncaltech_params.py); `train_batch_size` is the GLOBAL batch
(the reference stores per-GPU batch and multiplies by `gpus` at launch),
and `gpus` maps to the data-parallel shard count of the TPU mesh.
"""

from eventclip_tpu.utils.config import Params

class EventCLIPParams(Params):
    project = 'EventCLIP-TPU'

    gpus = 1

    dataset = 'n_caltech'
    data_root = './data/N-Caltech101/'
    train_batch_size = 32
    val_batch_size = train_batch_size * 2
    num_workers = 8

    quantize_args = dict(
        max_imgs=2,
        N=20000,
        split_method='event_count',
        convert_method='event_histogram',
        grayscale=True,
        count_non_zero=False,
        background_mask=True,
    )

    model = 'ZSCLIP'
    clip_dict = dict(
        arch='ViT-L/14',
        prompt='a point cloud image of a {}',
        agg_func='mean',
    )
