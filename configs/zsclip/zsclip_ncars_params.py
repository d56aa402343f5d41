"""Experiment config: zero-shot EventCLIP on N-Cars.

Hyper-parameters mirror the reference config of the same name
(/root/reference/configs/zsclip/zsclip_ncars_params.py); `train_batch_size` is the GLOBAL batch
(the reference stores per-GPU batch and multiplies by `gpus` at launch),
and `gpus` maps to the data-parallel shard count of the TPU mesh.
"""

from eventclip_tpu.utils.config import Params

class EventCLIPParams(Params):
    project = 'EventCLIP-TPU'

    gpus = 1

    dataset = 'n_cars'
    data_root = './data/N-Cars/'
    train_batch_size = 32
    val_batch_size = train_batch_size * 2
    num_workers = 8

    quantize_args = dict(
        max_imgs=2,
        N=30000,
        split_method='event_count',
        convert_method='event_histogram',
        grayscale=True,
        count_non_zero=True,
        background_mask=False,
    )

    model = 'ZSCLIP'
    clip_dict = dict(
        arch='ViT-L/14',
        prompt='a point cloud image of a {}',
        agg_func='mean',
    )
