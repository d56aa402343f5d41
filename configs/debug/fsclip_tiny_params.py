"""Debug/smoke config: tiny CLIP tower, tiny windows, few epochs.

Not part of the reference's 15 experiment configs — used by the test suite
and CLI smoke runs to exercise the full train/eval path in seconds.
"""

from eventclip_tpu.utils.config import Params


class EventCLIPParams(Params):
    project = 'EventCLIP-TPU'

    gpus = 1
    max_epochs = 2
    save_interval = 1
    eval_interval = 1
    n_samples = 2

    optimizer = 'Adam'
    lr = 1e-3
    weight_decay = 0.0
    warmup_steps_pct = 0.1
    img_aug = True

    dataset = 'n_caltech'
    data_root = './data/N-Caltech101/'
    num_shots = None
    repeat_data = True
    train_batch_size = 4
    val_batch_size = 4
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

    model = 'FSCLIP'
    clip_dict = dict(
        arch='ViT-T/8@32',
        prompt='a point cloud image of a {}',
        agg_func='mean',
    )

    d_model = 16
    adapter_dict = dict(
        adapter_type='text-trans',
        in_dim=32,
        d_model=d_model,
        num_heads=2,
        ffn_dim=d_model * 4,
        norm_first=True,
        num_layers=2,
        residual=0.8,
    )

    loss_dict = dict(
        use_logits_loss=True,
        use_probs_loss=False,
    )

    ce_loss_w = 1.

    ckp_monitor = 'val/probs_acc'
    ckp_monitor_type = 'max'
