"""Experiment config: few-shot joint adapter on N-ImageNet-Mini (ViT-B/32, self-training student).

Hyper-parameters mirror the reference config of the same name
(/root/reference/configs/fsclip/joint_adapter/joint_fsclip_nin_mini_params-vitb32.py); `train_batch_size` is the GLOBAL batch
(the reference stores per-GPU batch and multiplies by `gpus` at launch),
and `gpus` maps to the data-parallel shard count of the TPU mesh.
"""

from eventclip_tpu.utils.config import Params

class EventCLIPParams(Params):
    project = 'EventCLIP-TPU'

    # training settings
    gpus = 1
    max_epochs = 100
    save_interval = 1
    eval_interval = 5
    save_epoch_end = False
    n_samples = 5

    # optimizer settings: Adam, cosine decay with warmup
    optimizer = 'Adam'
    lr = 2e-5
    weight_decay = 0.0
    warmup_steps_pct = 0.05
    img_aug = True

    dataset = 'n_imagenet_mini'
    data_root = './data/N_Imagenet/'
    num_shots = None
    repeat_data = True
    train_batch_size = 32
    val_batch_size = train_batch_size * 2
    num_workers = 8

    quantize_args = dict(
        max_imgs=2,
        N=70000,
        split_method='event_count',
        convert_method='event_histogram',
        grayscale=True,
        count_non_zero=False,
        background_mask=True,
    )

    model = 'FSCLIP'
    clip_dict = dict(
        arch='ViT-B/32',
        prompt='a sketch image of a {}',
        agg_func='mean',
    )

    d_model = 256
    adapter_dict = dict(
        adapter_type='text-trans',
        in_dim=512,  # overridden by the CLIP embed dim at build time
        d_model=d_model,
        num_heads=d_model // 64,
        ffn_dim=d_model * 4,
        norm_first=True,
        num_layers=2,
        residual=0.95,
    )

    loss_dict = dict(
        use_logits_loss=True,
        use_probs_loss=False,
    )

    ce_loss_w = 1.

    ckp_monitor = 'val/probs_acc'
    ckp_monitor_type = 'max'
