"""Threaded prefetching batch loader.

Replaces the reference's torch DataLoader + DistributedSampler (provided by
nerv's BaseDataModule). Design for TPU input pipelines:

- items are numpy dicts (padded event windows), collation is a stack;
- a thread pool prefetches batches ahead of the train step, so host-side
  event IO overlaps device compute (numpy IO releases the GIL);
- per-host sharding: in a multi-process (multi-host) setup each process
  loads `1/num_shards` of every batch (shard_index/num_shards), which is the
  DistributedSampler contract without the torch dependency;
- epochs are seeded: `loader.epoch(k)` reshuffles deterministically.
"""

from __future__ import annotations

import queue
import statistics
import threading
import time
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def device_prefetch(host_batches, place, depth: int = 2):
    """Double-buffer host->device placement behind device compute.

    `place` maps a host batch to device arrays (device_put / a sharded
    make_global_batch). `depth` batches are placed eagerly before the first
    yield; afterwards each placement happens right after the consumer
    dispatched its (asynchronous) step on the previous batch, so the H2D
    copy for step k+1 rides under the device compute of step k instead of
    serializing with it. The reference gets this overlap from torch
    DataLoader worker processes + CUDA async copies (event2img.py's loader);
    a synchronous `place` per step would forfeit it on any link where the
    transfer is non-trivial (measured 600 ms/step for the N-ImageNet
    geometry through the axon relay vs a 130 ms train step).

    depth=2 is one batch in flight — more buys nothing once placement is
    fully hidden and each queued batch holds HBM.
    """
    from collections import deque

    buf = deque()
    for batch in host_batches:
        buf.append(place(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def adaptive_prefetch(host_batches, place, choice: Optional[dict] = None,
                      warmup: int = 2, probe: int = 4):
    """device_prefetch whose depth is MEASURED, not assumed.

    jit dispatch is asynchronous, so the plain place-then-dispatch loop
    (depth 1) is already double-buffered: the device runs step k while the
    host places batch k+1. Holding an extra placed batch (depth 2) only
    helps when placement itself is async relative to the device stream;
    through a synchronous link (the axon relay) the extra in-flight
    transfer CONTENDS with the step's dispatch instead — measured 417 vs
    315 ms/step on the N-IN LoRA geometry (BENCH_STAGES round 3), while on
    a real PCIe host depth 2 is the textbook win. Rather than hardcode
    either machine's answer, the first `warmup` steps run untimed (compile
    + first dispatch), the next `probe` steps run at depth 2, the `probe`
    after at depth 1, and the median-faster depth is stored in
    ``choice['depth']`` and used for every step after — later epochs (the
    trainer passes a persistent dict) skip straight to the winner. Epochs
    too short to finish the A/B stay at the safe depth-1 tail and leave
    the choice open.
    """
    if choice is None:
        choice = {}
    if choice.get("depth"):
        yield from device_prefetch(host_batches, place, choice["depth"])
        return

    from collections import deque

    it = iter(host_batches)
    buf: deque = deque()
    times = {1: [], 2: []}
    step = 0
    exhausted = False
    t_prev = None
    while True:
        if choice.get("depth"):
            mode = choice["depth"]
        else:
            mode = 2 if step < warmup + probe else 1
        while not exhausted and len(buf) < mode:
            try:
                buf.append(place(next(it)))
            except StopIteration:
                exhausted = True
        if not buf:
            return
        yield buf.popleft()
        now = time.perf_counter()
        if t_prev is not None and step >= warmup and not choice.get("depth"):
            times[mode].append(now - t_prev)
        t_prev = now
        step += 1
        if (not choice.get("depth") and len(times[1]) >= probe
                and len(times[2]) >= probe):
            choice["depth"] = (1 if statistics.median(times[1])
                               <= statistics.median(times[2]) else 2)


def view_pack_buckets(total_views: int, align: int = 8) -> List[int]:
    """Static view-count buckets for packed eval (quarters of the budget).

    A batch's packed view count K is rounded UP to the smallest bucket, so
    at most four encoder programs ever compile. Every bucket is a multiple
    of `align` (the data-mesh axis must divide K for sharding), so the top
    bucket may exceed total_views by up to align-1 blank slots — cheaper
    than an unshardable K.
    """
    align = max(int(align), 1)
    out = []
    for frac in (0.25, 0.5, 0.75, 1.0):
        k = int(np.ceil(total_views * frac / align)) * align
        out.append(max(k, align))
    return sorted(set(out))


def eval_pack_buckets(batch_size: int, max_imgs: int, n_data: int,
                      num_shards: int = 1) -> Optional[List[int]]:
    """The ONE policy for when/how eval view-packing applies.

    Used by both trainer.evaluate and the test.py CLI so they can never
    diverge. Returns None (padded eval) only when EVENTCLIP_NO_PACK_EVAL
    is set. Multi-process runs pack too: pack_view_batch agrees on the
    bucket across hosts (one tiny allgather per batch), so the sweep
    workhorse keeps the packing win on pods. Buckets are multiples of
    lcm(8, n_data) and num_shards divides n_data (every host contributes
    the same device count), so each host's slice K/num_shards is whole.
    """
    import math
    import os

    if os.environ.get("EVENTCLIP_NO_PACK_EVAL"):
        return None
    return view_pack_buckets(batch_size * max_imgs,
                             align=math.lcm(8, max(n_data, 1)))


def pack_view_batch(batch: Dict[str, np.ndarray],
                    buckets: List[int],
                    shard_index: int = 0,
                    num_shards: int = 1) -> Dict[str, np.ndarray]:
    """Compact a padded-view eval batch so only REAL views get encoded.

    In: 'windows' [B, T, N, ...] + 'valid_mask' [B, T] (plus labels etc.),
    this host's shard of the global batch. Out: the same dict with
    'windows' [K/num_shards, N, ...] holding this shard's valid views and
    'view_src' [K/num_shards] int32 GLOBAL flat [B_global*T] slot ids
    (sentinel B_global*T = packing padding). K is the smallest bucket
    whose per-shard slice fits every host's view count; a batch needing
    more views than max(buckets) is returned unpacked on every host (the
    padded forward is always correct). Consumed by
    models.classifier.classifier_forward_packed.

    Multi-process: SPMD needs every host to enqueue the SAME program for
    the same global batch, so the bucket is agreed with one tiny host
    allgather of the per-shard view counts before any array is formed —
    deterministic by construction, and the only cross-host traffic the
    packing adds.
    """
    valid = np.asarray(batch["valid_mask"], dtype=bool)
    B, T = valid.shape  # this host's shard of the global batch
    idx = np.flatnonzero(valid.reshape(-1)).astype(np.int32)
    need = max(len(idx), 1)
    if num_shards > 1:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([need], dtype=np.int64))
        need = int(np.asarray(counts).max())
    fitting = [k for k in buckets if k // num_shards >= need]
    if not fitting:
        return batch
    K = fitting[0] // num_shards  # this host's slice of the packed axis
    windows = np.asarray(batch["windows"])
    flat = windows.reshape((B * T,) + windows.shape[2:])
    packed = np.zeros((K,) + flat.shape[1:], dtype=flat.dtype)
    packed[: len(idx)] = flat[idx]
    src = np.full((K,), num_shards * B * T, dtype=np.int32)
    src[: len(idx)] = idx + shard_index * B * T
    out = dict(batch)
    out["windows"] = packed
    out["view_src"] = src
    return out


def collate(items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if np.isscalar(vals[0]) or np.ndim(vals[0]) == 0:
            out[k] = np.asarray(vals)
        else:
            out[k] = np.stack(vals)
    return out


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        pad_last: bool = False,
    ):
        """pad_last: repeat-pad the final ragged batch to batch_size and add
        a 'sample_mask' key (static shapes for jit; masked in eval)."""
        assert not (drop_last and pad_last)
        assert batch_size % num_shards == 0, (batch_size, num_shards)
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // num_shards
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = max(prefetch, 1)
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._epoch = 0

    def epoch(self, k: int) -> "PrefetchLoader":
        self._epoch = k
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(k)
        return self

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n_batches = len(self)
        # this shard's slice of every global batch
        jobs = []
        for b in range(n_batches):
            sl = order[b * self.batch_size:(b + 1) * self.batch_size]
            lo = self.shard_index * self.local_batch
            # (shard slice, fallback index): a ragged final global batch can
            # leave a trailing shard with NO items — it still must emit a
            # lockstep batch (collectives), so it pads from any sample in
            # the global batch with every row masked out
            jobs.append((sl[lo:lo + self.local_batch], int(sl[0])))

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        lock = threading.Lock()
        next_job = [0]

        def worker():
            while not stop.is_set():
                with lock:
                    j = next_job[0]
                    if j >= len(jobs):
                        return
                    next_job[0] += 1
                try:
                    batch = self._make_batch(jobs[j])
                except BaseException as e:  # surfaced in the consumer
                    batch = e
                while not stop.is_set():
                    try:
                        out_q.put((j, batch), timeout=0.1)
                        break
                    except queue.Full:
                        continue

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_workers, max(len(jobs), 1)))
        ]
        for t in threads:
            t.start()
        # consumer-side reordering: drain unconditionally (no deadlock),
        # yield strictly in batch order
        pending: Dict[int, Any] = {}
        try:
            for want in range(len(jobs)):
                while want not in pending:
                    j, batch = out_q.get()
                    pending[j] = batch
                item = pending.pop(want)
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _make_batch(self, job) -> Dict[str, np.ndarray]:
        idxs, fallback = job
        items = [self.dataset[int(i)] for i in idxs]
        n = len(items)
        if n == 0 and not self.pad_last:
            raise ValueError(
                f"shard {self.shard_index}/{self.num_shards} got 0 of "
                f"{self.local_batch} items for the final ragged batch; "
                "use pad_last=True (eval) or drop_last=True (train)"
            )
        if self.pad_last and n < self.local_batch:
            pad_src = items[-1] if items else self.dataset[fallback]
            items = items + [pad_src] * (self.local_batch - n)
        batch = collate(items)
        if self.pad_last:
            mask = np.zeros(self.local_batch, dtype=bool)
            mask[:n] = True
            batch["sample_mask"] = mask
        return batch
