"""Training/eval orchestration — the ``main.py`` equivalent.

Capability parity with the reference orchestration (main.py:34-542):
CLI → config load/merge/dump → model+criterion via registry → datasets,
samplers (RFS/CAS/shuffle), loaders (+ImageNet-LVIS interleave) → optimizer
→ auto-resume / pretrain load → epoch loop (train, checkpoint, periodic
eval, best-checkpoint tracking, EMA eval, JSON log lines) — rebuilt on the
TPU runtime: one jitted train step over a GSPMD mesh, orbax checkpoints,
host-side evaluators.

Usage:
  python -m richsem_tpu.train.main -c configs/richsem/dino_4scale_lvis.py \
      --output_dir out/ [--options k=v ...] [--eval] [--resume ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from richsem_tpu.config import Config, parse_override_options
from richsem_tpu.data.datasets import build_dataset
from richsem_tpu.data.loader import DataLoader, MultiDatasetLoader
from richsem_tpu.data.samplers import (
    ClassAwareSampler,
    RepeatFactorSampler,
    ShuffleSampler,
)
from richsem_tpu.models import registry
import richsem_tpu.models.build  # noqa: F401 - registers 'richsem'
from richsem_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated,
)
from richsem_tpu.train.engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from richsem_tpu.train.optim import build_optimizer
from richsem_tpu.utils.checkpoint import BestMetricHolder, CheckpointManager
from richsem_tpu.utils.logging import MetricLogger, setup_logger


# CLI defaults, applied only when neither the config file nor the command
# line provides the key — an explicitly passed flag beats the config file,
# but an *unset* default must not clobber config/--options values
# (the reference avoids this by hard-erroring on collisions, main.py:150-156).
_CLI_DEFAULTS = dict(
    dataset_file="lvis", data_root="DATASET", output_dir="", resume="",
    pretrain_model_path="", finetune_ignore=None, eval=False, test=False,
    debug=False, seed=42, start_epoch=0, note="",
)


def get_args_parser() -> argparse.ArgumentParser:
    """CLI surface parity with main.py:74-125.

    Every optional argument defaults to ``argparse.SUPPRESS`` so that
    :func:`load_config` can distinguish explicitly passed flags from
    defaults (see ``_CLI_DEFAULTS``)."""
    S = argparse.SUPPRESS
    p = argparse.ArgumentParser("RichSem-TPU", add_help=False)
    p.add_argument("--config_file", "-c", type=str, required=True)
    p.add_argument("--options", nargs="+", default=S, help="override k=v pairs")
    p.add_argument("--dataset_file", type=str, default=S)
    p.add_argument("--data_root", type=str, default=S)
    p.add_argument("--output_dir", type=str, default=S)
    p.add_argument("--resume", type=str, default=S)
    p.add_argument("--pretrain_model_path", type=str, default=S)
    p.add_argument("--finetune_ignore", type=str, nargs="+", default=S)
    p.add_argument("--eval", action="store_true", default=S)
    p.add_argument("--save_results", action="store_true", default=S,
                   help="dump per-process gt/pred arrays during eval "
                        "(reference engine.py:239-299)")
    p.add_argument("--test", action="store_true", default=S)
    p.add_argument("--debug", action="store_true", default=S)
    p.add_argument("--seed", type=int, default=S)
    p.add_argument("--start_epoch", type=int, default=S)
    p.add_argument("--note", type=str, default=S)
    return p


def load_config(args) -> Config:
    provided = dict(vars(args))
    options = provided.pop("options", None)
    provided.pop("config_file", None)
    cfg = Config.fromfile(args.config_file)
    for k, v in provided.items():  # explicitly passed CLI flags
        cfg[k] = v
    cfg.merge_from_dict(parse_override_options(options))  # --options wins
    for k, v in _CLI_DEFAULTS.items():
        if k not in cfg:
            cfg[k] = v
    return cfg


def build_loaders(cfg, shard_id: int = 0, num_shards: int = 1):
    train_ds = build_dataset("train", cfg)
    val_ds = build_dataset("val", cfg)
    buckets = [tuple(b) for b in cfg.train_canvas_buckets]
    max_gt = cfg.max_gt_per_image

    if cfg.use_rfs:
        sampler = RepeatFactorSampler(
            train_ds.category_ids_per_image(), cfg.num_classes,
            repeat_thresh=cfg.rfs_repeat_sh,
            shard_id=shard_id, num_shards=num_shards, seed=cfg.seed,
        )
    elif cfg.use_cas:
        sampler = ClassAwareSampler(
            train_ds.category_ids_per_image(), cfg.num_classes,
            shard_id=shard_id, num_shards=num_shards, seed=cfg.seed,
        )
    else:
        sampler = ShuffleSampler(
            len(train_ds), shard_id, num_shards, seed=cfg.seed
        )
    global_batch = cfg.batch_size * jax.device_count()
    train_loader = DataLoader(
        train_ds, sampler, global_batch // num_shards, buckets, max_gt,
        seed=cfg.seed,
    )
    if cfg.use_imagenet:
        extra_ds = build_dataset("train", cfg, imagenet_lvis=True)
        extra_buckets = list(buckets)
        if cfg.imagenet_use_mosaic:
            extra_buckets.append((1280, 1280))  # 2×(640,640) mosaic canvas
        extra_loader = DataLoader(
            extra_ds,
            ShuffleSampler(len(extra_ds), shard_id, num_shards, cfg.seed),
            global_batch // num_shards, extra_buckets, max_gt,
            seed=cfg.seed + 1,
        )
        train_loader = MultiDatasetLoader(
            train_loader, extra_loader, cfg.main_weight, cfg.sub_weight
        )
    # Eval resize is shortest-side 800 @ max 1333 in either orientation
    # (datasets/coco.py:689-692) — cover both orientations of the eval
    # canvas (plus any train bucket) so no val image misses a bucket.
    ch, cw = tuple(cfg.eval_canvas)
    eval_canvas = sorted({(ch, cw), (cw, ch)})
    val_loader = DataLoader(
        val_ds,
        ShuffleSampler(len(val_ds), shard_id, num_shards, 0, shuffle=False,
                       pad_to_equal=num_shards > 1),
        max(global_batch // num_shards, 1), eval_canvas, max_gt,
        drop_last=False, pad_last=True,
    )
    return train_loader, val_loader, train_ds, val_ds


def evaluate(cfg, model, params, val_loader, val_ds, text_embed=None, logger=None,
             place_batch=None, clip_model=None, clip_params=None,
             save_results_dir=None):
    """Eval loop + AP summary (engine.py:149-330 equivalent).

    ``save_results_dir`` mirrors the reference's ``--save_results`` dump
    (engine.py:239-299): per-process {gt, prediction} arrays pickled to
    ``results_rank{k}.pkl`` for offline AP-parity diffing."""
    from richsem_tpu.data.evaluation import LvisEvaluator, CocoEvaluator

    eval_step = make_eval_step(model, cfg, clip_model=clip_model)
    if jax.process_count() > 1:
        # per-process eval on local devices: canvas buckets differ between
        # processes in the same round, so inputs cannot form one global
        # array — only the fixed-shape predictions are gathered (the
        # reference also evaluates per-rank and gathers predictions,
        # engine.py:301-326)
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        lmesh = Mesh(np.asarray(jax.local_devices()), ("data",))
        lshard = NamedSharding(lmesh, PartitionSpec("data"))
        place_batch = lambda b: {  # noqa: E731
            k: jax.device_put(np.asarray(v), lshard) for k, v in b.items()
        }
    else:
        place_batch = place_batch or _to_device
    if cfg.dataset_file.startswith("lvis"):
        evaluator = LvisEvaluator(val_ds.index, max_dets=cfg.num_select)
    else:
        # COCO protocol fixes maxDets at 100 per image-category regardless
        # of num_select (pycocotools default params, coco_eval.py)
        evaluator = CocoEvaluator(val_ds.index, max_dets=100)
    multihost = jax.process_count() > 1
    pad_rounds = 0
    if multihost:
        # bucket-grouped batching gives each process a shard-dependent batch
        # count; every process must run the same number of allgather rounds
        # (the reference's pickle-all_gather has the same constraint,
        # lvis_eval.py:118-123). The eval transform is deterministic, so the
        # count is computable from metadata; processes below the max re-run
        # their last batch (duplicates dedup by image_id).
        from jax.experimental import multihost_utils

        local_nb = val_loader.num_batches_hint(0)
        if local_nb is None:
            raise RuntimeError(
                "multihost eval requires a deterministic eval transform "
                "with predictable sizes (dataset.size_hint)"
            )
        counts = np.asarray(
            multihost_utils.process_allgather(jnp.asarray([local_nb]))
        ).reshape(-1)
        pad_rounds = int(counts.max()) - local_nb

    def _rounds():
        last = None
        for b in val_loader.epoch(0):
            last = b
            yield b
        for _ in range(pad_rounds):
            yield last

    n = 0
    saved = []
    for batch in _rounds():
        results = eval_step(params, place_batch(batch), text_embed, clip_params)
        if multihost:
            # each process evaluates a shard; gather fixed-shape prediction
            # arrays host-side (the reference's pickle-all_gather eval merge,
            # lvis_eval.py:118-123, rebuilt on multihost_utils)
            from jax.experimental import multihost_utils

            results = jax.device_get(
                multihost_utils.process_allgather(results)
            )
            ids = multihost_utils.process_allgather(
                jnp.asarray(batch["image_id"])
            )
            results = {k: v.reshape(-1, *v.shape[2:]) for k, v in results.items()}
            image_ids = np.asarray(ids).reshape(-1)
        else:
            results = jax.device_get(results)
            image_ids = batch["image_id"]
        preds = {}
        for i in range(len(image_ids)):
            preds[int(image_ids[i])] = {
                "scores": results["scores"][i],
                "labels": results["labels"][i],
                "boxes": results["boxes"][i],
            }
        evaluator.update(preds)
        if save_results_dir is not None:
            # reference --save_results (engine.py:239-299): keep the raw
            # per-image gt/pred arrays for offline diffing
            saved.append({
                "image_id": np.asarray(batch["image_id"]),
                "orig_size": np.asarray(batch["orig_size"]),
                "gt_labels": np.asarray(batch["labels"]),
                "gt_boxes": np.asarray(batch["boxes"]),
                "gt_valid": np.asarray(batch["valid"]),
                "scores": np.asarray(results["scores"]),
                "labels": np.asarray(results["labels"]),
                "boxes": np.asarray(results["boxes"]),
            })
        n += len(preds)
        if cfg.debug and n >= 30:
            break
    if save_results_dir is not None:
        import pickle

        os.makedirs(save_results_dir, exist_ok=True)
        out = os.path.join(
            save_results_dir, f"results_rank{jax.process_index()}.pkl"
        )
        with open(out, "wb") as f:
            pickle.dump(saved, f)
        if logger:
            logger.info(f"saved {len(saved)} eval batches to {out}")
    stats = evaluator.summarize()
    if logger:
        logger.info(f"eval on {n} images: {stats}")
    return stats


def _to_device(batch: Dict[str, np.ndarray]):
    return {k: jnp.asarray(v) for k, v in batch.items()}


def prefetch_to_device(batches, place, depth: int = 2):
    """Double-buffered device prefetch: place the NEXT batch(es) while the
    current step runs (``jax.device_put``/``make_array_from_process_local_
    data`` are async). The reference relies on DataLoader worker processes
    + synchronous ``.to(device)`` (engine.py:46-47); here the H2D copy of
    step *n+1* overlaps step *n*'s compute."""
    from collections import deque

    buf = deque()
    for batch in batches:
        buf.append(place(batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def make_batch_placer(mesh):
    """Per-host batch dict → global arrays sharded over the mesh 'data'
    axis — the DDP-equivalent placement (reference: DistributedSampler +
    DDP, main.py:204-206). Works single- and multi-host: each process
    contributes its local shard of the global batch."""
    bs = batch_sharding(mesh)

    def place(batch):
        return {
            k: jax.make_array_from_process_local_data(bs, np.asarray(v))
            for k, v in batch.items()
        }

    return place


def test_submission(cfg, model, params, val_loader, text_embed=None,
                    clip_model=None, clip_params=None):
    """Submission mode: COCO-format result records (engine.py:333-447
    ``test`` + ``convert_to_xywh`` parity)."""
    eval_step = make_eval_step(model, cfg, clip_model=clip_model)
    records = []
    for batch in val_loader.epoch(0):
        results = jax.device_get(
            eval_step(params, _to_device(batch), text_embed, clip_params)
        )
        for i in range(len(batch["image_id"])):
            boxes = results["boxes"][i]
            xywh = np.stack(
                [boxes[:, 0], boxes[:, 1], boxes[:, 2] - boxes[:, 0],
                 boxes[:, 3] - boxes[:, 1]], axis=1,
            )
            for k in range(len(xywh)):
                if results["scores"][i, k] <= 0:
                    continue
                records.append(
                    {
                        "image_id": int(batch["image_id"][i]),
                        "category_id": int(results["labels"][i, k]),
                        "bbox": [round(float(v), 2) for v in xywh[k]],
                        "score": round(float(results["scores"][i, k]), 5),
                    }
                )
    return records


def train_loop(cfg) -> Dict:
    init_distributed()
    logger = setup_logger(cfg.output_dir or None, process_index=jax.process_index())
    logger.info(f"devices: {jax.devices()}")
    if cfg.output_dir:
        os.makedirs(cfg.output_dir, exist_ok=True)
        Config.from_dict(cfg.to_dict()).dump(
            os.path.join(cfg.output_dir, "config.json")
        )

    mesh = make_mesh(**{k: v for k, v in cfg.mesh_shape.items()})
    place_batch = make_batch_placer(mesh)
    rep = replicated(mesh)
    logger.info(f"mesh: {mesh.shape} · batch sharding {batch_sharding(mesh).spec}")
    pretrained = None
    if cfg.pretrain_model_path:
        import pickle

        from richsem_tpu.utils.checkpoint import guard_converted_checkpoint

        with open(cfg.pretrain_model_path, "rb") as f:
            pretrained = pickle.load(f)
        # converted reference checkpoints must not be silently clamped —
        # may mutate cfg (exact gather path for eval) BEFORE the model is
        # built, or refuse a clamped training run
        guard_converted_checkpoint(cfg, pretrained, logger)
    model, weight_dict, _ = registry.MODEL_REGISTRY["richsem"](cfg)

    train_loader, val_loader, train_ds, val_ds = build_loaders(
        cfg, jax.process_index(), jax.process_count()
    )
    steps_per_epoch = max(len(train_loader), 1)

    # init params on a representative bucket
    bh, bw = cfg.train_canvas_buckets[0]
    rng = jax.random.PRNGKey(cfg.seed)
    init_kw = {}
    if getattr(cfg, "use_clip_visual_query", False):
        # clip_query_proj params only materialize when the CLIP spatial map
        # is present at init — hand init a correctly-shaped dummy (RN50's
        # pre-attnpool map is 2048-d, ViT-B/32's is 768-d; clip/model.py)
        dv = 2048 if cfg.clip_model == "RN50" else 768
        init_kw["clip_features"] = jnp.zeros(
            (1, bh // 32, bw // 32, dv), jnp.float32
        )
    params = jax.jit(model.init, static_argnames=("train",))(
        rng,
        jnp.zeros((1, bh, bw, 3), jnp.float32),
        jnp.zeros((1, bh, bw), bool),
        train=False,
        **init_kw,
    )
    if pretrained is not None:
        from richsem_tpu.utils.checkpoint import load_pretrained_params

        params = load_pretrained_params(
            params, pretrained, cfg.finetune_ignore or []
        )

    # ---- CLIP semantic branch (use_language / use_visual_distill) -------
    text_embed = None
    clip_model = None
    clip_params = None
    if cfg.use_language or cfg.use_visual_distill:
        import pickle

        from richsem_tpu.models.clip import CLIP, CLIPConfig
        from richsem_tpu.models.clip.tokenizer import SimpleTokenizer
        from richsem_tpu.models.clip_align import build_text_embedding

        clip_cfg = (
            CLIPConfig.rn50() if cfg.clip_model == "RN50" else CLIPConfig.vit_b32()
        )
        # the teacher's vision tower follows the training compute dtype
        # (the reference teacher runs fp16, clip/clip.py model.half())
        if getattr(cfg, "compute_dtype", "float32") == "bfloat16":
            import dataclasses as _dc

            import jax.numpy as _jnp

            clip_cfg = _dc.replace(clip_cfg, dtype=_jnp.bfloat16)
        clip_model = CLIP(clip_cfg)
        with open(cfg.clip_checkpoint_path, "rb") as f:
            clip_params = pickle.load(f)
        tokenizer = SimpleTokenizer(cfg.clip_bpe_path)
        cats = {cid: c for cid, c in val_ds.index.cats.items()}
        logger.info(f"building text bank for {len(cats)} categories…")
        text_embed = build_text_embedding(
            clip_model, clip_params, cats, tokenizer
        )
        text_embed = jax.device_put(text_embed, rep)
        clip_params = jax.device_put(clip_params, rep)

    fed_weight = None
    if cfg.use_fed_loss:
        from richsem_tpu.data.coco_api import category_image_counts

        counts = category_image_counts(
            train_ds.index, cfg.num_classes,
            {c: c for c in train_ds.index.cats},
        )
        fed_weight = jax.device_put(jnp.asarray(counts) ** 0.5, rep)

    tx = build_optimizer(params, cfg, steps_per_epoch)
    state = create_train_state(params, tx, use_ema=cfg.use_ema)
    train_step = make_train_step(model, cfg, tx, clip_model=clip_model)

    ckpt: Optional[CheckpointManager] = None
    start_epoch = cfg.start_epoch
    if cfg.output_dir:
        ckpt = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
        latest = ckpt.latest_step()
        if latest is not None:  # auto-resume (main.py:319-349)
            logger.info(f"auto-resuming from step {latest}")
            state = ckpt.restore(state)
            start_epoch = int(latest) // steps_per_epoch
    if cfg.resume and (ckpt is None or ckpt.latest_step() is None):
        # explicit --resume from another run's checkpoint dir (main.py:344-349)
        src = CheckpointManager(cfg.resume)
        step = src.latest_step()
        logger.info(f"resuming from {cfg.resume} step {step}")
        state = src.restore(state)
        start_epoch = int(step) // steps_per_epoch
        src.close()

    # DDP-equivalent placement: params/opt state replicated on every device,
    # batches sharded over the mesh 'data' axis (reference main.py:204-206)
    state = jax.device_put(state, rep)

    if cfg.test:
        res = test_submission(cfg, model, state.params, val_loader, text_embed,
                              clip_model=clip_model, clip_params=clip_params)
        out_path = os.path.join(cfg.output_dir or ".", "results.json")
        with open(out_path, "w") as f:
            json.dump(res, f)
        logger.info(f"wrote {len(res)} detections to {out_path}")
        return {"test": out_path}

    if cfg.eval:
        stats = evaluate(cfg, model, state.params,
                         val_loader, val_ds, text_embed, logger,
                         place_batch=place_batch,
                         clip_model=clip_model, clip_params=clip_params,
                         save_results_dir=(cfg.output_dir or ".")
                         if getattr(cfg, "save_results", False) else None)
        return {"eval": stats}

    best = BestMetricHolder(use_ema=cfg.use_ema)
    log_path = os.path.join(cfg.output_dir, "log.txt") if cfg.output_dir else None
    rng = jax.random.PRNGKey(cfg.seed + jax.process_index())

    for epoch in range(start_epoch, cfg.epochs):
        if cfg.use_ema and epoch == cfg.ema_epoch and cfg.ema_epoch > 0:
            # EMA starts tracking at ema_epoch (util/utils.py ModelEma +
            # main.py:337-342 rebuild semantics)
            state = state.replace(
                ema_params=jax.tree.map(jnp.copy, state.params)
            )
        mlog = MetricLogger(logger=logger)
        t0 = time.time()
        # Per-step NaN abort, delayed by exactly one step so the device read
        # never blocks the in-flight step (reference aborts on the step the
        # NaN appears, engine.py:93-96; here at most ONE poisoned update can
        # land before the abort — vs 49 with a 50-step cadence).
        prev_finite = None
        prev_it = -1
        with jax.set_mesh(mesh):
            placed = prefetch_to_device(train_loader.epoch(epoch), place_batch)
            for it, dev_batch in enumerate(
                mlog.log_every(placed, 50,
                               header=f"Epoch [{epoch}]", total=steps_per_epoch)
            ):
                if fed_weight is not None:
                    dev_batch["fed_weight"] = fed_weight
                # the step folds state.step into the rng in-graph — passing
                # the same base key every step avoids a per-step host-side
                # split program (~50 ms/launch over the axon tunnel)
                state, metrics = train_step(
                    state, dev_batch, rng, text_embed, clip_params
                )
                if prev_finite is not None and not bool(prev_finite):
                    logger.error(f"non-finite loss at epoch {epoch} it {prev_it}")
                    raise FloatingPointError("loss is not finite")
                prev_finite, prev_it = metrics["finite"], it
                if it % 50 == 0:
                    m = jax.device_get(metrics)
                    mlog.update(**{k: float(v) for k, v in m.items()
                                   if k != "finite"})
                if cfg.debug and it >= 15:
                    break
        if prev_finite is not None and not bool(prev_finite):
            logger.error(f"non-finite loss at epoch {epoch} it {prev_it}")
            raise FloatingPointError("loss is not finite")
        epoch_stats = {k: v.global_avg for k, v in mlog.meters.items()}

        if ckpt and ((epoch + 1) % cfg.save_checkpoint_interval == 0
                     or epoch + 1 == cfg.lr_drop):
            ckpt.save(int(state.step), state)

        if (epoch + 1) % cfg.eval_interval == 0:
            stats = evaluate(cfg, model, state.params,
                             val_loader, val_ds, text_embed, logger,
                             place_batch=place_batch,
                             clip_model=clip_model, clip_params=clip_params)
            ap = stats.get("AP", float("nan"))
            if best.update(ap, epoch) and ckpt:
                ckpt.save(int(state.step), state, metrics={"AP": ap})
            if cfg.use_ema and state.ema_params is not None:
                ema_stats = evaluate(
                    cfg, model, state.ema_params,
                    val_loader, val_ds, text_embed, logger,
                    place_batch=place_batch,
                    clip_model=clip_model, clip_params=clip_params,
                )
                best.update(ema_stats.get("AP", float("nan")), epoch, is_ema=True)
                epoch_stats.update({f"ema_{k}": v for k, v in ema_stats.items()})
            epoch_stats.update(stats)

        epoch_stats.update(
            {"epoch": epoch, "train_time_s": round(time.time() - t0, 1)}
        )
        if log_path and jax.process_index() == 0:
            with open(log_path, "a") as f:
                f.write(json.dumps(epoch_stats, default=float) + "\n")

    if ckpt:
        ckpt.close()
    return {"best": best.summary()}


def main() -> None:
    args = get_args_parser().parse_args()
    cfg = load_config(args)
    train_loop(cfg)


if __name__ == "__main__":
    main()
