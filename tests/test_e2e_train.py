"""End-to-end slice: synthetic LVIS-format data → train → checkpoint → eval.

The integration test the reference lacks (SURVEY.md §4): exercises datasets,
transforms, RFS sampling, the loader, CDN, the model, matching, the full
criterion, the optimizer, orbax checkpointing, auto-resume and the LVIS
evaluator in one pass on tiny shapes.
"""

import json
import os

import cv2
import numpy as np
import pytest

from richsem_tpu.config import Config


def _make_synthetic_lvis(root: str, n: int = 8):
    img_dir = os.path.join(root, "coco", "train2017")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "lvis_v1"), exist_ok=True)
    rng = np.random.default_rng(0)
    images, anns = [], []
    aid = 1
    for i in range(n):
        h, w = int(rng.integers(80, 120)), int(rng.integers(80, 140))
        img = np.full((h, w, 3), 90, np.uint8)
        for _ in range(int(rng.integers(1, 3))):
            bw, bh = int(rng.integers(20, w // 2)), int(rng.integers(20, h // 2))
            x, y = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
            cat = int(rng.integers(1, 4))
            color = [(255, 60, 60), (60, 255, 60), (60, 60, 255)][cat - 1]
            cv2.rectangle(img, (x, y), (x + bw, y + bh), color, -1)
            anns.append(
                dict(id=aid, image_id=i, category_id=cat, bbox=[x, y, bw, bh],
                     area=bw * bh, iscrowd=0)
            )
            aid += 1
        fn = f"train2017/{i:06d}.jpg"
        cv2.imwrite(os.path.join(root, "coco", fn), img[:, :, ::-1])
        images.append(
            dict(id=i, coco_url=f"http://x/{fn}", width=w, height=h,
                 neg_category_ids=[], not_exhaustive_category_ids=[])
        )
    cats = [
        dict(id=c, name=f"cat{c}", frequency=["r", "c", "f"][c - 1], image_count=c * 5)
        for c in (1, 2, 3)
    ]
    ds = dict(images=images, annotations=anns, categories=cats)
    for split in ("train", "val"):
        with open(os.path.join(root, "lvis_v1", f"lvis_v1_{split}.json"), "w") as f:
            json.dump(ds, f)


@pytest.mark.slow
def test_train_eval_resume(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax

    from __graft_entry__ import _tiny_cfg_dict
    import richsem_tpu.train.main as main_mod
    from richsem_tpu.train.main import train_loop

    # spy on the batch placer: every train/eval batch must be sharded over
    # the mesh 'data' axis, one shard per device (DDP-equivalent layout)
    placed_specs = []
    real_placer_factory = main_mod.make_batch_placer

    def spying_factory(mesh):
        place = real_placer_factory(mesh)

        def spy(batch):
            out = place(batch)
            img = out["images"]
            placed_specs.append(img.sharding.spec)
            assert img.sharding.spec[0] == "data"
            assert len(img.addressable_shards) == jax.device_count()
            per_dev = img.addressable_shards[0].data.shape[0]
            assert per_dev == img.shape[0] // jax.device_count()
            return out

        return spy

    monkeypatch.setattr(main_mod, "make_batch_placer", spying_factory)

    root = str(tmp_path / "data")
    _make_synthetic_lvis(root, n=16)
    cfg = _tiny_cfg_dict(
        num_classes=4, dn_labelbook_size=4, dn_number=4,
        hidden_dim=32, nheads=4, enc_layers=1, dec_layers=2,
        dim_feedforward=64, num_queries=12,
        dataset_file="lvis", data_root=root,
        data_aug_scales=[72, 96], data_aug_max_size=128,
        data_aug_scales2_resize=[80], data_aug_scales2_crop=[64, 100],
        train_canvas_buckets=[[128, 128]], eval_canvas=[128, 128],
        size_divisibility=32, max_gt_per_image=6, batch_size=1,  # ×8 virtual devices → global batch 8
        use_rfs=True, rfs_repeat_sh=0.001, use_cas=False, use_imagenet=False,
        lvis_drop_ratio=0.0, epochs=1, save_checkpoint_interval=1,
        eval_interval=1, output_dir=str(tmp_path / "out"), resume="",
        pretrain_model_path="", finetune_ignore=None, eval=False, test=False,
        debug=False, seed=0, start_epoch=0,
        mesh_shape={"data": -1, "model": 1}, use_checkpoint=False,
        num_select=5, fed_num_sample_cats=3,
    )
    out = train_loop(cfg)
    assert "best" in out
    assert placed_specs, "train_loop never placed a batch on the mesh"
    # checkpoint written
    assert (tmp_path / "out" / "ckpt").exists()
    # log line written with train + eval stats
    log = (tmp_path / "out" / "log.txt").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "loss" in rec and "AP" in rec and np.isfinite(rec["loss"])

    # auto-resume: nothing left to train, returns immediately
    out2 = train_loop(cfg)
    assert "best" in out2


@pytest.mark.slow
def test_optmatcher_mesh_step():
    """OptMatcher (simOTA many-to-one) under GSPMD: one DP train step over
    the 8-device mesh compiles and executes (VERDICT r2 next #4)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_cfg_dict
    from richsem_tpu.models.dino import DINO, DINOConfig
    from richsem_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from richsem_tpu.train.engine import create_train_state, make_train_step
    from richsem_tpu.train.optim import build_optimizer

    n = jax.device_count()
    cfg = _tiny_cfg_dict(matcher_type="OptMatcher")
    mesh = make_mesh(data=n, model=1)
    model = DINO(DINOConfig.from_config(cfg))

    b, h, w, g = n, 64, 64, 5
    rng_np = np.random.default_rng(0)
    images = jnp.asarray(rng_np.uniform(-1, 1, (b, h, w, 3)), jnp.float32)
    pad_mask = jnp.zeros((b, h, w), bool)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images, pad_mask, train=False
    )
    tx = build_optimizer(params, cfg, steps_per_epoch=10)
    state = create_train_state(params, tx)
    batch = {
        "images": images,
        "pad_mask": pad_mask,
        "labels": jnp.asarray(rng_np.integers(0, 24, (b, g)), jnp.int32),
        "boxes": jnp.asarray(
            np.clip(rng_np.uniform(0.2, 0.6, (b, g, 4)), 0.05, 0.95),
            jnp.float32,
        ),
        "valid": jnp.asarray(rng_np.uniform(size=(b, g)) > 0.4),
        "is_extra": jnp.zeros((b,), bool),
    }
    with jax.set_mesh(mesh):
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
        state = jax.device_put(state, rep)
        train_step = make_train_step(model, cfg, tx)
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
