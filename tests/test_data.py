"""Data-layer tests: transforms, samplers, collate, multi-dataset loader."""

import random

import numpy as np

from richsem_tpu.data import transforms as T
from richsem_tpu.data.loader import DataLoader, MultiDatasetLoader, collate, pick_bucket
from richsem_tpu.data.samplers import (
    ClassAwareSampler,
    RepeatFactorSampler,
    ShuffleSampler,
)


def _record(h=100, w=150, n=2):
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "boxes": np.asarray([[10, 20, 60, 80], [50, 10, 140, 90]], np.float32)[:n],
        "labels": np.arange(n, dtype=np.int64),
        "area": np.asarray([50.0 * 60, 90.0 * 80], np.float32)[:n],
        "iscrowd": np.zeros(n, np.int64),
        "image_id": 7,
        "orig_size": (h, w),
    }


def test_hflip_boxes():
    r = T.hflip(_record())
    np.testing.assert_allclose(r["boxes"][0], [150 - 60, 20, 150 - 10, 80])


def test_resize_shortest_side_and_max():
    r = T.resize(_record(), 200, max_size=250)
    h, w = r["size"]
    # shortest side would be 200 → longer 300 > 250 → capped
    assert w == 250 and h == int(round(250 * 100 / 150)) or h <= 250
    assert r["image"].shape[:2] == (h, w)
    # boxes scale with the image
    np.testing.assert_allclose(
        r["boxes"][0],
        np.asarray([10, 20, 60, 80]) * [w / 150, h / 100, w / 150, h / 100],
        rtol=1e-5,
    )


def test_crop_clamps_and_drops():
    r = T.crop(_record(), 10, 40, 60, 60)  # region excludes most of box 0
    # box0 [10,20,60,80] - left40,top10 → [-30,10,20,70] → clamp [0,10,20,60]
    np.testing.assert_allclose(r["boxes"][0], [0, 10, 20, 60])
    # all boxes intersecting survive; fully-outside would drop
    r2 = T.crop(_record(n=1), 90, 140, 10, 10)
    assert len(r2["boxes"]) == 0


def test_normalize_cxcywh():
    r = T.normalize(_record())
    b = r["boxes"][0]
    np.testing.assert_allclose(b, [35 / 150, 50 / 100, 50 / 150, 60 / 100], rtol=1e-5)
    assert r["image"].dtype == np.float32


def test_train_transform_pipeline():
    tf = T.make_train_transform([480, 512], 1333, [400, 500], (384, 600))
    rng = random.Random(0)
    for _ in range(5):
        r = tf(_record(h=500, w=700), rng)
        h, w = r["size"]
        assert max(h, w) <= 1333
        assert r["image"].shape[:2] == (h, w)
        if len(r["boxes"]):
            assert (r["boxes"] >= 0).all() and (r["boxes"] <= 1).all()


def test_rfs_oversamples_rare():
    # 100 images of class 0, 1 image of class 1
    cats = [[0]] * 100 + [[1]]
    s = RepeatFactorSampler(cats, num_classes=2, repeat_thresh=0.1)
    idx = s.epoch_indices(0)
    counts = np.bincount(idx, minlength=101)
    # rare image repeated ~sqrt(0.1/(1/101)) ≈ 3.2×
    assert counts[100] >= 2
    assert counts[:100].max() == 1


def test_rfs_sharding_partitions():
    cats = [[0]] * 50
    parts = [
        set(RepeatFactorSampler(cats, 1, shard_id=i, num_shards=2, seed=3).epoch_indices(0))
        for i in range(2)
    ]
    all_idx = RepeatFactorSampler(cats, 1, seed=3).epoch_indices(0)
    assert parts[0] | parts[1] == set(all_idx)


def test_class_aware_sampler_balance():
    cats = [[0]] * 99 + [[1]]
    s = ClassAwareSampler(cats, 2, epoch_length=1000)
    idx = s.epoch_indices(0)
    frac_rare = (idx == 99).mean()
    # inverse-frequency weighting: rare class prob = 1/(1 + 1/99) ≈ 0.99
    assert frac_rare > 0.9


def test_pick_bucket_and_collate():
    buckets = [(896, 1344), (1344, 896), (1120, 1120)]
    assert pick_bucket([(800, 1333)], buckets) == (896, 1344)
    assert pick_bucket([(1333, 800)], buckets) == (1344, 896)
    assert pick_bucket([(900, 900)], buckets) == (1120, 1120)
    recs = [T.normalize(_record()), T.normalize(_record(h=90, w=120))]
    batch = collate(recs, [(128, 160)], max_gt=5)
    assert batch["images"].shape == (2, 128, 160, 3)
    assert batch["valid"][:, :2].all() and not batch["valid"][:, 2:].any()
    assert not batch["pad_mask"][0, :100, :150].any()
    assert batch["pad_mask"][0, 100:, :].all()


class _SyntheticDataset:
    def __init__(self, n, is_extra=False):
        self.n = n
        self.is_extra = is_extra

    def __len__(self):
        return self.n

    def get(self, i, rng):
        r = _record(h=64 + (i % 3) * 8, w=80)
        r["image_id"] = i
        r["is_extra"] = self.is_extra
        return T.normalize(r)


def test_loader_iterates_and_prefetches():
    ds = _SyntheticDataset(10)
    loader = DataLoader(
        ds, ShuffleSampler(10), batch_size=2, buckets=[(96, 96)], max_gt=4,
        num_threads=2,
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 5
    ids = sorted(int(i) for b in batches for i in b["image_id"])
    assert ids == list(range(10))


def test_multi_dataset_interleave():
    main = DataLoader(
        _SyntheticDataset(6), ShuffleSampler(6), 2, [(96, 96)], 4, num_threads=1
    )
    sub = DataLoader(
        _SyntheticDataset(2, is_extra=True), ShuffleSampler(2), 2, [(96, 96)], 4,
        num_threads=1,
    )
    multi = MultiDatasetLoader(main, sub, main_weight=1, sub_weight=1)
    batches = list(multi.epoch(0))
    flags = [bool(b["is_extra"][0]) for b in batches]
    # alternating main/sub, ends when main exhausts (3 main batches)
    assert flags[:2] == [False, True]
    assert sum(not f for f in flags) == 3


def test_mask_transforms():
    from richsem_tpu.data.datasets import _polygons_to_mask

    m = _polygons_to_mask([[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14)
    assert m.shape == (12, 14)
    assert m[4, 5] and not m[0, 0]
    rec = _record()
    rec["masks"] = np.stack([m[:10, :15] if False else np.pad(m, ((0,88),(0,136)))[:100,:150]]*2)
    flipped = T.hflip(rec)
    assert flipped["masks"].shape == rec["masks"].shape
    resized = T.resize(rec, 50)
    assert resized["masks"].shape[1:] == resized["image"].shape[:2]
    cropped = T.crop(rec, 0, 0, 60, 80)
    assert cropped["masks"].shape[1:] == (60, 80)
