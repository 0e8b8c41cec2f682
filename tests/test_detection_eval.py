"""Evaluator tests against hand-computed AP values."""

import numpy as np

from richsem_tpu.data.evaluation import DetectionEvaluator


def _gt(box, cat=1, area=None, crowd=0):
    x0, y0, x1, y1 = box
    return {
        "bbox": list(box),
        "category_id": cat,
        "area": area if area is not None else (x1 - x0) * (y1 - y0),
        "iscrowd": crowd,
    }


def _pred(boxes, scores, labels):
    return {
        "boxes": np.asarray(boxes, np.float64),
        "scores": np.asarray(scores, np.float64),
        "labels": np.asarray(labels, np.int64),
    }


def test_perfect_detection_ap1():
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([10, 10, 50, 50]), _gt([60, 60, 90, 90])])
    ev.update({1: _pred([[10, 10, 50, 50], [60, 60, 90, 90]], [0.9, 0.8], [1, 1])})
    s = ev.summarize()
    assert s["AP"] == 1.0 and s["AP50"] == 1.0 and s["AP75"] == 1.0


def test_missed_detection_half_recall():
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([10, 10, 50, 50]), _gt([60, 60, 90, 90])])
    ev.update({1: _pred([[10, 10, 50, 50]], [0.9], [1])})
    s = ev.summarize()
    # recall caps at 0.5, precision 1 → 101-pt AP = 51/101
    np.testing.assert_allclose(s["AP50"], 51 / 101, atol=1e-6)


def test_fp_before_tp():
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([10, 10, 50, 50])])
    # higher-scored FP far away, then a perfect TP
    ev.update(
        {1: _pred([[200, 200, 240, 240], [10, 10, 50, 50]], [0.9, 0.8], [1, 1])}
    )
    s = ev.summarize()
    # precision at recall>0: 1/2 (TP arrives second) → AP50 = 0.5
    np.testing.assert_allclose(s["AP50"], 0.5, atol=1e-6)


def test_localization_threshold():
    """IoU ≈ 0.58 counts at 0.5 but not at 0.75."""
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([0, 0, 100, 100])])
    ev.update({1: _pred([[0, 0, 100, 73]], [0.9], [1])})  # IoU = 0.73
    s = ev.summarize()
    assert s["AP50"] == 1.0
    assert s["AP75"] == 0.0


def test_wrong_class_is_fp_and_unlabeled_cat_ignored():
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([10, 10, 50, 50], cat=1)])
    ev.update({1: _pred([[10, 10, 50, 50]], [0.9], [2])})
    s = ev.summarize()
    assert s["AP"] == 0.0


def test_crowd_gt_ignored():
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([10, 10, 50, 50]), _gt([100, 100, 200, 200], crowd=1)])
    # det inside the crowd region: matched to crowd → ignored, not FP
    ev.update(
        {1: _pred([[10, 10, 50, 50], [120, 120, 180, 180]], [0.9, 0.8], [1, 1])}
    )
    s = ev.summarize()
    assert s["AP50"] == 1.0


def test_lvis_federated_ignore():
    """Dets on images where the category is unverified don't count as FP."""
    ev = DetectionEvaluator(mode="lvis", cat_frequencies={1: "r"})
    ev.add_gt(1, [_gt([10, 10, 50, 50])], {"neg_category_ids": []})
    ev.add_gt(2, [], {"neg_category_ids": []})  # cat 1 unverified here
    ev.update(
        {
            1: _pred([[10, 10, 50, 50]], [0.8], [1]),
            2: _pred([[0, 0, 40, 40]], [0.9], [1]),  # would be a FP in COCO
        }
    )
    s = ev.summarize()
    assert s["AP"] == 1.0
    assert s["APr"] == 1.0

    # same but the image verifies cat 1 absent → now a real FP
    ev2 = DetectionEvaluator(mode="lvis", cat_frequencies={1: "r"})
    ev2.add_gt(1, [_gt([10, 10, 50, 50])], {"neg_category_ids": []})
    ev2.add_gt(2, [], {"neg_category_ids": [1]})
    ev2.update(
        {
            1: _pred([[10, 10, 50, 50]], [0.8], [1]),
            2: _pred([[0, 0, 40, 40]], [0.9], [1]),
        }
    )
    s2 = ev2.summarize()
    assert s2["AP50"] == 0.5


def test_lvis_not_exhaustive_unmatched_ignored():
    ev = DetectionEvaluator(mode="lvis", cat_frequencies={1: "f"})
    ev.add_gt(
        1,
        [_gt([10, 10, 50, 50])],
        {"neg_category_ids": [], "not_exhaustive_category_ids": [1]},
    )
    # second det doesn't match any gt, but cat is not-exhaustive → ignored
    ev.update(
        {1: _pred([[10, 10, 50, 50], [100, 100, 140, 140]], [0.8, 0.9], [1, 1])}
    )
    s = ev.summarize()
    assert s["AP50"] == 1.0


def test_area_bands():
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([0, 0, 20, 20]), _gt([100, 100, 300, 300])])  # small, large
    ev.update(
        {1: _pred([[0, 0, 20, 20], [100, 100, 300, 300]], [0.9, 0.8], [1, 1])}
    )
    s = ev.summarize()
    assert s["APs"] == 1.0 and s["APl"] == 1.0
    assert np.isnan(s["APm"])


def test_frequency_band_grouping():
    ev = DetectionEvaluator(mode="lvis", cat_frequencies={1: "r", 2: "f"})
    ev.add_gt(
        1,
        [_gt([10, 10, 50, 50], cat=1), _gt([60, 60, 90, 90], cat=2)],
        {"neg_category_ids": []},
    )
    # cat 1 perfect, cat 2 missed
    ev.update({1: _pred([[10, 10, 50, 50]], [0.9], [1])})
    s = ev.summarize()
    assert s["APr"] == 1.0
    assert s["APf"] == 0.0
    np.testing.assert_allclose(s["AP"], 0.5, atol=1e-6)


def test_coco_ar_at_k():
    """AR@1 counts only the single best det per image-category."""
    ev = DetectionEvaluator(mode="coco")
    ev.add_gt(1, [_gt([0, 0, 10, 10]), _gt([20, 20, 30, 30])])
    # two perfect dets; the second is lower-scored
    ev.update(
        {1: _pred([[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [1, 1])}
    )
    s = ev.summarize()
    assert abs(s["AR@1"] - 0.5) < 1e-6   # only one det allowed
    assert abs(s["AR@10"] - 1.0) < 1e-6
