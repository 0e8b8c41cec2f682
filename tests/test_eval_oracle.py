"""Randomized agreement test: DetectionEvaluator vs a brute-force oracle.

`richsem_tpu/data/evaluation/detection_eval.py` re-implements the
pycocotools / lvis-api protocol from scratch (the image has neither
package), and every AP-parity claim routes through it.  The fixture tests
in test_detection_eval.py pin hand-constructed corner cases; this file adds
an INDEPENDENT implementation of the same protocol — no vectorization, no
cumsum/searchsorted tricks, no relevant-image pruning, plain Python loops
straight from the published semantics (pycocotools cocoeval.evaluateImg /
accumulate; datasets/coco_eval.py:221-270, datasets/lvis_eval.py:47-237) —
and drives both on hundreds of randomized instances, score ties included.

Protocol notes encoded here (shared by both implementations, per the
pycocotools source):
  * detections sorted by score descending, stable (mergesort);
  * per (image, category, threshold): greedy best-IoU match over gts,
    crowd gts matchable many times (IoA), ignored gts only matchable after
    all non-ignored are exhausted (gts pre-sorted ignored-last, scan
    breaks at the first ignored gt once a non-ignored match is held);
  * matched-to-ignored dets are ignored; unmatched dets outside the area
    range are ignored; LVIS also ignores dets of federated-unverified
    categories and unmatched dets of not-exhaustive categories;
  * 101-point interpolated AP over categories present in GT; COCO AR@k
    re-caps each image-category's det list at k before pooling.
"""

from __future__ import annotations

import numpy as np
import pytest

from richsem_tpu.data.evaluation.detection_eval import (
    AREA_RNG,
    IOU_THRS,
    REC_THRS,
    DetectionEvaluator,
)


# ---------------------------------------------------------------- oracle
def _iou_single(det, gt, crowd):
    ax0, ay0, ax1, ay1 = det
    bx0, by0, bx1, by1 = gt
    iw = min(ax1, bx1) - max(ax0, bx0)
    ih = min(ay1, by1) - max(ay0, by0)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    a_area = (ax1 - ax0) * (ay1 - ay0)
    if crowd:
        union = a_area
    else:
        union = a_area + (bx1 - bx0) * (by1 - by0) - inter
    return inter / max(union, 1e-12)


def _oracle_img_cat(gts, dts, cat, thr, area_rng, mode, img_info, max_dets):
    """→ list of (score, matched, ignored) for one (img, cat, thr, area)."""
    lo, hi = area_rng
    g = [x for x in gts if x["category_id"] == cat]
    d = [x for x in dts if x["category_id"] == cat and x["score"] > -1e-9]
    d = sorted(d, key=lambda x: -x["score"])  # python sort is stable
    d = d[:max_dets]

    if mode == "lvis":
        neg = set(img_info.get("neg_category_ids", []))
        not_exh = set(img_info.get("not_exhaustive_category_ids", []))
        if len(g) == 0 and cat not in neg:
            return [(x["score"], False, True) for x in d], 0
        ignore_unmatched = cat in not_exh
    else:
        ignore_unmatched = False

    g_ignore = [
        bool(x.get("iscrowd", 0)) or x["area"] < lo or x["area"] > hi
        for x in g
    ]
    # pycocotools sorts gts ignored-last (stable)
    order = sorted(range(len(g)), key=lambda i: g_ignore[i])
    g = [g[i] for i in order]
    g_ignore = [g_ignore[i] for i in order]

    gt_matched = [False] * len(g)
    rows = []
    for det in d:
        best = -1
        best_iou = min(thr, 1 - 1e-10)
        for gi, gt in enumerate(g):
            if gt_matched[gi] and not gt.get("iscrowd", 0):
                continue
            if best >= 0 and not g_ignore[best] and g_ignore[gi]:
                break
            iou = _iou_single(det["bbox"], gt["bbox"], gt.get("iscrowd", 0))
            if iou < best_iou:
                continue
            best_iou = iou
            best = gi
        if best >= 0:
            gt_matched[best] = True
            matched = not g_ignore[best]
            ignored = g_ignore[best]
        else:
            matched = False
            b = det["bbox"]
            d_area = (b[2] - b[0]) * (b[3] - b[1])
            ignored = d_area < lo or d_area > hi or ignore_unmatched
        rows.append((det["score"], matched, ignored))
    n_gt = sum(1 for ig in g_ignore if not ig)
    return rows, n_gt


def _oracle_ap_ar(gt_by_img, dt_by_img, info_by_img, cat, thr, area_name,
                  mode, max_dets, cap=None):
    """Brute-force AP and AR for one (category, threshold, area range)."""
    rows = []
    n_gt = 0
    any_pair = False
    for img_id in sorted(gt_by_img):
        g = gt_by_img[img_id]
        d = dt_by_img.get(img_id, [])
        has_gt = any(x["category_id"] == cat for x in g)
        has_dt = any(
            x["category_id"] == cat and x["score"] > -1e-9 for x in d
        )
        if not has_gt and not has_dt:
            continue
        if mode == "lvis" and not has_gt:
            neg = set(info_by_img[img_id].get("neg_category_ids", []))
            if cat not in neg and not has_dt:
                continue
        r, n = _oracle_img_cat(
            g, d, cat, thr, AREA_RNG[area_name], mode,
            info_by_img.get(img_id, {}), max_dets,
        )
        if cap is not None:
            r = r[:cap]
        if not (r or n):
            continue
        any_pair = True
        rows.extend(r)
        n_gt += n
    if not any_pair or n_gt == 0:
        return None, None
    # pool: stable sort by -score (ties keep image order)
    rows = sorted(rows, key=lambda x: -x[0])
    rows = [x for x in rows if not x[2]]
    tp = fp = 0
    recs, precs = [], []
    for _, matched, _ in rows:
        if matched:
            tp += 1
        else:
            fp += 1
        recs.append(tp / n_gt)
        precs.append(tp / (tp + fp))
    if not rows:
        return 0.0, 0.0
    # no-cleverness 101-point interpolation: precision at recall >= r is
    # the max precision over all positions with recall >= r
    ap = 0.0
    for r in REC_THRS:
        best = 0.0
        for rec, prec in zip(recs, precs):
            # exact >= (searchsorted semantics): both sides are the same
            # float64 values in both implementations
            if rec >= r:
                best = max(best, prec)
        ap += best / len(REC_THRS)
    return ap, recs[-1]


def oracle_summarize(gt_by_img, dt_by_img, info_by_img, mode, max_dets,
                     cat_frequencies=None):
    cats = sorted(
        {g["category_id"] for anns in gt_by_img.values() for g in anns}
    )

    def mean(vals):
        vals = [v for v in vals if v is not None and not np.isnan(v)]
        return float(np.mean(vals)) if vals else float("nan")

    def ap_grid(area, cap=None, want_ar=False):
        per_cat = []
        for c in cats:
            aps, ars = [], []
            for thr in IOU_THRS:
                ap, ar = _oracle_ap_ar(
                    gt_by_img, dt_by_img, info_by_img, c, thr, area, mode,
                    max_dets, cap=cap,
                )
                aps.append(ap)
                ars.append(ar)
            if all(a is None for a in aps):
                per_cat.append(None)
            else:
                per_cat.append(
                    [np.nan if a is None else a
                     for a in (ars if want_ar else aps)]
                )
        return per_cat

    all_ap = ap_grid("all")
    stats = {
        "AP": mean([np.nanmean(x) for x in all_ap if x is not None]),
        "AP50": mean([x[0] for x in all_ap if x is not None]),
        "AP75": mean([x[5] for x in all_ap if x is not None]),
    }
    for area in ("small", "medium", "large"):
        g = ap_grid(area)
        stats[f"AP{area[0]}"] = mean(
            [np.nanmean(x) for x in g if x is not None]
        )
    if mode == "lvis":
        freq = cat_frequencies or {}
        for band, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
            rows = [
                np.nanmean(all_ap[i])
                for i, c in enumerate(cats)
                if freq.get(c) == band and all_ap[i] is not None
            ]
            stats[key] = mean(rows)
    else:
        for k in (1, 10, 100):
            g = ap_grid("all", cap=k, want_ar=True)
            stats[f"AR@{k}"] = mean(
                [np.nanmean(x) for x in g if x is not None]
            )
    return stats


# ------------------------------------------------------------ generators
def _rand_case(rng, mode):
    n_imgs = rng.integers(1, 4)
    n_cats = rng.integers(1, 4)
    cats = list(range(1, n_cats + 1))
    gt_by_img, dt_by_img, info_by_img = {}, {}, {}
    for img_id in range(n_imgs):
        anns = []
        for _ in range(rng.integers(0, 5)):
            x, y = rng.uniform(0, 60, 2)
            w, h = rng.uniform(4, 80, 2)
            anns.append({
                "bbox": [x, y, x + w, y + h],
                "category_id": int(rng.choice(cats)),
                "area": float(w * h),
                # crowd only meaningful in coco mode (lvis has none)
                "iscrowd": int(rng.random() < 0.2) if mode == "coco" else 0,
            })
        gt_by_img[img_id] = anns
        dts = []
        for _ in range(rng.integers(0, 9)):
            # jitter around a gt box half the time → realistic IoU spread
            if anns and rng.random() < 0.5:
                src = anns[rng.integers(0, len(anns))]["bbox"]
                jit = rng.uniform(-10, 10, 4)
                bb = [src[0] + jit[0], src[1] + jit[1],
                      src[2] + jit[2], src[3] + jit[3]]
                bb = [min(bb[0], bb[2] - 1), min(bb[1], bb[3] - 1),
                      max(bb[2], bb[0] + 1), max(bb[3], bb[1] + 1)]
            else:
                x, y = rng.uniform(0, 60, 2)
                w, h = rng.uniform(4, 80, 2)
                bb = [x, y, x + w, y + h]
            dts.append({
                "bbox": bb,
                "category_id": int(rng.choice(cats)),
                # quantized scores force ties across dets and images
                "score": float(rng.integers(1, 6) / 5.0),
            })
        dt_by_img[img_id] = dts
        if mode == "lvis":
            info_by_img[img_id] = {
                "neg_category_ids":
                    [c for c in cats if rng.random() < 0.4],
                "not_exhaustive_category_ids":
                    [c for c in cats if rng.random() < 0.3],
            }
        else:
            info_by_img[img_id] = {}
    return gt_by_img, dt_by_img, info_by_img, cats


def _run_evaluator(gt_by_img, dt_by_img, info_by_img, mode, max_dets, freqs):
    ev = DetectionEvaluator(
        mode=mode, max_dets=max_dets, cat_frequencies=freqs
    )
    for img_id, anns in gt_by_img.items():
        ev.add_gt(img_id, anns, info_by_img.get(img_id))
    preds = {}
    for img_id, dts in dt_by_img.items():
        preds[img_id] = {
            "scores": np.asarray([d["score"] for d in dts], np.float64),
            "labels": np.asarray(
                [d["category_id"] for d in dts], np.int64
            ),
            "boxes": np.asarray(
                [d["bbox"] for d in dts], np.float64
            ).reshape(-1, 4),
        }
    ev.update(preds)
    return ev.summarize()


@pytest.mark.parametrize("mode", ["coco", "lvis"])
def test_randomized_agreement(mode):
    rng = np.random.default_rng(0 if mode == "coco" else 1)
    max_dets = 5  # small cap so maxDets truncation is exercised
    n_cases = 110
    for case in range(n_cases):
        gt_by_img, dt_by_img, info_by_img, cats = _rand_case(rng, mode)
        freqs = (
            {c: ["r", "c", "f"][c % 3] for c in cats}
            if mode == "lvis" else {}
        )
        got = _run_evaluator(
            gt_by_img, dt_by_img, info_by_img, mode, max_dets, freqs
        )
        want = oracle_summarize(
            gt_by_img, dt_by_img, info_by_img, mode, max_dets,
            cat_frequencies=freqs,
        )
        for key, w in want.items():
            gv = got[key]
            if np.isnan(w):
                assert np.isnan(gv), (case, key, gv, w)
            else:
                assert abs(gv - w) < 1e-6, (case, key, gv, w)


def test_score_tie_stability():
    """All-equal scores: pooling must keep image order (stable mergesort) —
    a sharp fixture on top of the randomized sweep."""
    gt_by_img = {
        0: [{"bbox": [0, 0, 10, 10], "category_id": 1, "area": 100.0,
             "iscrowd": 0}],
        1: [{"bbox": [0, 0, 10, 10], "category_id": 1, "area": 100.0,
             "iscrowd": 0}],
    }
    dt_by_img = {
        0: [{"bbox": [20, 20, 30, 30], "category_id": 1, "score": 0.5}],
        1: [{"bbox": [0, 0, 10, 10], "category_id": 1, "score": 0.5}],
    }
    info = {0: {}, 1: {}}
    got = _run_evaluator(gt_by_img, dt_by_img, info, "coco", 100, {})
    want = oracle_summarize(gt_by_img, dt_by_img, info, "coco", 100)
    assert abs(got["AP"] - want["AP"]) < 1e-9
