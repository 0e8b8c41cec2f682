import jax.numpy as jnp
import numpy as np

from richsem_tpu.models.postprocess import postprocess
from richsem_tpu.ops.nms import nms_mask


def test_topk_selection_and_scaling():
    b, nq, c = 1, 6, 4
    logits = np.full((b, nq, c), -10.0, np.float32)
    logits[0, 2, 1] = 3.0  # best
    logits[0, 5, 3] = 2.0  # second
    boxes = np.full((b, nq, 4), 0.5, np.float32)
    boxes[0, 2] = [0.5, 0.5, 0.2, 0.4]
    sizes = jnp.asarray([[200.0, 100.0]])  # (h, w)
    out = postprocess(jnp.asarray(logits), jnp.asarray(boxes), sizes, num_select=3)
    labels = np.asarray(out["labels"])[0]
    assert labels[0] == 1 and labels[1] == 3
    # box of query 2: cxcywh (.5,.5,.2,.4) → xyxy (.4,.3,.6,.7) × (w,h,w,h)
    np.testing.assert_allclose(np.asarray(out["boxes"])[0, 0], [40, 60, 60, 140], rtol=1e-5)
    s = np.asarray(out["scores"])[0]
    assert s[0] > s[1] > s[2]


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 10.5, 10.5], [20, 20, 30, 30]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_mask(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_in_postprocess():
    b, nq, c = 1, 3, 2
    logits = np.full((b, nq, c), -10.0, np.float32)
    logits[0, 0, 0] = 3.0
    logits[0, 1, 0] = 2.0  # heavy overlap with q0
    logits[0, 2, 0] = 1.0  # far away
    boxes = np.asarray(
        [[[0.3, 0.3, 0.2, 0.2], [0.3, 0.3, 0.21, 0.21], [0.8, 0.8, 0.1, 0.1]]],
        np.float32,
    )
    out = postprocess(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray([[100.0, 100.0]]),
        num_select=3, nms_iou_threshold=0.5,
    )
    s = np.asarray(out["scores"])[0]
    assert s[0] > 0 and s[2] > 0 and s[1] == -1.0
