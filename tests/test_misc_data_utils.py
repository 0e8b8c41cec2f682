"""Side data utilities: TSV dataset, SSD random crop, local staging
(reference datasets/dataset.py, random_crop.py, data_util.py)."""

import base64
import io
import os
import zipfile

import numpy as np
import pytest

from richsem_tpu.data.misc_utils import (
    TsvFile,
    prepare_local_dataset,
    ssd_random_crop,
    tsv_records,
    tsv_row_to_record,
)


def _png_bytes(color):
    from PIL import Image

    img = Image.new("RGB", (8, 6), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def tsv_path(tmp_path):
    rows = []
    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        b64 = base64.b64encode(_png_bytes(color)).decode()
        rows.append(f"img{i}\t{i * 10}\t{b64}")
    p = tmp_path / "data.tsv"
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_tsv_random_access(tsv_path):
    tsv = TsvFile(tsv_path)
    assert len(tsv) == 3
    assert os.path.exists(os.path.splitext(tsv_path)[0] + ".lineidx")
    row2 = tsv.seek(2)  # out-of-order access via lineidx
    row0 = tsv.seek(0)
    assert row2[0] == "img2" and int(row2[1]) == 20
    assert row0[0] == "img0" and int(row0[1]) == 0
    rec = tsv_row_to_record(row2, label_map={20: 7})
    assert rec["image"].shape == (6, 8, 3)
    assert rec["labels"].tolist() == [7]
    np.testing.assert_allclose(rec["boxes"], [[0.5, 0.5, 1.0, 1.0]])
    assert rec["is_extra"]
    tsv.close()


def test_tsv_records_iterates_and_unmapped_is_unlabeled(tsv_path):
    recs = list(tsv_records(tsv_path, label_map={0: 3}))
    assert len(recs) == 3
    assert recs[0]["labels"].tolist() == [3]
    # classes 10/20 unmapped -> unlabeled whole image (lvis.py:210-215)
    assert recs[1]["labels"].size == 0 and recs[1]["boxes"].shape == (0, 4)


def test_tsv_lineidx_rebuilt_when_missing(tsv_path):
    TsvFile(tsv_path)  # builds sidecar
    idx = os.path.splitext(tsv_path)[0] + ".lineidx"
    os.remove(idx)
    tsv = TsvFile(tsv_path)
    assert len(tsv) == 3 and os.path.exists(idx)
    tsv.close()


def test_ssd_random_crop_protocol():
    rng = np.random.default_rng(0)
    image = np.arange(120 * 160 * 3, dtype=np.uint8).reshape(120, 160, 3)
    boxes = np.asarray(
        [[10, 10, 60, 60], [100, 70, 150, 110], [70, 40, 90, 80]], np.float32
    )
    labels = np.asarray([1, 2, 3])
    kept_any_crop = False
    for seed in range(30):
        rng = np.random.default_rng(seed)
        img2, b2, l2 = ssd_random_crop(image, boxes, labels, rng)
        h2, w2 = img2.shape[:2]
        assert len(b2) == len(l2) >= 1
        # boxes clipped inside the crop
        assert (b2[:, 0] >= 0).all() and (b2[:, 1] >= 0).all()
        assert (b2[:, 2] <= w2).all() and (b2[:, 3] <= h2).all()
        assert (b2[:, 2] > b2[:, 0]).all() and (b2[:, 3] > b2[:, 1]).all()
        # surviving labels are a subset
        assert set(l2.tolist()) <= {1, 2, 3}
        if img2.shape != image.shape:
            kept_any_crop = True
            assert h2 >= 0.3 * 120 - 1 and w2 >= 0.3 * 160 - 1
    assert kept_any_crop  # at least one seed actually cropped


def test_prepare_local_dataset(tmp_path):
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    (src_dir / "ann.json").write_text("{}")
    ztmp = src_dir / "images.zip"
    with zipfile.ZipFile(ztmp, "w") as zf:
        zf.writestr("images/0001.jpg", b"jpegbytes")
    local = tmp_path / "local"
    calls = []
    copied = prepare_local_dataset(
        {"ann": str(local / "ann.json"), "imgs": str(local / "images")},
        {"ann": str(src_dir / "ann.json"), "imgs": str(ztmp)},
        is_main_process=True, barrier=lambda: calls.append(1),
    )
    assert (local / "ann.json").read_text() == "{}"
    assert (local / "images" / "0001.jpg").read_bytes() == b"jpegbytes"
    assert calls == [1]
    assert str(local / "ann.json") in copied
    # second run: existing targets are skipped
    again = prepare_local_dataset(
        {"ann": str(local / "ann.json")},
        {"ann": str(src_dir / "ann.json")},
    )
    assert again is None
    # non-main process copies nothing but hits the barrier
    none = prepare_local_dataset(
        {"x": str(local / "never")}, {"x": str(src_dir / "ann.json")},
        is_main_process=False, barrier=lambda: calls.append(2),
    )
    assert none is None and not (local / "never").exists() and calls[-1] == 2
