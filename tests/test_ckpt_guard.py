"""Converted reference checkpoints vs the offset clamp (VERDICT r3 weak #3).

The reference's sampling_offsets head is unbounded
(ops/modules/ms_deform_attn.py:95-100); richsem_tpu's windowed encoder
kernels clamp offsets to ±(margin−0.5). ``tools/convert_detector.py`` tags
its pickles with ``meta.unbounded_offsets`` and
``guard_converted_checkpoint`` must force the exact gather path for eval or
loudly refuse a clamped training run.
"""

import numpy as np
import pytest

from richsem_tpu.config import Config
from richsem_tpu.utils.checkpoint import guard_converted_checkpoint

TAGGED = {"params": {}, "meta": {"source": "reference_torch_checkpoint",
                                 "unbounded_offsets": True}}


def _cfg(**over):
    base = dict(
        msda_impl="pallas2", msda_clamp_offsets=True, eval=False, test=False,
    )
    base.update(over)
    return Config.from_dict(base)


def test_eval_forces_exact_path():
    cfg = _cfg(eval=True)
    guard_converted_checkpoint(cfg, TAGGED)
    assert cfg.msda_impl == "gather"
    assert cfg.msda_clamp_offsets is False


def test_test_mode_forces_exact_path():
    cfg = _cfg(test=True)
    guard_converted_checkpoint(cfg, TAGGED)
    assert cfg.msda_impl == "gather"


def test_training_refused_without_opt_in():
    cfg = _cfg()
    with pytest.raises(ValueError, match="bounded-offset"):
        guard_converted_checkpoint(cfg, TAGGED)


def test_training_opt_in_keeps_config():
    cfg = _cfg(allow_clamp_on_converted=True)
    guard_converted_checkpoint(cfg, TAGGED)
    assert cfg.msda_impl == "pallas2"  # explicit opt-in: untouched


def test_exact_config_passes_untouched():
    cfg = _cfg(msda_impl="gather", msda_clamp_offsets=False)
    guard_converted_checkpoint(cfg, TAGGED)
    assert cfg.msda_impl == "gather"


def test_clamp_flag_inert_without_windowed_kernel():
    # the clamp only applies inside the windowed-kernel branch; with
    # msda_impl='gather' the flag is a no-op, so training from a converted
    # checkpoint must NOT be refused (ADVICE r4 #1)
    cfg = _cfg(msda_impl="gather", msda_clamp_offsets=True)
    guard_converted_checkpoint(cfg, TAGGED)  # must not raise
    assert cfg.msda_impl == "gather"
    cfg = _cfg(msda_impl="sep", msda_clamp_offsets=True)
    guard_converted_checkpoint(cfg, TAGGED)
    assert cfg.msda_impl == "sep"


def test_untagged_pickle_untouched():
    cfg = _cfg(eval=True)
    guard_converted_checkpoint(cfg, {"params": {}})
    assert cfg.msda_impl == "pallas2"
    assert cfg.msda_clamp_offsets is True


def test_converter_writes_tag(tmp_path, monkeypatch):
    # convert_detector.main output carries the meta tag end-to-end (the
    # param mapping itself is covered by tests/test_reference_parity.py)
    import pickle
    import sys

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/repo")
    import tools.convert_detector as cd

    monkeypatch.setattr(
        cd, "convert_detector", lambda sd, **kw: {"level_embed": np.zeros(4)}
    )
    src = tmp_path / "ref.pth"
    torch.save({"model": {"transformer.level_embed": torch.zeros(4)}}, src)
    dst = tmp_path / "out.pkl"
    monkeypatch.setattr(sys, "argv", ["x", str(src), str(dst)])
    cd.main()
    with open(dst, "rb") as f:
        out = pickle.load(f)
    assert out["meta"]["unbounded_offsets"] is True
