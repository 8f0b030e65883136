"""CLI integration: the actual ``train.py`` entry point end-to-end.

Runs the synthetic hardware-smoke recipe with tiny overrides in a fresh
subprocess on CPU (reference launch-UX parity: config + -o overrides + -m)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize pre-imports jax; neutralize it so the env var works
    env["PALLAS_AXON_POOL_IPS"] = ""
    cmd = [
        sys.executable,
        "train.py",
        "configs/synthetic_smoke.yml",
        "--fp32",
        "-o", f"work_dir={tmp_path}",
        "-o", "input_size=48",
        "-o", "train_cfg.max_epochs=1",
        "-o", "train_cfg.val_interval=1",
        "-o", "train_dataloader.dataset.size=48",
        "-o", "train_dataloader.dataset.n=8",
        "-o", "val_dataloader.dataset.size=48",
        "-o", "val_dataloader.dataset.n=4",
        "-o", "model.convnext_dims=[16,32,64,128]",
        "-o", "model.convnext_depths=[1,1,2,1]",
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    log_path = os.path.join(tmp_path, "log.jsonl")
    records = [json.loads(l) for l in open(log_path)]
    assert any("loss" in r for r in records), records
    assert any("COD/Smeasure" in r for r in records), records


def test_set_dotted_creates_list_entries():
    """Integer segments create/extend LISTS (``-o custom_hooks.0.type=...``
    on a recipe with no custom_hooks block — MMEngine/nest override parity)."""
    from dgtd_tpu.core.config import set_dotted

    cfg = {}
    set_dotted(cfg, "custom_hooks.0.type", "our_init")
    set_dotted(cfg, "custom_hooks.0.val_ckpt", "/tmp/x")
    set_dotted(cfg, "custom_hooks.1.type", "ProfilerHook")
    assert cfg == {
        "custom_hooks": [
            {"type": "our_init", "val_ckpt": "/tmp/x"},
            {"type": "ProfilerHook"},
        ]
    }
    # existing lists still index in place
    set_dotted(cfg, "custom_hooks.1.type", "LoggerHook")
    assert cfg["custom_hooks"][1] == {"type": "LoggerHook"}
    # nested list-in-list and plain dict paths unchanged
    set_dotted(cfg, "a.b", 3)
    assert cfg["a"] == {"b": 3}
    # skipping indices must fail loudly, not leave None holes that crash
    # hook construction later with an opaque TypeError
    with pytest.raises(ValueError, match="skips entries"):
        set_dotted({}, "custom_hooks.1.type", "ProfilerHook")
    with pytest.raises(ValueError, match="skips entries"):
        set_dotted({}, "foo.384.bar", "x")
