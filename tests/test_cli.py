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
    # LARGE numeric segments under a missing NON-list parent are dict keys:
    # override-built numeric blocks (no recipe key to shadow) keep working
    cfg2 = {}
    set_dotted(cfg2, "foo.384.bar", "x")
    assert cfg2 == {"foo": {"384": {"bar": "x"}}}
    # ...but under the schema's KNOWN list-typed keys a skipped index >= 10
    # can never resolve — fail here, not at the consumer (ADVICE r3)
    with pytest.raises(KeyError, match="missing parent"):
        set_dotted({}, "custom_hooks.12.type", "ProfilerHook")
    with pytest.raises(KeyError, match="missing parent"):
        set_dotted({"val_evaluator": None}, "val_evaluator.10.type", "MAE")
    # numeric keys into an EXISTING dict always address the dict
    cfg3 = {"sizes": {"384": {"bs": 4}}}
    set_dotted(cfg3, "sizes.384.bs", 8)
    assert cfg3["sizes"]["384"]["bs"] == 8
    # a non-integer segment addressing an existing list names the key in its
    # error instead of a bare int() ValueError
    with pytest.raises(ValueError, match="must be an integer index"):
        set_dotted({"xs": [1, 2]}, "xs.abc", 3)
    # YAML parses unquoted numeric mapping keys as INTs ({384: ...}); the
    # dotted string segment must resolve to that int key instead of creating
    # a parallel string-keyed subtree (which would be a silent override no-op)
    import yaml

    cfg4 = yaml.safe_load("sizes:\n  384:\n    bs: 4\n")
    assert 384 in cfg4["sizes"]  # int key, as yaml parses it
    set_dotted(cfg4, "sizes.384.bs", 8)
    assert cfg4["sizes"][384]["bs"] == 8 and "384" not in cfg4["sizes"]
    from dgtd_tpu.core.config import get_dotted

    assert get_dotted(cfg4, "sizes.384.bs") == 8


def test_depth_gen_resizes_depth_before_colormap(tmp_path):
    """--render magma + --long-side: the FLOAT depth must be resized back to
    source size before colormapping (advisor r2: bilinear blending of the
    colormapped RGB is not monotonic in the magma_r ramp). Colormap-last
    means every output pixel is an exact palette entry; resize-after-colormap
    produces blended off-ramp colors."""
    import matplotlib
    import numpy as np
    from PIL import Image

    from dgtd_tpu.tools.depth_gen import main

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(30, 40, 3) * 255).astype(np.uint8)).save(img_dir / "a.jpg")
    main([
        "--image-dir", str(img_dir), "--out-dir", str(out_dir),
        "--estimator", "sobel", "--render", "magma", "--long-side", "16",
    ])
    out = np.asarray(Image.open(out_dir / "a_depth.png"))
    assert out.shape == (30, 40, 3)  # resized back to source size
    palette = set(
        map(tuple, matplotlib.colormaps["magma_r"](np.linspace(0, 1, 256), bytes=True)[:, :3])
    )
    pixels = set(map(tuple, out.reshape(-1, 3)))
    off_ramp = pixels - palette
    assert not off_ramp, f"{len(off_ramp)} blended off-palette colors: {sorted(off_ramp)[:5]}"

    # gray render path too: output back at source size
    main([
        "--image-dir", str(img_dir), "--out-dir", str(tmp_path / "gray"),
        "--estimator", "sobel", "--render", "gray", "--long-side", "16",
    ])
    g = np.asarray(Image.open(tmp_path / "gray" / "a_depth.png"))
    assert g.shape == (30, 40)


def test_predict_rejects_mismatched_depth_dir(tmp_path):
    """predict.py pairs depths to images by sorted index — a count mismatch
    must fail loudly instead of silently mispairing (advisor r2)."""
    import pytest as _pytest

    import predict as predict_mod

    depth_dir = tmp_path / "depth"
    os.makedirs(depth_dir)
    (depth_dir / "only_one.png").write_bytes(b"x")
    with _pytest.raises(SystemExit, match="pair to images by sorted order"):
        predict_mod._paired_depth_files(["a.jpg", "b.jpg"], str(depth_dir))
    assert predict_mod._paired_depth_files(["a.jpg"], None) is None


@pytest.mark.slow
def test_predict_cli_checkpoint_journey(tmp_path, monkeypatch):
    """predict.py --checkpoint end to end through the pipelined loop: 5
    images at batch 2 (tail batch + padding), float AND uint8 ingest; both
    modes produce a mask per image and agree to input-quantization noise."""
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    import predict as predict_cli
    from dgtd_tpu.models import cod
    from dgtd_tpu.train.hooks import flatten_tree

    model = cod(
        dtype=jnp.float32, variant="tiny", channel=8, latent_dim=8, grid=8,
        refine_iters=1, convnext_dims=(8, 16, 32, 64), convnext_depths=(1, 1, 1, 1),
    )
    variables = model.init(jax.random.PRNGKey(0), (1, 48, 48, 3))
    ckpt = tmp_path / "ckpt.npz"
    np.savez(
        ckpt,
        **flatten_tree(
            {
                "params": jax.device_get(variables["params"]),
                "batch_stats": jax.device_get(variables.get("batch_stats", {})),
            }
        ),
    )
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    from PIL import Image

    for i in range(5):
        Image.fromarray((rng.rand(60, 70, 3) * 255).astype(np.uint8)).save(
            img_dir / f"p{i}.png"
        )
    outs = {}
    for mode, flag in (("float", []), ("uint8", ["--uint8-io"])):
        out_dir = tmp_path / f"out_{mode}"
        argv = [
            "predict.py", "--checkpoint", str(ckpt), "--image-dir", str(img_dir),
            "--out-dir", str(out_dir), "--size", "48", "--batch", "2", "--fp32",
            *flag,
            "-o", "variant=tiny", "-o", "channel=8", "-o", "latent_dim=8",
            "-o", "grid=8", "-o", "refine_iters=1",
            "-o", "convnext_dims=(8,16,32,64)", "-o", "convnext_depths=(1,1,1,1)",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        predict_cli.main()
        names = sorted(os.listdir(out_dir))
        assert names == [f"p{i}_output.png" for i in range(5)]
        outs[mode] = np.stack(
            [np.asarray(Image.open(out_dir / n), np.float32) / 255.0 for n in names]
        )
    # same masks up to input quantization (<= 0.5/255 on inputs, amplified
    # through the net — generous envelope, but identical would be suspicious)
    assert np.abs(outs["float"] - outs["uint8"]).mean() < 0.05
