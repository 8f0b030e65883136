"""The exact ``script/test.sh`` user journey, end-to-end (VERDICT r1 #10).

Builds a COD-shaped folder fixture on disk, runs ``scripts/test.sh`` (the
reference's eval entry: sod.yml + -m val) in a fresh CPU subprocess with
tiny-model overrides, and asserts:
  * one JSON metrics line with the recipe's evaluator keys;
  * the five reference PNG dumps per image with reference naming
    (cod.py:156-217: <name>_input/_label/_output/_diffusion/_depth.png).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fixture(root, n=2, size=96):
    rng = np.random.RandomState(0)
    for sub in ("RGB", "GT", "Depth"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        name = f"fix_{i}.png"
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        m = ((((xx - size // 2) ** 2 + (yy - size // 3 - 9 * i) ** 2) < (size // 5) ** 2)).astype(np.uint8) * 255
        d = (m * 0.7 + rng.rand(size, size) * 60).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "RGB", name))
        Image.fromarray(m).save(os.path.join(root, "GT", name))
        Image.fromarray(d).save(os.path.join(root, "Depth", name))


@pytest.mark.slow
def test_testsh_journey(tmp_path):
    data = tmp_path / "njud"
    _make_fixture(str(data))
    work = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    cmd = [
        "bash",
        "scripts/test.sh",
        "-o", f"work_dir={work}",
        "-o", "input_size=64",
        "-o", f"val_dataloader.dataset.data_dir={data}/",
        "-o", "val_dataloader.dataset.depth_dir=Depth",
        "-o", "val_dataloader.dataset.image_size=64",
        "-o", "val_dataloader.batch_size=2",
        "-o", "model.variant=tiny",
        "-o", "model.convnext_dims=[8,16,32,64]",
        "-o", "model.convnext_depths=[1,1,1,1]",
        "-o", "model.channel=8",
        "-o", "model.latent_dim=8",
        "-o", "model.grid=8",
        "-o", "model.refine_iters=1",
        "-o", "save_visualizations=true",
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=840
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # the metrics JSON line (reference test.sh prints the evaluator dict)
    metric_lines = [
        json.loads(l)
        for l in proc.stdout.splitlines()
        if l.startswith("{") and "Smeasure" in l
    ]
    assert metric_lines, proc.stdout[-3000:]
    metrics = metric_lines[-1]
    for key in ("COD/Emeasure", "COD/Fmeasure", "COD/Smeasure", "COD/MAE"):
        assert key in metrics and np.isfinite(metrics[key]), metrics

    # five reference-named dumps per image (SOD_TEST raw=path -> real names)
    vis = work / "visualizations"
    for i in range(2):
        for kind in ("input", "label", "output", "diffusion", "depth"):
            p = vis / f"fix_{i}_{kind}.png"
            assert p.exists(), sorted(os.listdir(vis))
    # and the dumps decode as images of the eval resolution
    with Image.open(vis / "fix_0_output.png") as im:
        assert im.size == (64, 64)
