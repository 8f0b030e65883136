"""docs/BENCHMARK.md smoke (round-3 VERDICT #5): the documented
one-command-per-dataset benchmark recipe, driven end to end on a synthetic
COD-shaped fixture with a saved checkpoint — exactly the command shape a
user with real benchmark data + a converted `.pth` would run (reference
story: script/test.sh:1), shrunk to tiny-model overrides for CPU.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL_OVERRIDES = [
    "-o", "model.variant=tiny",
    "-o", "model.convnext_dims=[8,16,32,64]",
    "-o", "model.convnext_depths=[1,1,1,1]",
    "-o", "model.channel=8",
    "-o", "model.latent_dim=8",
    "-o", "model.grid=8",
    "-o", "model.refine_iters=1",
]


def _make_cod_fixture(root, n=3, size=80):
    """COD benchmark layout: Image/ + GT/ + Depth_popnet/ (datasets.py)."""
    rng = np.random.RandomState(7)
    for sub in ("Image", "GT", "Depth_popnet"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        m = (
            ((xx - size // 2) ** 2 + (yy - size // 3 - 7 * i) ** 2)
            < (size // 5) ** 2
        ).astype(np.uint8) * 255
        d = (m * 0.6 + rng.rand(size, size) * 80).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, "Image", f"bm_{i}.png"))
        Image.fromarray(m).save(os.path.join(root, "GT", f"bm_{i}.png"))
        Image.fromarray(d).save(os.path.join(root, "Depth_popnet", f"bm_{i}.png"))


def _save_tiny_ckpt(path):
    """An npz checkpoint for the SAME tiny model the CLI overrides build."""
    import jax
    import jax.numpy as jnp

    from dgtd_tpu.core.config import load_config
    from dgtd_tpu.core.registry import MODELS
    from dgtd_tpu.train.hooks import flatten_tree

    cfg = load_config(
        os.path.join(REPO, "configs", "cod.yml"),
        [o for o in TINY_MODEL_OVERRIDES if o != "-o"],
    )
    model = MODELS.build(dict(cfg["model"]), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(5), (1, 64, 64, 3))
    flat = flatten_tree(
        {
            "params": jax.device_get(variables["params"]),
            "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        }
    )
    np.savez(path, **flat)


def _run_documented_command(data, work, ckpt, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    cmd = [
        sys.executable, "test.py", "configs/cod.yml", "--fp32",
        "-o", f"work_dir={work}",
        # the documented per-dataset block (BENCHMARK.md §1), CPU-shrunk
        "-o", "val_dataloader.dataset.type=COD_TEST",
        "-o", f"val_dataloader.dataset.data_dir={data}/",
        "-o", "val_dataloader.dataset.depth_dir=Depth_popnet",
        "-o", "input_size=64",
        "-o", "val_dataloader.dataset.image_size=64",
        "-o", "val_dataloader.batch_size=3",
        "-o", f"custom_hooks.0.val_ckpt={ckpt}",
        *TINY_MODEL_OVERRIDES,
        *extra,
    ]
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=840
    )


@pytest.mark.slow
def test_benchmark_runbook_command(tmp_path):
    data = tmp_path / "CAMO"
    _make_cod_fixture(str(data))
    ckpt = str(tmp_path / "ckpt.npz")
    _save_tiny_ckpt(ckpt)

    proc = _run_documented_command(data, tmp_path / "out", ckpt)
    assert proc.returncode == 0, proc.stderr[-3000:]

    # the checkpoint was actually restored before val
    log = [json.loads(l) for l in open(tmp_path / "out" / "log.jsonl")]
    assert any(r.get("restored") == ckpt for r in log), log

    # one JSON line with the full benchmark-table metric set
    metric_lines = [
        json.loads(l)
        for l in proc.stdout.splitlines()
        if l.startswith("{") and "Smeasure" in l
    ]
    assert metric_lines, proc.stdout[-3000:]
    metrics = metric_lines[-1]
    for key in ("COD/Emeasure", "COD/Fmeasure", "COD/Smeasure", "COD/MAE"):
        assert key in metrics and np.isfinite(metrics[key]), metrics


@pytest.mark.slow
def test_benchmark_runbook_rejects_missing_ckpt(tmp_path):
    """A typo'd val_ckpt must fail loudly — silently benchmarking random
    weights is the worst possible failure mode for a benchmark run."""
    data = tmp_path / "CAMO"
    _make_cod_fixture(str(data), n=1)
    proc = _run_documented_command(
        data, tmp_path / "out", str(tmp_path / "no_such_ckpt.npz")
    )
    assert proc.returncode != 0
    assert "val_ckpt does not exist" in proc.stderr


@pytest.mark.slow
def test_benchmark_runbook_704_bucket(tmp_path):
    """VERDICT r3 #4: the CAMO/CHAMELEON/NC4K resolution bucket — the
    documented command's ``input_size=704`` — end to end: decode → resize
    704² → jitted predict at the second jit bucket → metrics (tiny model for
    the CPU compile). NOTE the reference itself CANNOT run this bucket: its
    MessagePassing pins img_size=384 (cod.py:1252) and the torch model
    crashes on the 704² tensors its own camo_test.py:14 produces
    ('size of tensor a (384) must match ... b (704)' — PARITY.md delta 15),
    so this is our-capability coverage, not a torch-parity seam."""
    data = tmp_path / "CAMO"
    _make_cod_fixture(str(data), n=2, size=120)
    ckpt = str(tmp_path / "ckpt.npz")
    _save_tiny_ckpt(ckpt)

    proc = _run_documented_command(
        data,
        tmp_path / "out",
        ckpt,
        extra=(
            "-o", "input_size=704",
            "-o", "val_dataloader.dataset.image_size=704",
            "-o", "val_dataloader.batch_size=2",
        ),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metric_lines = [
        json.loads(l)
        for l in proc.stdout.splitlines()
        if l.startswith("{") and "Smeasure" in l
    ]
    assert metric_lines, proc.stdout[-3000:]
    metrics = metric_lines[-1]
    for key in ("COD/Emeasure", "COD/Fmeasure", "COD/Smeasure", "COD/MAE"):
        assert key in metrics and np.isfinite(metrics[key]), metrics


@pytest.mark.slow
def test_bench_table_collator(tmp_path):
    """tools/bench_table: one checkpoint load, N datasets, one table — the
    collated form of BENCHMARK.md's per-dataset commands."""
    import jax.numpy as jnp

    from dgtd_tpu.tools.bench_table import format_markdown, run_table

    cod_dir = tmp_path / "CAMO"
    _make_cod_fixture(str(cod_dir), n=2)
    # SOD-shaped sibling (RGB/ + GT/ + Depth/)
    sod_dir = tmp_path / "NJU2K"
    rng = np.random.RandomState(3)
    for sub in ("RGB", "GT", "Depth"):
        os.makedirs(sod_dir / sub)
    for i in range(2):
        img = (rng.rand(72, 72, 3) * 255).astype(np.uint8)
        m = (rng.rand(72, 72) > 0.6).astype(np.uint8) * 255
        Image.fromarray(img).save(sod_dir / "RGB" / f"s{i}.png")
        Image.fromarray(m).save(sod_dir / "GT" / f"s{i}.png")
        Image.fromarray(m).save(sod_dir / "Depth" / f"s{i}.png")

    ckpt = str(tmp_path / "ckpt.npz")
    _save_tiny_ckpt(ckpt)

    overrides = [o for o in TINY_MODEL_OVERRIDES if o != "-o"] + [
        "input_size=64",
        f"work_dir={tmp_path / 'wd'}",
    ]
    rows = run_table(
        os.path.join(REPO, "configs", "cod.yml"),
        ckpt,
        [f"COD_TEST:{cod_dir}", f"SOD_TEST:{sod_dir}:Depth"],
        batch_size=2,
        overrides=overrides,
        dtype=jnp.float32,
        image_size=64,
    )
    assert len(rows) == 2
    for name, res in rows.items():
        for key in ("COD/Emeasure", "COD/Fmeasure", "COD/Smeasure", "COD/MAE"):
            assert key in res and np.isfinite(res[key]), (name, res)
    md = format_markdown(rows)
    assert "Smeasure" in md and md.count("|") > 10
