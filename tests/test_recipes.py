"""The shipped recipes actually construct a Runner (datasets on a fixture)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from dgtd_tpu.core.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_fixture(root, image_subdir, depth_dir, n=3):
    for sub in (image_subdir, "GT", depth_dir):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray((rng.rand(40, 50, 3) * 255).astype("uint8")).save(
            os.path.join(root, image_subdir, f"x{i}.jpg")
        )
        Image.fromarray((rng.rand(40, 50) * 255).astype("uint8")).save(
            os.path.join(root, "GT", f"x{i}.png")
        )
        Image.fromarray((rng.rand(40, 50) * 255).astype("uint8")).save(
            os.path.join(root, depth_dir, f"x{i}.png")
        )


@pytest.mark.slow
@pytest.mark.parametrize("recipe,train_sub,val_sub", [("cod.yml", "Imgs", "Image"), ("sod.yml", "RGB", "RGB")])
def test_recipe_builds_runner(tmp_path, recipe, train_sub, val_sub):
    from dgtd_tpu.train.loop import Runner

    train_root = tmp_path / "train"
    val_root = tmp_path / "val"
    depth = "Depth_popnet" if recipe == "cod.yml" else "depth"
    make_fixture(str(train_root), train_sub, depth)
    make_fixture(str(val_root), val_sub, depth)

    overrides = [
        f"train_dataloader.dataset.data_dir={train_root}",
        f"val_dataloader.dataset.data_dir={val_root}",
        "input_size=48",  # keep the CPU model init small
        # shrink model for CPU test speed; recipe structure unchanged
        "model.variant=b0",
        "model.convnext_dims=[16,32,64,128]",
        "model.convnext_depths=[1,1,2,1]",
    ]
    if recipe == "cod.yml":
        overrides.append("val_dataloader.dataset.filter_size_mismatch=True")
        # COD10K_TEST slices [3381:]; fixture has 3 files -> empty but valid
    cfg = load_config(os.path.join(REPO, "configs", recipe), overrides)
    runner = Runner(cfg, work_dir=str(tmp_path / "wd"), dtype=jnp.float32)
    assert runner.train_loader is not None
    assert len(runner.metrics) == 4
    assert any(type(h).__name__ == "our_init" for h in runner.hooks)
    assert runner.max_epochs == (100 if recipe == "cod.yml" else 50)
    # optimizer built with recipe lr-mult custom keys
    assert runner.tx is not None


@pytest.mark.slow
def test_ablation_axes_overrides():
    """The reference's deleted ablation variants are config fields
    (docs/ABLATIONS.md): one compile covers the edge axes — pure_hitnet
    (use_prompts=false) + no_propagation (steps=0) + cod_no_ssim
    (use_ssim=false)."""
    import jax
    import jax.numpy as jnp

    from dgtd_tpu.core.registry import MODELS

    m = MODELS.build(
        {
            "type": "cod",
            "dtype": jnp.float32,
            "use_ssim": False,
            "use_prompts": False,
            "diffusion_steps": 0,
            "variant": "tiny",
            "convnext_dims": [8, 16, 32, 64],
            "convnext_depths": [1, 1, 1, 1],
            "channel": 8,
            "latent_dim": 8,
            "grid": 8,
            "refine_iters": 1,
        }
    )
    assert m.use_ssim is False
    v = m.init(jax.random.PRNGKey(0), (1, 32, 32, 3))
    batch = {
        "input": jnp.zeros((1, 32, 32, 3)),
        "depth": jnp.zeros((1, 32, 32, 1)),
        "label": jnp.zeros((1, 32, 32, 1)),
    }
    loss, (aux, _) = m.loss(v, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert "loss_ssim" not in aux and float(loss) > 0
    # the class default is untouched by the instance override
    assert MODELS.get("cod").use_ssim is True
