"""AOT serving-bundle export: round-trip + loader semantics.

The exported StableHLO artifact must reproduce the live model's predict
exactly (same weights, same backend), and ``ServingModel`` must handle
non-bucket input sizes by resize-to-bucket + resize-back.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgtd_tpu.core.registry import MODELS

# module fixture compiles the tiny model 3× (export lowering, live predict,
# deserialized call) — minutes of CPU compile
pytestmark = pytest.mark.slow
from dgtd_tpu.tools.export_serving import ServingModel, export_bundle

TINY = dict(
    variant="tiny",
    convnext_dims=(8, 16, 32, 64),
    convnext_depths=(1, 1, 1, 1),
    channel=8,
    latent_dim=8,
    grid=8,
    refine_iters=1,
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bundle"))
    model = MODELS.build({"type": "cod", "dtype": jnp.float32, **TINY})
    variables = model.init(jax.random.PRNGKey(0), (1, 48, 48, 3))
    meta = export_bundle(model, variables, out, sizes=[48], meta_extra={"model": "cod"})
    return out, model, variables, meta


def test_bundle_files_and_meta(bundle):
    out, _, _, meta = bundle
    assert sorted(os.listdir(out)) == ["meta.json", "params.npz", "predict_48.hlo"]
    disk_meta = json.load(open(os.path.join(out, "meta.json")))
    assert disk_meta["sizes"] == [48] and disk_meta["model"] == "cod"
    assert disk_meta["format_version"] >= 1


def test_exported_matches_live_model(bundle):
    out, model, variables, _ = bundle
    serving = ServingModel.load(out)
    rng = np.random.RandomState(0)
    image = rng.rand(1, 48, 48, 3).astype(np.float32)
    depth = rng.rand(1, 48, 48, 1).astype(np.float32)
    got = serving(image, depth)
    want, _ = model.predict(variables, jnp.asarray(image), jnp.asarray(depth))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-6)
    assert got.shape == (1, 48, 48, 1)
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_loader_resizes_non_bucket_inputs(bundle):
    out = bundle[0]
    serving = ServingModel.load(out)
    rng = np.random.RandomState(1)
    image = rng.rand(1, 30, 40, 3).astype(np.float32)
    depth = rng.rand(1, 30, 40, 1).astype(np.float32)
    prob = serving(image, depth)
    assert prob.shape == (1, 30, 40, 1)
    assert np.isfinite(prob).all()


def test_checkpoint_graft_covers_batch_stats(bundle, tmp_path):
    """Exporting a checkpoint must graft BN running stats, not just params —
    init stats would silently corrupt served predictions."""
    from dgtd_tpu.tools.export_serving import _load_checkpoint_variables
    from dgtd_tpu.train.hooks import flatten_tree

    _, _, variables, _ = bundle
    trained = {
        "params": jax.tree.map(lambda p: p + 1.0, variables["params"]),
        "batch_stats": jax.tree.map(lambda s: s + 2.0, variables["batch_stats"]),
    }
    ckpt = str(tmp_path / "epoch_1.npz")
    np.savez(ckpt, **{k: np.asarray(v) for k, v in flatten_tree(trained).items()})

    loaded_vars, n = _load_checkpoint_variables(variables, ckpt)
    assert n > 0
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded_vars["batch_stats"])[0]),
        np.asarray(jax.tree.leaves(trained["batch_stats"])[0]),
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded_vars["params"])[0]),
        np.asarray(jax.tree.leaves(trained["params"])[0]),
    )

    # params-only checkpoint (e.g. a backbone pretrain) must refuse loudly
    params_only = {k: v for k, v in flatten_tree({"params": trained["params"]}).items()}
    ckpt2 = str(tmp_path / "params_only.npz")
    np.savez(ckpt2, **{k: np.asarray(v) for k, v in params_only.items()})
    with pytest.raises(ValueError, match="running stats"):
        _load_checkpoint_variables(variables, ckpt2)


def test_checkpoint_graft_convert_ckpt_full_layout(bundle, tmp_path):
    """``convert_ckpt full`` writes BARE param keys + ``batch_stats/``-
    prefixed stats (mixed layout) — the loader must prefix-normalize per
    key, not via an all-or-nothing heuristic (regression caught in review)."""
    from dgtd_tpu.tools.export_serving import _load_checkpoint_variables
    from dgtd_tpu.train.hooks import flatten_tree

    _, _, variables, _ = bundle
    trained_p = jax.tree.map(lambda p: p + 1.0, variables["params"])
    trained_s = jax.tree.map(lambda s: s + 2.0, variables["batch_stats"])
    flat = {k: np.asarray(v) for k, v in flatten_tree(trained_p).items()}  # BARE
    flat.update(
        {f"batch_stats/{k}": np.asarray(v) for k, v in flatten_tree(trained_s).items()}
    )
    ckpt = str(tmp_path / "full_layout.npz")
    np.savez(ckpt, **flat)

    loaded_vars, n = _load_checkpoint_variables(variables, ckpt)
    assert n == len(jax.tree.leaves(variables))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded_vars["params"])[0]),
        np.asarray(jax.tree.leaves(trained_p)[0]),
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded_vars["batch_stats"])[0]),
        np.asarray(jax.tree.leaves(trained_s)[0]),
    )


def test_checkpoint_graft_from_orbax_dir(bundle, tmp_path):
    """The trainer's primary checkpoint format (an orbax directory holding
    the full TrainState) must load directly into the exporter."""
    ocp = pytest.importorskip("orbax.checkpoint")
    from dgtd_tpu.tools.export_serving import _load_checkpoint_variables

    _, _, variables, _ = bundle
    state = {
        "step": np.int32(3),
        "params": jax.device_get(jax.tree.map(lambda p: p + 1.0, variables["params"])),
        "batch_stats": jax.device_get(
            jax.tree.map(lambda s: s + 2.0, variables["batch_stats"])
        ),
        "opt_state": {"count": np.int32(3)},
    }
    path = str(tmp_path / "epoch_3")
    ck = ocp.StandardCheckpointer()
    ck.save(path, state, force=True)
    ck.wait_until_finished()

    loaded_vars, n = _load_checkpoint_variables(variables, path)
    assert n > 0
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded_vars["params"])[0]),
        np.asarray(jax.tree.leaves(state["params"])[0]),
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(loaded_vars["batch_stats"])[0]),
        np.asarray(jax.tree.leaves(state["batch_stats"])[0]),
    )

    # a bare params tree (saved without the collection wrapper) must still
    # graft its params (lenient mode — predict.py's debugging input)
    from dgtd_tpu.train.hooks import load_variables_checkpoint

    bare = str(tmp_path / "bare_params")
    ck.save(bare, state["params"], force=True)
    ck.wait_until_finished()
    vars3, loaded3, _ = load_variables_checkpoint(variables, bare, strict=False)
    assert len(loaded3) == len(jax.tree.leaves(variables["params"]))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(vars3["params"])[0]),
        np.asarray(jax.tree.leaves(state["params"])[0]),
    )


def test_multiplatform_bundle(bundle, tmp_path):
    """platforms=['cpu','tpu'] lowers ONE artifact for both backends; it must
    load and run on the current (CPU) backend. (The same bundle was also
    validated on the real chip — docs/SERVING.md.)"""
    out = str(tmp_path / "multi")
    _, model, variables, _ = bundle
    meta = export_bundle(
        model, variables, out, sizes=[48], platforms=["cpu", "tpu"]
    )
    assert meta["platforms"] == ["cpu", "tpu"]
    serving = ServingModel.load(out)
    rng = np.random.RandomState(2)
    prob = serving(
        rng.rand(1, 48, 48, 3).astype(np.float32), rng.rand(1, 48, 48, 1).astype(np.float32)
    )
    assert prob.shape == (1, 48, 48, 1) and np.isfinite(prob).all()


def test_predict_cli_bundle_mode(bundle, tmp_path):
    """predict.py --bundle: folder inference through the exported bundle,
    masks at native source sizes."""
    import argparse

    from PIL import Image

    import predict as predict_cli
    from dgtd_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (30, 40, 3), np.uint8)).save(img_dir / "a.jpg")
    out_dir = tmp_path / "masks"
    args = argparse.Namespace(
        bundle=bundle[0],
        image_dir=str(img_dir),
        depth_dir=None,
        out_dir=str(out_dir),
    )
    predict_cli._run_bundle(args, Image, IMAGENET_MEAN, IMAGENET_STD)
    with Image.open(out_dir / "a_output.png") as m:
        assert m.size == (40, 30)


def test_loader_needs_no_model_code(bundle):
    """The bundle must rebuild params from the npz alone — identical tree."""
    out, _, variables, _ = bundle
    serving = ServingModel.load(out)
    want_paths = {
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(variables)[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, _ in jax.tree_util.tree_flatten_with_path(serving.variables)[0]
    }
    assert got_paths == want_paths
