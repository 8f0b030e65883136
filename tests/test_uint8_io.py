"""uint8-ingest pipeline: ship post-resize uint8, normalize on device.

The reference normalizes host-side in torchvision transforms
(cod10k_camo_train.py:32-38); the TPU-native split ships bytes and fuses the
normalize into the first conv (data/device_norm.py). These tests pin:
  * the device-side math == the host normalization it replaces,
  * dataset ``uint8_io`` output == the float pipeline (to quantization),
  * jitted eval/train steps accept either dtype and agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgtd_tpu.data.datasets import IMAGENET_MEAN, IMAGENET_STD, FolderSODDataset
from dgtd_tpu.data.device_norm import normalize_batch, normalize_image, scale_plane


def test_device_norm_matches_host_normalization():
    rng = np.random.RandomState(0)
    u8 = (rng.rand(4, 8, 8, 3) * 255).astype(np.uint8)
    got = np.asarray(normalize_image(jnp.asarray(u8)))
    want = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # float passes through untouched (bit-exact)
    f = want.astype(np.float32)
    np.testing.assert_array_equal(np.asarray(normalize_image(jnp.asarray(f))), f)

    plane = (rng.rand(4, 8, 8, 1) * 255).astype(np.uint8)
    np.testing.assert_allclose(
        np.asarray(scale_plane(jnp.asarray(plane))), plane / 255.0, rtol=1e-6
    )

    batch = {"input": jnp.asarray(u8), "depth": jnp.asarray(plane),
             "label": jnp.asarray(plane), "raw": ["a"]}
    out = normalize_batch(batch)
    assert out["input"].dtype == jnp.float32
    assert out["depth"].dtype == jnp.float32
    assert out["raw"] == ["a"]


def _folder_fixture(tmp_path, n=3, hw=(41, 29)):
    from PIL import Image

    rng = np.random.RandomState(1)
    for sub in ("Imgs", "GT", "Depth"):
        (tmp_path / sub).mkdir()
    for i in range(n):
        Image.fromarray((rng.rand(*hw, 3) * 255).astype(np.uint8)).save(
            tmp_path / "Imgs" / f"x{i}.jpg", quality=95
        )
        Image.fromarray(((rng.rand(*hw) > 0.5) * 255).astype(np.uint8)).save(
            tmp_path / "GT" / f"x{i}.png"
        )
        Image.fromarray((rng.rand(*hw) * 255).astype(np.uint8)).save(
            tmp_path / "Depth" / f"x{i}.png"
        )
    return str(tmp_path)


@pytest.mark.parametrize("pipeline", ["pil", "native"])
def test_dataset_uint8_io_matches_float_pipeline(tmp_path, pipeline):
    if pipeline == "native":
        from dgtd_tpu.native import pixelops

        if not pixelops.available():
            pytest.skip("no native toolchain")

    class DS(FolderSODDataset):
        image_subdir = "Imgs"
        size = 32

    kw = dict(data_dir=_folder_fixture(tmp_path), depth_dir="Depth", split="test",
              pipeline=pipeline)
    ds_f = DS(**kw)
    ds_u = DS(**kw, uint8_io=True)
    assert len(ds_f) == len(ds_u) == 3
    for i in range(len(ds_f)):
        f, u = ds_f[i], ds_u[i]
        for k in ("input", "label", "depth"):
            assert u[k].dtype == np.uint8, k
        # device-normalized u8 == host-normalized float, to u8 quantization
        # (PIL resizes in uint8 domain so the pil path is exact; the native
        # float path carries fractional values the u8 path rounds)
        atol = (1.5 / 255.0) / min(IMAGENET_STD) if pipeline == "native" else 1e-6
        got_in = np.asarray(normalize_image(jnp.asarray(u["input"])))
        np.testing.assert_allclose(got_in, f["input"], atol=atol)
        for k in ("label", "depth"):
            np.testing.assert_allclose(
                u[k].astype(np.float32) / 255.0, f[k], atol=1.5 / 255.0
            )
        # raw contract: resized image, flipped in lockstep with input
        # (uint8 here; no rng in this loop so no flip either way)
        assert u["raw"].dtype == np.uint8 and u["raw"].shape == (32, 32, 3)


def test_eval_and_train_steps_accept_uint8():
    """The jitted entry points re-specialize on dtype: uint8 batches produce
    the same numbers as pre-normalized float batches."""
    from types import SimpleNamespace

    from dgtd_tpu.train.state import make_eval_step

    calls = {}

    def predict(variables, image, depth):
        calls["dtypes"] = (image.dtype, depth.dtype)
        return image.sum() + depth.sum(), {}

    model = SimpleNamespace(predict=predict)
    step = make_eval_step(model)

    rng = np.random.RandomState(2)
    img_u8 = (rng.rand(1, 4, 4, 3) * 255).astype(np.uint8)
    dep_u8 = (rng.rand(1, 4, 4, 1) * 255).astype(np.uint8)
    out_u8 = step({}, jnp.asarray(img_u8), jnp.asarray(dep_u8))
    img_f = (img_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    dep_f = dep_u8.astype(np.float32) / 255.0
    out_f = step({}, jnp.asarray(img_f), jnp.asarray(dep_f))
    np.testing.assert_allclose(float(out_u8), float(out_f), rtol=1e-5)
    assert calls["dtypes"] == (jnp.float32, jnp.float32)


def test_synthetic_dataset_uint8_io_matches_float():
    """SyntheticSODDataset's uint8_io path must agree with its float path
    after device normalization, to quantization tolerance (the combined
    bf16_state + uint8_io convergence runs rely on this)."""
    from dgtd_tpu.data.datasets import SyntheticSODDataset
    from dgtd_tpu.data.device_norm import normalize_batch

    f = SyntheticSODDataset(n=3, size=24)
    u = SyntheticSODDataset(n=3, size=24, uint8_io=True)
    for i in range(3):
        sf, su = f.get(i), u.get(i)
        assert su["input"].dtype == np.uint8 and su["label"].dtype == np.uint8
        nb = normalize_batch({k: jnp.asarray(v) for k, v in su.items() if k != "raw"})
        # uint8 quantization: 1/255 on the [0,1] plane; /std on the image
        np.testing.assert_allclose(np.asarray(nb["input"]), sf["input"], atol=0.5 / 255 / 0.224)
        np.testing.assert_allclose(np.asarray(nb["label"]), sf["label"], atol=0.5 / 255)
        np.testing.assert_allclose(np.asarray(nb["depth"]), sf["depth"], atol=0.5 / 255)
