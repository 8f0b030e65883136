"""Full-composition parity vs the reference PyTorch model (CPU oracle).

The round-1 suite proved layer-level parity (conv/LN/resize/FFT/GELU micro
oracles) and converter key coverage on synthetic schemas. These tests close
the composition gap: the ACTUAL reference network
(/root/reference/twig/model/cod.py, imported via dgtd_tpu.tools.ref_oracle
stubs), random-initialized, its ``state_dict()`` run through
``convert_ckpt full``, grafted into our Flax model — and the end-to-end
forwards compared within float tolerance at the recipe's 384² resolution
(the reference hard-codes 384 in MessagePassing, cod.py:1186, so no smaller
oracle size exists).

If ANY of the ~40 key-map rules or any module's semantics drift, these fail.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from dgtd_tpu.tools.ref_oracle import load_reference_cod, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_model():
    ref = load_reference_cod()
    torch.manual_seed(0)
    m = ref.cod()
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(ref_model):
    from dgtd_tpu.tools.convert_ckpt import convert_state_dict

    state = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    flat, skipped = convert_state_dict(state, "full")
    return state, flat, skipped


# Reference modules that are registered but never called in the forward path
# (PARITY.md known-deltas): ChannelAttention/SpatialAttention (cod.py:703-704,
# forward use commented out at cod.py:760-762), the prompt_encoder ``adaptor``
# conv (declared cod.py:1251, its only use commented out at cod.py:1303), and
# the BN num_batches_tracked counters (torch bookkeeping, not a parameter of
# the function).
_DEAD_PREFIXES = ("hitnet.ca.", "hitnet.sa.", "hitnet.backbone.prompt_encoder.adaptor.")
_DEAD_SUFFIXES = ("num_batches_tracked",)


def test_converter_skipped_keys_are_exactly_the_dead_modules(converted):
    """Every skipped reference key is knowingly dead — nothing silent."""
    state, flat, skipped = converted
    unexplained = [
        k
        for k in skipped
        if not k.startswith(_DEAD_PREFIXES) and not k.endswith(_DEAD_SUFFIXES)
    ]
    assert unexplained == [], unexplained
    # and the dead set is actually present in the reference schema (the test
    # would silently weaken if the reference dropped these modules)
    assert any(k.startswith("hitnet.ca.") for k in state)


def test_converter_covers_every_flax_leaf(converted):
    """Every leaf of our model tree is filled by the torch checkpoint."""
    from dgtd_tpu.models import cod
    from dgtd_tpu.train.hooks import graft_flat_params

    _, flat, _ = converted
    model = cod(dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda r: model.net.init(
            {"params": r},
            jnp.zeros((1, 384, 384, 3)),
            jnp.zeros((1, 384, 384, 1)),
            train=False,
        ),
        jax.random.PRNGKey(0),
    )
    # shape-only leaves: graft matches on path+shape, values irrelevant here
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    _, loaded_p, missed_p = graft_flat_params(variables["params"], flat)
    assert missed_p == [], missed_p
    _, loaded_s, missed_s = graft_flat_params(
        variables["batch_stats"], flat, prefix="batch_stats/"
    )
    assert missed_s == [], missed_s
    # nothing converted that the model cannot accept
    consumed = set(loaded_p) | {"batch_stats/" + k for k in loaded_s}
    produced = set(flat)
    assert produced == consumed, sorted(produced - consumed)[:10]


def test_miou_matches_reference_oracle():
    """Our meanIntersectionOverUnion reproduces twig/metric/mIOU.py:32-58
    (softmax->argmax multi-class path, zero-diagonal classes count as 0,
    gt*255 clamp) including the per-batch averaging of process()."""
    from dgtd_tpu.metrics.evaluators import meanIntersectionOverUnion
    from dgtd_tpu.tools.ref_oracle import load_reference_module

    ref = load_reference_module("twig/metric/mIOU.py")
    metric_ref = ref.meanIntersectionOverUnion()
    num_classes = 5
    rng = np.random.RandomState(0)
    ours = meanIntersectionOverUnion(num_classes=num_classes)
    for _ in range(3):
        logits = rng.randn(2, num_classes, 16, 16).astype(np.float32)
        # gt as the reference expects: float map whose *255 is a class id
        gt = rng.randint(0, num_classes + 2, size=(2, 1, 16, 16)).astype(np.float32) / 255.0
        metric_ref.process(None, (torch.from_numpy(logits), torch.from_numpy(gt)))
        ours.process(logits.transpose(0, 2, 3, 1), gt.transpose(0, 2, 3, 1))
    expect = float(metric_ref.compute_metrics(metric_ref.results)["mIOU"])
    got = ours.compute()["COD/mIoU"]
    assert abs(expect - got) < 1e-6, (expect, got)


@pytest.mark.slow
def test_full_forward_matches_torch_oracle_384(ref_model, converted):
    from dgtd_tpu.models import cod
    from dgtd_tpu.train.hooks import graft_flat_params

    _, flat, _ = converted
    model = cod(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), (1, 384, 384, 3))
    params, _, missed_p = graft_flat_params(variables["params"], flat)
    assert missed_p == []
    bstats, _, missed_s = graft_flat_params(
        variables["batch_stats"], flat, prefix="batch_stats/"
    )
    assert missed_s == []
    variables = {"params": params, "batch_stats": bstats}

    rng = np.random.RandomState(1)
    image = rng.randn(1, 384, 384, 3).astype(np.float32)
    depth = rng.rand(1, 384, 384, 1).astype(np.float32)

    with torch.no_grad():
        emb_t, stages_t, pred2_t = ref_model.hitnet(
            torch.from_numpy(image.transpose(0, 3, 1, 2)),
            torch.from_numpy(depth.transpose(0, 3, 1, 2)),
        )

    texture, stage_preds, pred2 = jax.jit(model.tensor)(
        variables, jnp.asarray(image), jnp.asarray(depth)
    )

    def check(t_ncwh, ours, name, atol):
        a = t_ncwh.numpy().transpose(0, 2, 3, 1)
        b = np.asarray(ours)
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max())
        assert err <= atol * scale, (name, err, scale)

    check(emb_t, texture, "texture", 2e-4)
    for i in range(4):
        check(stages_t[i], stage_preds[i], f"stage{i}", 1e-3)
    check(pred2_t, pred2, "pred2", 1e-3)


@pytest.mark.slow
def test_baseline_forward_matches_torch_oracle_384():
    """Composition parity for the SECOND model family: the reference
    ``baseline`` (twig/model/baseline.py) random-init -> convert -> graft ->
    our ``baseline`` tensor forward. Pins the variant's real semantics: a
    pure-HitNet forward whose constructed diffusion modules are never called
    (prompt injection commented out at baseline.py:1436-1473) — this test is
    what caught the round-1 build injecting prompts here."""
    from dgtd_tpu.models import baseline
    from dgtd_tpu.tools.convert_ckpt import convert_state_dict
    from dgtd_tpu.tools.ref_oracle import load_reference_module
    from dgtd_tpu.train.hooks import graft_flat_params

    ref = load_reference_module("twig/model/baseline.py")
    torch.manual_seed(0)
    ref_model = ref.baseline().eval()
    state = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    flat, skipped = convert_state_dict(state, "full")
    unexplained = [
        k
        for k in skipped
        if not k.startswith(_DEAD_PREFIXES) and not k.endswith(_DEAD_SUFFIXES)
    ]
    assert unexplained == [], unexplained

    model = baseline(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), (1, 384, 384, 3))
    params, _, missed_p = graft_flat_params(variables["params"], flat)
    assert missed_p == []
    bstats, _, missed_s = graft_flat_params(
        variables["batch_stats"], flat, prefix="batch_stats/"
    )
    assert missed_s == []
    variables = {"params": params, "batch_stats": bstats}

    rng = np.random.RandomState(2)
    image = rng.randn(1, 384, 384, 3).astype(np.float32)
    depth = rng.rand(1, 384, 384, 1).astype(np.float32)

    with torch.no_grad():
        emb_t, stages_t, pred2_t = ref_model.hitnet(
            torch.from_numpy(image.transpose(0, 3, 1, 2)),
            torch.from_numpy(depth.transpose(0, 3, 1, 2)),
        )

    texture, stage_preds, pred2 = jax.jit(model.tensor)(
        variables, jnp.asarray(image), jnp.asarray(depth)
    )

    def check(t_ncwh, ours, name, atol):
        a = t_ncwh.numpy().transpose(0, 2, 3, 1)
        b = np.asarray(ours)
        scale = max(1.0, float(np.abs(a).max()))
        err = float(np.abs(a - b).max())
        assert err <= atol * scale, (name, err, scale)

    # the reference baseline never calls its prompt encoder: its
    # forward_features returns (None, outs) (baseline.py:1436-1486) — ours
    # mirrors that with inject_prompts=False
    assert emb_t is None and texture is None
    for i in range(4):
        check(stages_t[i], stage_preds[i], f"stage{i}", 1e-3)
    check(pred2_t, pred2, "pred2", 1e-3)


def test_reference_dqnet_forward_is_stale():
    """Pin the PARITY.md claim that DQnet's divergence is FORCED: the
    reference Depth_prompt.forward references an undefined ``prompt``
    (dqnet.py:1062 — its assignment is commented out at :1061), and that
    module IS in the forward path (called from forward_features at
    dqnet.py:1198). The reference model cannot run; ours restores the
    evident intent (models/dqnet.py docstring)."""
    from dgtd_tpu.tools.ref_oracle import load_reference_module

    ref = load_reference_module("twig/model/dqnet.py")
    torch.manual_seed(0)
    m = ref.DQnet().eval()
    x = torch.zeros(1, 3, 384, 384)
    d = torch.zeros(1, 1, 384, 384)
    with pytest.raises(NameError, match="prompt"), torch.no_grad():
        m.hitnet(x, d)
