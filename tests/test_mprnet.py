"""Shape/behavior tests for the MPRNet-style registered block zoo
(reference cod.py:511-683 — dead surface there, live surface here)."""

import jax
import jax.numpy as jnp
import numpy as np

from dgtd_tpu.core.registry import EXPORTS
from dgtd_tpu.models.mprnet import Decoder, Encoder, ORSNet


def test_registered():
    for name in ("Encoder", "Decoder", "DownSample", "UpSample", "SkipUpSample", "ORB", "ORSNet"):
        assert name in EXPORTS


def test_encoder_decoder_orsnet_shapes():
    n_feat, s_unet, s_ors = 16, 8, 4
    enc = Encoder(scale_unetfeats=s_unet, csff=False)
    x = jnp.ones((1, 32, 32, n_feat))
    ev, evs = jax.jit(lambda v, x: enc.apply(v, x)), enc.init(jax.random.PRNGKey(0), x)
    enc_outs = ev(evs, x)
    assert [tuple(o.shape) for o in enc_outs] == [
        (1, 32, 32, n_feat),
        (1, 16, 16, n_feat + s_unet),
        (1, 8, 8, n_feat + 2 * s_unet),
    ]

    dec = Decoder(scale_unetfeats=s_unet)
    dvs = dec.init(jax.random.PRNGKey(1), enc_outs)
    dec_outs = jax.jit(lambda v, o: dec.apply(v, o))(dvs, enc_outs)
    assert [tuple(o.shape) for o in dec_outs] == [tuple(o.shape) for o in enc_outs]

    # csff variant consumes the previous stage's enc/dec features
    enc2 = Encoder(scale_unetfeats=s_unet, csff=True)
    evs2 = enc2.init(jax.random.PRNGKey(2), x, enc_outs, dec_outs)
    enc_outs2 = enc2.apply(evs2, x, enc_outs, dec_outs)
    assert [tuple(o.shape) for o in enc_outs2] == [tuple(o.shape) for o in enc_outs]

    ors = ORSNet(scale_unetfeats=s_unet, num_cab=2)
    xo = jnp.ones((1, 32, 32, n_feat + s_ors))
    ovs = ors.init(jax.random.PRNGKey(3), xo, enc_outs, dec_outs)
    out = jax.jit(lambda v, a, b, c: ors.apply(v, a, b, c))(ovs, xo, enc_outs, dec_outs)
    assert tuple(out.shape) == (1, 32, 32, n_feat + s_ors)
    assert np.isfinite(np.asarray(out)).all()
