"""Conversion parity for the conv-stack model zoo: converted random-init
reference weights must reproduce the reference outputs (fixtures from
make_fixtures_models.py). Validates blocks (ConvT geometry, pixel(un)shuffle
ordering, bilinear resize, RRDB/IMDN structure) as a side effect."""

import numpy as np
import pytest

from kair_tpu.ckpt import torch_convert as tc
from kair_tpu.models.dncnn import FDnCNN, IRCNN
from kair_tpu.models.drunet import UNetRes
from kair_tpu.models.ffdnet import FFDNet
from kair_tpu.models.imdn import IMDN
from kair_tpu.models.rrdbnet import RRDB, RRDBNet, RRDBNetNoUp
from kair_tpu.models.srresnet import MSRResNet0, MSRResNet1, SRMD
from tests.conftest import FIXTURES


def load(name):
    z = np.load(FIXTURES / f"model_{name}.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    ins = [z[k] for k in sorted(k for k in z.files if k.startswith("in"))]
    return sd, ins, z["out"]


def nchw(x):
    return x.transpose(0, 2, 3, 1)


CASES = [
    ("ircnn", IRCNN(1, 1, 64), lambda sd: tc.convert_ircnn(sd), 1),
    ("fdncnn", FDnCNN(2, 1, 64, 8), lambda sd: tc.convert_dncnn(sd, nb=8), 1),
    ("msrresnet0", MSRResNet0(3, 3, 32, 3, 4, "R", "upconv"),
     lambda sd: tc.convert_msrresnet0(sd, nb=3, upscale=4, upsample_mode="upconv"), 1),
    ("msrresnet0_ps", MSRResNet0(3, 3, 32, 2, 4, "R", "pixelshuffle"),
     lambda sd: tc.convert_msrresnet0(sd, nb=2, upscale=4, upsample_mode="pixelshuffle"), 1),
    ("msrresnet1", MSRResNet1(3, 3, 32, 3, 4),
     lambda sd: tc.convert_msrresnet1(sd, nb=3, upscale=4), 1),
    ("dpsr", MSRResNet0(4, 3, 32, 3, 4, "R", "upconv"),
     lambda sd: tc.convert_msrresnet0(sd, nb=3, upscale=4, upsample_mode="upconv"), 1),
    ("srmd", SRMD(19, 3, 32, 6, 4, "R", "pixelshuffle"),
     lambda sd: tc.convert_srmd(sd, nb=6), 1),
    ("rrdbnet", RRDBNet(3, 3, 16, 2, 8, 4), lambda sd: tc.convert_rrdbnet(sd, nb=2, sf=4), 1),
    ("rrdbnet_noup", RRDBNetNoUp(3, 3, 16, 2, 8),
     lambda sd: tc.convert_rrdbnet_noup(sd, nb=2), 1),
    # NB the reference hard-codes gc=32 in its body blocks regardless of the
    # ctor arg (network_rrdb.py:30), so gc=32 here.
    ("rrdb_old", RRDB(3, 3, 16, 2, 32, 4, "L", "upconv"),
     lambda sd: tc.convert_rrdb_old(sd, nb=2, upscale=4, upsample_mode="upconv"), 1),
    ("imdn", IMDN(3, 3, 32, 3, 4, "L", "pixelshuffle"),
     lambda sd: tc.convert_imdn(sd, nb=3), 1),
    ("unetres", UNetRes(3, 3, (16, 32, 64, 128), 2),
     lambda sd: tc.convert_unetres(sd, nb=2), 1),
]


@pytest.mark.parametrize("name,model,conv,n_in", CASES, ids=[c[0] for c in CASES])
def test_conversion_parity(name, model, conv, n_in):
    sd, ins, want = load(name)
    variables = conv(sd)
    got = np.asarray(model.apply(variables, *[nchw(i) for i in ins[:n_in]]))
    np.testing.assert_allclose(got, nchw(want), atol=5e-5)


def test_ffdnet_parity():
    sd, ins, want = load("ffdnet")
    variables = tc.convert_ffdnet(sd, nb=6)
    model = FFDNet(1, 1, 64, 6)
    got = np.asarray(model.apply(variables, nchw(ins[0]), ins[1]))
    np.testing.assert_allclose(got, nchw(want), atol=5e-5)


def test_usrnet_parity():
    """USRNet deep-unfolding (FFT data step + bias-free ResUNet prior)."""
    import jax
    from kair_tpu.models.usrnet import USRNet

    z = np.load(FIXTURES / "model_usrnet.npz")
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    variables = tc.convert_usrnet(sd, n_iter=4, nb=2)
    model = USRNet(n_iter=4, h_nc=16, in_nc=4, out_nc=3,
                   nc=(8, 16, 32, 64), nb=2)
    got = np.asarray(model.apply(
        variables, nchw(z["x"]), z["k"].transpose(0, 2, 3, 1), 2,
        z["sigma"].transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got, nchw(z["out"]), atol=1e-4)


SWINIR_CASES = [
    ("swinir_dn", dict(upscale=1, in_chans=1, embed_dim=24, depths=(2, 2),
                       num_heads=(4, 4), window_size=8, mlp_ratio=2.0,
                       upsampler="")),
    ("swinir_ape", dict(upscale=1, in_chans=1, embed_dim=24, depths=(2, 2),
                        num_heads=(4, 4), window_size=8, mlp_ratio=2.0,
                        upsampler="", ape=True, img_size=16)),
    ("swinir_light", dict(upscale=4, in_chans=3, embed_dim=24, depths=(2, 2),
                          num_heads=(4, 4), window_size=8, mlp_ratio=2.0,
                          upsampler="pixelshuffledirect")),
    ("swinir_classical", dict(upscale=4, in_chans=3, embed_dim=24, depths=(2, 2),
                              num_heads=(4, 4), window_size=8, mlp_ratio=2.0,
                              upsampler="pixelshuffle")),
]


@pytest.mark.parametrize("name,cfg", SWINIR_CASES, ids=[c[0] for c in SWINIR_CASES])
def test_swinir_parity(name, cfg):
    from kair_tpu.models.swinir import SwinIR

    sd, ins, want = load(name)
    variables = tc.convert_swinir(sd, depths=cfg["depths"],
                                  upsampler=cfg["upsampler"],
                                  upscale=cfg["upscale"])
    model = SwinIR(**cfg)
    got = np.asarray(model.apply(variables, nchw(ins[0])))
    np.testing.assert_allclose(got, nchw(want), atol=2e-4)


def test_swinir_converted_jit_parity():
    """Converted (numpy) checkpoints must work UNDER JIT: JAX lifts numpy
    constants to tracers, so numpy-table[traced-index] crashes — regression
    for the rel-position-bias indexing fix in models/ and ops/."""
    import jax
    from kair_tpu.models.swinir import SwinIR

    name, cfg = SWINIR_CASES[2]
    sd, ins, want = load(name)
    variables = tc.convert_swinir(sd, depths=cfg["depths"],
                                  upsampler=cfg["upsampler"],
                                  upscale=cfg["upscale"])
    model = SwinIR(**cfg)
    got = np.asarray(jax.jit(lambda a: model.apply(variables, a))(nchw(ins[0])))
    np.testing.assert_allclose(got, nchw(want), atol=2e-4)
