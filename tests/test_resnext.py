"""ResNeXt dilated backbone (`models/resnext.py`) vs the reference
semantics in `deeplabv3plus/lib/model/resnext_dilated.py`: stride-8 dilated
stages (layer3 d2, layer4 d4 with first-block d2, `:166-177,199-214`), SE
attention (`:83-90,105-107`), and the inverted ``last_gamma`` zero-init
quirk (`:77-81`)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_segmentation_tpu.models.resnext import ResNextDilated


def tiny(**kw):
    return ResNextDilated(layers=(1, 1, 1, 1), cardinality=4,
                          bottleneck_width=4, **kw)


def init_and_apply(model, hw=64):
    x = jnp.asarray(np.random.RandomState(0).rand(1, hw, hw, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, False))()
    outs = jax.jit(lambda v: model.apply(v, x, False))(variables)
    return variables, outs


class TestStructure:
    def test_dilated_output_stride_8(self):
        _, (c1, c3, c4) = init_and_apply(tiny(dilated=True))
        assert c1.shape == (1, 16, 16, 256)    # /4, 64*4
        assert c3.shape == (1, 8, 8, 1024)     # /8 (d2 stage, stride 1)
        assert c4.shape == (1, 8, 8, 2048)     # /8 (d4 stage, stride 1)

    def test_undilated_output_stride_32(self):
        _, (c1, c3, c4) = init_and_apply(tiny(dilated=False))
        assert c1.shape == (1, 16, 16, 256)
        assert c3.shape == (1, 4, 4, 1024)     # /16
        assert c4.shape == (1, 2, 2, 2048)     # /32

    def test_se_branch_present_and_runs(self):
        variables, (c1, _, c4) = init_and_apply(tiny(use_se=True))
        block = variables["params"]["layer1_block0"]
        assert "se_conv1" in block and "se_conv2" in block
        assert np.all(np.isfinite(np.asarray(c4)))


class TestLastGammaQuirk:
    """The reference zero-inits bn3 gamma when ``last_gamma`` is FALSE
    (`resnext_dilated.py:77-81`, condition inverted vs its name)."""

    def _bn3_scale(self, last_gamma):
        variables, _ = init_and_apply(tiny(last_gamma=last_gamma), hw=32)
        return np.asarray(
            variables["params"]["layer1_block0"]["bn3"]["scale"])

    def test_default_zero_gamma(self):
        assert np.all(self._bn3_scale(last_gamma=False) == 0.0)

    def test_last_gamma_true_keeps_ones(self):
        assert np.all(self._bn3_scale(last_gamma=True) == 1.0)
