"""Shape/grad tests for the backbone registry, FBNet and the plain
SWINT detection trunks (ref modeling/backbone/__init__.py registry,
fbnet.py)."""

import jax
import jax.numpy as jnp
import pytest

from fiber_tpu.detection.backbones import BACKBONES, build_backbone
from fiber_tpu.models.fbnet import ARCH_DEFS, FBNetTrunk

IMG = (64, 96)


def test_fbnet_trunk_shapes():
    for arch in ARCH_DEFS:
        trunk = FBNetTrunk(arch=arch)
        x = jnp.ones((1, *IMG, 3))
        variables = trunk.init(jax.random.PRNGKey(0), x)
        outs = trunk.apply(variables, x)
        assert len(outs) == 3
        # stride 8 / 16 / 32 taps
        assert [o.shape[1] for o in outs] == [IMG[0] // 8, IMG[0] // 16,
                                              IMG[0] // 32]


def test_fbnet_grads_finite():
    trunk = FBNetTrunk(arch="fbnet_c")
    x = jnp.ones((1, 32, 32, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return sum(o.sum() for o in trunk.apply({"params": p}, x))

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(g).all() for g in flat)


@pytest.mark.parametrize("name", [
    "FBNET-FPN-RETINANET", "SWINT-FPN-RETINANET", "R-50-FPN-RETINANET",
])
def test_vision_backbones_emit_5_levels(name):
    module, lang_aware = build_backbone(name, IMG, out_channels=32)
    assert not lang_aware
    x = jnp.ones((1, *IMG, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    feats = module.apply(variables, x)
    assert len(feats) == 5
    assert all(f.shape[-1] == 32 for f in feats)
    # P3..P7 halve each level
    hs = [f.shape[1] for f in feats]
    assert all(hs[i] >= hs[i + 1] for i in range(4))


def test_swint_vl_registry_backbone():
    module, lang_aware = build_backbone("SWINT-VL-FPN-RETINANET", IMG,
                                        out_channels=32)
    assert lang_aware
    x = jnp.ones((1, *IMG, 3))
    text = jnp.ones((1, 8, 768))
    masks = jnp.ones((1, 8), jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), x, text, masks)
    feats, lang = module.apply(variables, x, text, masks)
    assert len(feats) == 5
    assert lang["hidden"].shape == (1, 8, 768)
    assert lang["aggregate"].shape == (1, 768)


def test_efficientnet_bifpn_registry():
    module, lang_aware = build_backbone("EFFICIENTNET-BIFPN", IMG,
                                        out_channels=24)
    assert not lang_aware
    x = jnp.ones((1, *IMG, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    feats = module.apply(variables, x)
    assert len(feats) == 5 and all(f.shape[-1] == 24 for f in feats)


def test_unknown_backbone_raises():
    with pytest.raises(KeyError):
        build_backbone("NOPE", IMG)
    assert "FUSION-SWINT-FPN-RETINANET" in BACKBONES
