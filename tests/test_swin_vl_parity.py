"""Numerical parity of the language-aware Swin (swint_vl) vs the
reference torch modules, executed in-process on CPU.

Covers the joint windowed image<->text attention block
(swint_vl.py:124-375) through the reference BasicLayer (shift masks
included) and the full 4-stage backbone forward with language updates
(swint_vl.py:754-797), at small dimensions.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fiber_tpu.models.swin_vl import SwinBlockVL, SwinVLBackbone  # noqa: E402

from reference_loader_det import setup_fine_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    setup_fine_reference()
    import maskrcnn_benchmark.modeling.backbone.swint_vl as swint_vl
    return swint_vl


def _t2j_dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].numpy().T,
            "bias": sd[f"{key}.bias"].numpy()}


def _t2j_ln(sd, key):
    return {"scale": sd[f"{key}.weight"].numpy(),
            "bias": sd[f"{key}.bias"].numpy()}


def _convert_vl_block(sd, prefix=""):
    """Reference SwinTransformerBlock (VL) state_dict -> SwinBlockVL params."""
    p = prefix
    return {
        "norm1": _t2j_ln(sd, f"{p}norm1"),
        "norm1_text": _t2j_ln(sd, f"{p}norm1_text"),
        "norm2": _t2j_ln(sd, f"{p}norm2"),
        "norm2_text": _t2j_ln(sd, f"{p}norm2_text"),
        "attn": {
            "qkv": _t2j_dense(sd, f"{p}attn.qkv"),
            "qkv_text": _t2j_dense(sd, f"{p}attn.qkv_text"),
            "proj": _t2j_dense(sd, f"{p}attn.proj"),
            "proj_text": _t2j_dense(sd, f"{p}attn.proj_text"),
            "relative_position_bias_table":
                sd[f"{p}attn.relative_position_bias_table"].numpy(),
            "i2t_relative_position_bias":
                sd[f"{p}attn.i2t_relative_position_bias"].numpy(),
            "t2t_relative_position_bias":
                sd[f"{p}attn.t2t_relative_position_bias"].numpy(),
        },
        "mlp": {"fc1": _t2j_dense(sd, f"{p}mlp.fc1"),
                "fc2": _t2j_dense(sd, f"{p}mlp.fc2")},
        "mlp_text": {"fc1": _t2j_dense(sd, f"{p}mlp_text.fc1"),
                     "fc2": _t2j_dense(sd, f"{p}mlp_text.fc2")},
    }


DIM, HEADS, WINDOW = 16, 2, 4
H = W = 8
LT, DIM_T = 6, 12


def _rand_init(mod, seed):
    """Randomize parameters only (buffers like relative_position_index
    must keep their constructed values)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return mod.state_dict()


@pytest.mark.parametrize("shift", [0, WINDOW // 2])
def test_vl_block_parity(ref, shift):
    blk_t = ref.SwinTransformerBlock(
        dim=DIM, num_heads=HEADS, window_size=WINDOW, shift_size=shift,
        ntext=LT, dim_text=DIM_T).eval()
    sd = _rand_init(blk_t, seed=shift)
    blk_t.H, blk_t.W = H, W

    rng = np.random.default_rng(3 + shift)
    x = rng.normal(size=(2, H * W, DIM)).astype(np.float32)
    text = rng.normal(size=(2, LT, DIM_T)).astype(np.float32)
    masks = np.ones((2, LT), np.float32)
    masks[0, 4:] = 0  # pad tail of image 0
    mask_add_t = torch.zeros(2, LT)
    mask_add_t[0, 4:] = -float("inf")

    # the reference BasicLayer builds the shift mask; replicate its
    # construction here (swint_vl.py:497-521)
    if shift > 0:
        img_mask = torch.zeros((1, H, W, 1))
        h_sl = (slice(0, -WINDOW), slice(-WINDOW, -shift), slice(-shift, None))
        cnt = 0
        for hs in h_sl:
            for ws in h_sl:
                img_mask[:, hs, ws, :] = cnt
                cnt += 1
        mw = ref.window_partition(img_mask, WINDOW).view(-1, WINDOW * WINDOW)
        attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
        attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
    else:
        attn_mask = None

    with torch.no_grad():
        out_t, text_t = blk_t(torch.from_numpy(x), attn_mask,
                              torch.from_numpy(text), mask_add_t)

    blk_j = SwinBlockVL(dim=DIM, input_resolution=(H, W), num_heads=HEADS,
                        window_size=WINDOW, shift_size=shift,
                        ntext=LT, dim_text=DIM_T)
    params = {"params": _convert_vl_block(sd)}
    xj = jnp.asarray(x.reshape(2, H, W, DIM))
    out_j, text_j = blk_j.apply(params, xj, jnp.asarray(text),
                                jnp.where(jnp.asarray(masks) > 0, 0.0, -1e30),
                                deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out_j).reshape(2, H * W, DIM), out_t.numpy(),
        atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(text_j), text_t.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_vl_backbone_parity(ref):
    """Full swint_vl forward: 4 stages, text fused in the last stage."""
    depths, heads = [1, 1, 1, 1], [1, 2, 2, 2]
    model_t = ref.SwinTransformer(
        pretrain_img_size=32, embed_dim=8, depths=depths, num_heads=heads,
        window_size=WINDOW, drop_path_rate=0.0, ape=False,
        out_features=["stage3", "stage4", "stage5"],
        backbone_arch="SWINT-FPN", max_query_len=LT, lang_dim=DIM_T)
    model_t.eval()  # NB: the ref train() override returns None — no chain
    sd = _rand_init(model_t, seed=11)

    rng = np.random.default_rng(7)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    text = rng.normal(size=(2, LT, DIM_T)).astype(np.float32)
    masks = np.ones((2, LT), np.float32)
    masks[1, 5:] = 0

    with torch.no_grad():
        outs_t, lang_t = model_t({
            "img": torch.from_numpy(img),
            "lang": {"hidden": torch.from_numpy(text),
                     "masks": torch.from_numpy(masks)},
        })

    model_j = SwinVLBackbone(
        image_size=(32, 32), embed_dim=8, depths=tuple(depths),
        num_heads=tuple(heads), window_size=WINDOW, max_query_len=LT,
        lang_dim=DIM_T, drop_path_rate=0.0, out_indices=(1, 2, 3))

    params = {
        "patch_embed": {
            "proj": {"kernel": sd["patch_embed.proj.weight"].numpy()
                     .transpose(2, 3, 1, 0),
                     "bias": sd["patch_embed.proj.bias"].numpy()},
            "norm": _t2j_ln(sd, "patch_embed.norm"),
        },
    }
    for s in range(4):
        prefix = f"layers.{s}.blocks.0."
        if s == 3:
            params[f"stage{s}_block0"] = _convert_vl_block(sd, prefix)
        else:
            params[f"stage{s}_block0"] = {
                "norm1": _t2j_ln(sd, f"{prefix}norm1"),
                "norm2": _t2j_ln(sd, f"{prefix}norm2"),
                "attn": {
                    "qkv": _t2j_dense(sd, f"{prefix}attn.qkv"),
                    "proj": _t2j_dense(sd, f"{prefix}attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{prefix}attn.relative_position_bias_table"]
                        .numpy(),
                },
                "mlp": {"fc1": _t2j_dense(sd, f"{prefix}mlp.fc1"),
                        "fc2": _t2j_dense(sd, f"{prefix}mlp.fc2")},
            }
        if s < 3:
            params[f"downsample{s}"] = {
                "norm": _t2j_ln(sd, f"layers.{s}.downsample.norm"),
                "reduction": {"kernel":
                              sd[f"layers.{s}.downsample.reduction.weight"]
                              .numpy().T},
            }
    for i, s in enumerate((1, 2, 3)):
        params[f"out_norm{s}"] = _t2j_ln(sd, f"norm{s}")

    outs_j, lang_j = model_j.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(text), jnp.asarray(masks), deterministic=True)

    assert len(outs_j) == len(outs_t) == 3
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(oj.transpose(0, 3, 1, 2)), ot.numpy(),
            atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(lang_j["hidden"]),
                               lang_t["hidden"].numpy(),
                               atol=3e-4, rtol=1e-3)


def test_vl_backbone_v2_shapes_and_grads():
    """swint_v2_vl flavor: conv embed trunk + joint attention last stage."""
    model = SwinVLBackbone(
        image_size=(40, 48), embed_dim=8, depths=(1, 1, 1, 1),
        num_heads=(1, 2, 2, 2), window_size=4, max_query_len=LT,
        lang_dim=DIM_T, version="v2", layer_scale=True,
        drop_path_rate=0.0, out_indices=(1, 2, 3))
    rng = jax.random.PRNGKey(0)
    img = jnp.ones((1, 40, 48, 3))
    text = jnp.ones((1, LT, DIM_T))
    masks = jnp.ones((1, LT), jnp.int32)
    variables = model.init(rng, img, text, masks)
    outs, lang = model.apply(variables, img, text, masks)
    assert [o.shape for o in outs] == [(1, 5, 6, 16), (1, 3, 3, 32),
                                       (1, 2, 2, 64)]
    assert lang["hidden"].shape == (1, LT, DIM_T)

    def loss(p):
        outs, lang = model.apply({"params": p}, img, text, masks)
        return sum(o.sum() for o in outs) + lang["hidden"].sum()

    grads = jax.grad(loss)(variables["params"])
    leaf = grads["stage3_block0"]["attn"]["t2t_relative_position_bias"]
    assert jnp.isfinite(leaf).all()
