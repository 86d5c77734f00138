"""ViViT / V-JEPA converter numerics vs the oracle (VERDICT r2 item 6).

Same synthetic source state dict through the reference's
``convert_vivet_weights`` / ``convert_vjepa_weights``
(/root/reference/src/vit_prisma/models/weight_conversion.py:707 / :48) and
through ours; every tensor diffed.  Then a full video-forward equivalence
pass: oracle-converted weights into the oracle's tubelet HookedViT vs our
converted weights into our HookedViT, same clip, 1e-4 — the bar the
CLIP/timm/DINO families already meet (tests/test_loading.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_prisma_tpu import HookedViT, ViTConfig
from vit_prisma_tpu.models.loading import convert as C
from vit_prisma_tpu.models.loading.state_dict import stack_params

from tests.reference_oracle import load_reference

CFG = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                patch_size=4, image_size=8, n_classes=5,
                activation_name="gelu_fast", is_video_transformer=True,
                video_tubelet_depth=2, video_num_frames=4,
                return_type="logits")

VJEPA_CFG = ViTConfig(n_layers=2, d_model=16, d_head=4, n_heads=4, d_mlp=32,
                      patch_size=4, image_size=8, n_classes=16,
                      is_video_transformer=True, video_tubelet_depth=2,
                      video_num_frames=4, use_cls_token=False,
                      classification_type="gaap", return_type="pre_logits")


def _ref_cfg(cfg, **kw):
    load_reference()
    from vit_prisma.configs.HookedViTConfig import HookedViTConfig as RefCfg
    return RefCfg(
        n_layers=cfg.n_layers, d_model=cfg.d_model, d_head=cfg.d_head,
        d_mlp=cfg.d_mlp, n_heads=cfg.n_heads, patch_size=cfg.patch_size,
        image_size=cfg.image_size, n_classes=cfg.n_classes,
        activation_name=cfg.activation_name,
        is_video_transformer=True, video_tubelet_depth=2, video_num_frames=4,
        return_type=cfg.return_type, **kw)


def _vivit_source(seed=7):
    import torch
    torch.manual_seed(seed)
    d, m, T = CFG.d_model, CFG.d_mlp, CFG.n_tokens
    sd = {"vivit.embeddings.cls_token": torch.randn(1, 1, d),
          "vivit.embeddings.position_embeddings": torch.randn(1, T, d),
          "vivit.embeddings.patch_embeddings.projection.weight":
              torch.randn(d, 3, 2, 4, 4),
          "vivit.embeddings.patch_embeddings.projection.bias": torch.randn(d),
          "vivit.layernorm.weight": torch.randn(d),
          "vivit.layernorm.bias": torch.randn(d),
          "classifier.weight": torch.randn(CFG.n_classes, d),
          "classifier.bias": torch.randn(CFG.n_classes)}
    for l in range(CFG.n_layers):
        k = f"vivit.encoder.layer.{l}"
        sd.update({
            f"{k}.layernorm_before.weight": torch.randn(d),
            f"{k}.layernorm_before.bias": torch.randn(d),
            f"{k}.layernorm_after.weight": torch.randn(d),
            f"{k}.layernorm_after.bias": torch.randn(d),
            f"{k}.attention.attention.query.weight": torch.randn(d, d),
            f"{k}.attention.attention.query.bias": torch.randn(d),
            f"{k}.attention.attention.key.weight": torch.randn(d, d),
            f"{k}.attention.attention.key.bias": torch.randn(d),
            f"{k}.attention.attention.value.weight": torch.randn(d, d),
            f"{k}.attention.attention.value.bias": torch.randn(d),
            f"{k}.attention.output.dense.weight": torch.randn(d, d),
            f"{k}.attention.output.dense.bias": torch.randn(d),
            f"{k}.intermediate.dense.weight": torch.randn(m, d),
            f"{k}.intermediate.dense.bias": torch.randn(m),
            f"{k}.output.dense.weight": torch.randn(d, m),
            f"{k}.output.dense.bias": torch.randn(d)})
    return sd


def _vjepa_source(seed=11):
    import torch
    torch.manual_seed(seed)
    d, m, T = VJEPA_CFG.d_model, VJEPA_CFG.d_mlp, VJEPA_CFG.n_tokens
    sd = {"embeddings.position_embeddings": torch.randn(1, T, d),
          "embeddings.patch_embeddings.proj.weight": torch.randn(d, 3, 2, 4, 4),
          "embeddings.patch_embeddings.proj.bias": torch.randn(d),
          "layernorm.weight": torch.randn(d),
          "layernorm.bias": torch.randn(d)}
    for l in range(VJEPA_CFG.n_layers):
        k = f"encoder.layer.{l}"
        sd.update({
            f"{k}.norm1.weight": torch.randn(d), f"{k}.norm1.bias": torch.randn(d),
            f"{k}.norm2.weight": torch.randn(d), f"{k}.norm2.bias": torch.randn(d),
            f"{k}.attention.query.weight": torch.randn(d, d),
            f"{k}.attention.query.bias": torch.randn(d),
            f"{k}.attention.key.weight": torch.randn(d, d),
            f"{k}.attention.key.bias": torch.randn(d),
            f"{k}.attention.value.weight": torch.randn(d, d),
            f"{k}.attention.value.bias": torch.randn(d),
            f"{k}.attention.proj.weight": torch.randn(d, d),
            f"{k}.attention.proj.bias": torch.randn(d),
            f"{k}.mlp.fc1.weight": torch.randn(m, d),
            f"{k}.mlp.fc1.bias": torch.randn(m),
            f"{k}.mlp.fc2.weight": torch.randn(d, m),
            f"{k}.mlp.fc2.bias": torch.randn(d)})
    return sd


def _diff_flat(ours, ref):
    assert set(ours) == set(ref), (
        f"key sets differ: only-ours={set(ours) - set(ref)} "
        f"only-ref={set(ref) - set(ours)}")
    for k in sorted(ref):
        r = ref[k].detach().numpy() if hasattr(ref[k], "detach") else np.asarray(ref[k])
        o = np.asarray(ours[k])
        np.testing.assert_allclose(
            o.squeeze(), r.squeeze(), atol=1e-6, err_msg=f"tensor {k}")


def test_vivit_converter_matches_oracle():
    load_reference()
    from vit_prisma.models.weight_conversion import convert_vivet_weights
    sd = _vivit_source()
    ref_flat = convert_vivet_weights(sd, _ref_cfg(CFG))
    ours = C.convert_vivit_weights(sd, CFG)
    _diff_flat(ours, ref_flat)


def test_vivit_forward_matches_oracle():
    import torch
    load_reference()
    from vit_prisma.models.base_vit import HookedViT as RefViT
    from vit_prisma.models.weight_conversion import convert_vivet_weights
    sd = _vivit_source(seed=8)
    rcfg = _ref_cfg(CFG)
    ref_model = RefViT(rcfg)
    missing, unexpected = ref_model.load_state_dict(
        convert_vivet_weights(sd, rcfg), strict=False)
    assert not unexpected
    ref_model.eval()

    model = HookedViT(CFG, params=stack_params(C.convert_vivit_weights(sd, CFG), CFG))
    torch.manual_seed(9)
    x = torch.randn(2, 3, 4, 8, 8)
    with torch.no_grad():
        out_ref = ref_model(x)
    out = model(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-4)


def test_vjepa_converter_matches_oracle():
    load_reference()
    from vit_prisma.models.weight_conversion import convert_vjepa_weights
    sd = _vjepa_source()
    ref_flat = convert_vjepa_weights(sd, _ref_cfg(VJEPA_CFG, use_cls_token=False,
                                                 classification_type="gaap"),
                                     device="cpu")
    ours = C.convert_vjepa_weights(sd, VJEPA_CFG)
    _diff_flat(ours, ref_flat)
    # the identity head the reference installs is preserved
    np.testing.assert_allclose(ours["head.W_H"], np.eye(VJEPA_CFG.d_model))


def test_vjepa_forward_matches_oracle():
    import torch
    load_reference()
    from vit_prisma.models.base_vit import HookedViT as RefViT
    from vit_prisma.models.weight_conversion import convert_vjepa_weights
    sd = _vjepa_source(seed=12)
    rcfg = _ref_cfg(VJEPA_CFG, use_cls_token=False, classification_type="gaap")
    ref_model = RefViT(rcfg)
    missing, unexpected = ref_model.load_state_dict(
        convert_vjepa_weights(sd, rcfg, device="cpu"), strict=False)
    assert not unexpected
    ref_model.eval()

    model = HookedViT(VJEPA_CFG,
                      params=stack_params(C.convert_vjepa_weights(sd, VJEPA_CFG),
                                          VJEPA_CFG))
    torch.manual_seed(13)
    x = torch.randn(2, 3, 4, 8, 8)
    with torch.no_grad():
        out_ref = ref_model(x)
    out = model(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-4)
