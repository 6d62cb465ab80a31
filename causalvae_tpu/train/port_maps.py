"""Model-specific torch->flax checkpoint name maps (T8).

Builds the {flax_flat_key: (torch_key, converter)} maps consumed by
checkpoints.smart_port for the reference's vessel checkpoints:
ViTVAE (ref vessel_analysis/00_core/vit_backbone.py:50-156, near-duplicate
latent_translator/models.py:40-126) and CausalViTVAE (ref
vessel_analysis/00_core/models.py:181-307). Handles the layout conversions —
torch Conv/ConvTranspose/Linear kernels, BatchNorm running stats, and
nn.MultiheadAttention packed in_proj -> flax DenseGeneral (E, 3, H, D) —
plus bicubic pos-embedding interpolation for shape-mismatched restores
(ref latent_translator/main.py:35-87).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from causalvae_tpu.train.checkpoints import (
    flatten_params,
    smart_port,
    torch_conv_to_flax,
    torch_convT_to_flax,
    torch_linear_to_flax,
    unflatten_params,
)

_ID = lambda a: np.asarray(a)  # noqa: E731

# torch stem Sequential indices: conv at 0,3,6,9,12; BN at 1,4,7,10,13
_STEM_CONV_IDX = (0, 3, 6, 9, 12)
_STEM_BN_IDX = (1, 4, 7, 10, 13)


def _dec_indices(dec_res_stages: int):
    """torch decoder Sequential indices for a ViTVAE decoder whose first
    ``dec_res_stages`` ConvTranspose stages are followed by a ResBlock.

    The two reference variants differ here: the vessel backbone has 3
    ResBlocks (ref vessel_analysis/00_core/vit_backbone.py:124-156 — no
    ResBlock after the 4th stage), the latent-translator one has 4
    (ref latent_translator/models.py:86-93)."""
    ct, bn, res = [], [], []
    pos = 0
    for i in range(5):
        ct.append(pos)
        bn.append(pos + 1)
        pos += 3  # ConvTranspose, BatchNorm, LeakyReLU
        if i < dec_res_stages:
            res.append(pos)
            pos += 1
    return tuple(ct), tuple(bn), tuple(res), pos


def _qkv_kernel(heads: int, head_dim: int):
    def conv(w):  # torch in_proj_weight (3E, E) -> (E, 3, H, D)
        e = w.shape[1]
        return np.transpose(w, (1, 0)).reshape(e, 3, heads, head_dim)

    return conv


def _qkv_bias(heads: int, head_dim: int):
    def conv(b):  # (3E,) -> (3, H, D)
        return b.reshape(3, heads, head_dim)

    return conv


def _bn(prefix_flax: str, prefix_torch: str, params: Dict, stats: Dict):
    params[f"{prefix_flax}/scale"] = (f"{prefix_torch}.weight", _ID)
    params[f"{prefix_flax}/bias"] = (f"{prefix_torch}.bias", _ID)
    stats[f"{prefix_flax}/mean"] = (f"{prefix_torch}.running_mean", _ID)
    stats[f"{prefix_flax}/var"] = (f"{prefix_torch}.running_var", _ID)


def vitvae_name_maps(
    depth: int = 6, heads: int = 8, embed_dim: int = 256, prefix: str = "",
    dec_res_stages: int = 3, grid_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[Dict, Dict]:
    """(params_map, batch_stats_map) for ViTVAE; prefix='backbone/' (flax) +
    'backbone.' (torch) when wrapped inside CausalViTVAE.

    dec_res_stages=3 matches the vessel backbone (C8/C9 family, ref
    vit_backbone.py:124-156); the latent-translator variant needs 4.

    grid_hw: the torch model's (grid_h, grid_w). REQUIRED for a correct
    decoder_input port: torch views its output channel-major
    (ref vit_backbone.py:187-189 ``view(-1, embed, gh, gw)``), flax reshapes
    row-major NHWC — the Linear's output rows must be permuted chw -> hwc.
    Without it the port is torch-row-identical, which scrambles the decoder's
    spatial map (caught by the C9 trajectory-parity harness, round 5)."""
    _DEC_CT_IDX, _DEC_BN_IDX, _DEC_RES_IDX, _DEC_OUT_IDX = _dec_indices(
        dec_res_stages)
    head_dim = embed_dim // heads
    fpre = prefix.replace(".", "/")
    tpre = prefix.replace("/", ".")
    P: Dict = {}
    S: Dict = {}
    for i, (ci, bi) in enumerate(zip(_STEM_CONV_IDX, _STEM_BN_IDX)):
        P[f"{fpre}stem_convs_{i}/kernel"] = (f"{tpre}stem.{ci}.weight", torch_conv_to_flax)
        P[f"{fpre}stem_convs_{i}/bias"] = (f"{tpre}stem.{ci}.bias", _ID)
        _bn(f"{fpre}stem_bns_{i}", f"{tpre}stem.{bi}", P, S)
    P[f"{fpre}pos_embedding"] = (f"{tpre}pos_embedding", _ID)
    P[f"{fpre}cls_token"] = (f"{tpre}cls_token", _ID)
    for d in range(depth):
        fb, tb = f"{fpre}blocks_{d}", f"{tpre}transformer.{d}"
        P[f"{fb}/LayerNorm_0/scale"] = (f"{tb}.norm1.weight", _ID)
        P[f"{fb}/LayerNorm_0/bias"] = (f"{tb}.norm1.bias", _ID)
        P[f"{fb}/attn/qkv/kernel"] = (f"{tb}.attn.in_proj_weight", _qkv_kernel(heads, head_dim))
        P[f"{fb}/attn/qkv/bias"] = (f"{tb}.attn.in_proj_bias", _qkv_bias(heads, head_dim))
        P[f"{fb}/attn/proj/kernel"] = (f"{tb}.attn.out_proj.weight", torch_linear_to_flax)
        P[f"{fb}/attn/proj/bias"] = (f"{tb}.attn.out_proj.bias", _ID)
        P[f"{fb}/LayerNorm_1/scale"] = (f"{tb}.norm2.weight", _ID)
        P[f"{fb}/LayerNorm_1/bias"] = (f"{tb}.norm2.bias", _ID)
        P[f"{fb}/Dense_0/kernel"] = (f"{tb}.mlp.0.weight", torch_linear_to_flax)
        P[f"{fb}/Dense_0/bias"] = (f"{tb}.mlp.0.bias", _ID)
        P[f"{fb}/Dense_1/kernel"] = (f"{tb}.mlp.3.weight", torch_linear_to_flax)
        P[f"{fb}/Dense_1/bias"] = (f"{tb}.mlp.3.bias", _ID)
    for name in ("to_latent",):
        P[f"{fpre}{name}/scale"] = (f"{tpre}{name}.weight", _ID)
        P[f"{fpre}{name}/bias"] = (f"{tpre}{name}.bias", _ID)
    for name in ("fc_mu", "fc_var"):
        P[f"{fpre}{name}/kernel"] = (f"{tpre}{name}.weight", torch_linear_to_flax)
        P[f"{fpre}{name}/bias"] = (f"{tpre}{name}.bias", _ID)
    # decoder_input produces the to-be-reshaped conv map: torch flattens it
    # channel-major (view(-1, E, gh, gw)), flax NHWC — permute the output
    # rows chw -> hwc (same boundary handling as the MNIST dec_fc and the
    # vessel-CNN dec_fc2 ports). Falls back to the (wrong-order) plain
    # transpose only if the grid is unknown — every in-repo caller passes it.
    if grid_hw is not None:
        gh, gw = grid_hw
        P[f"{fpre}decoder_input/kernel"] = (
            f"{tpre}decoder_input.weight",
            _hwc_from_chw_rows(embed_dim, gh, gw))
        P[f"{fpre}decoder_input/bias"] = (
            f"{tpre}decoder_input.bias", _hwc_from_chw_bias(embed_dim, gh, gw))
    else:  # pragma: no cover - legacy fallback
        P[f"{fpre}decoder_input/kernel"] = (
            f"{tpre}decoder_input.weight", torch_linear_to_flax)
        P[f"{fpre}decoder_input/bias"] = (f"{tpre}decoder_input.bias", _ID)
    for i, (ci, bi) in enumerate(zip(_DEC_CT_IDX, _DEC_BN_IDX)):
        P[f"{fpre}dec_ct_{i}/kernel"] = (f"{tpre}decoder.{ci}.weight", torch_convT_to_flax)
        P[f"{fpre}dec_ct_{i}/bias"] = (f"{tpre}decoder.{ci}.bias", _ID)
        _bn(f"{fpre}dec_bns_{i}", f"{tpre}decoder.{bi}", P, S)
    for i, ri in enumerate(_DEC_RES_IDX):
        fr, tr = f"{fpre}dec_res_{i}", f"{tpre}decoder.{ri}.conv"
        P[f"{fr}/Conv_0/kernel"] = (f"{tr}.0.weight", torch_conv_to_flax)
        P[f"{fr}/Conv_0/bias"] = (f"{tr}.0.bias", _ID)
        _bn(f"{fr}/BatchNorm_0", f"{tr}.1", P, S)
        P[f"{fr}/Conv_1/kernel"] = (f"{tr}.3.weight", torch_conv_to_flax)
        P[f"{fr}/Conv_1/bias"] = (f"{tr}.3.bias", _ID)
        _bn(f"{fr}/BatchNorm_1", f"{tr}.4", P, S)
    P[f"{fpre}dec_out/kernel"] = (f"{tpre}decoder.{_DEC_OUT_IDX}.weight", torch_conv_to_flax)
    P[f"{fpre}dec_out/bias"] = (f"{tpre}decoder.{_DEC_OUT_IDX}.bias", _ID)
    return P, S


def causal_vitvae_name_maps(depth: int = 6, heads: int = 8, embed_dim: int = 256,
                            dec_res_stages: int = 3,
                            grid_hw: Optional[Tuple[int, int]] = None):
    """Maps for the full CausalViTVAE (backbone + adapters + morph heads,
    ref models.py:207-250)."""
    P, S = vitvae_name_maps(depth, heads, embed_dim, prefix="backbone/",
                            dec_res_stages=dec_res_stages, grid_hw=grid_hw)
    for fl, tl in (("enc_adapter_fc1", "enc_adapter.0"),
                   ("enc_adapter_fc2", "enc_adapter.3"),
                   ("dec_adapter_fc1", "dec_adapter.0"),
                   ("dec_adapter_fc2", "dec_adapter.3")):
        P[f"{fl}/kernel"] = (f"{tl}.weight", torch_linear_to_flax)
        P[f"{fl}/bias"] = (f"{tl}.bias", _ID)
    _bn("enc_adapter_bn", "enc_adapter.1", P, S)
    _bn("dec_adapter_bn", "dec_adapter.1", P, S)
    # morph predictor: shared_{0,1} + mu/logvar heads
    for i, ti in enumerate((0, 2)):
        P[f"morph/shared_{i}/kernel"] = (f"morph_predictor_shared.{ti}.weight", torch_linear_to_flax)
        P[f"morph/shared_{i}/bias"] = (f"morph_predictor_shared.{ti}.bias", _ID)
    for head in ("mu", "logvar"):
        P[f"morph/{head}/kernel"] = (f"morph_predictor_{head}.weight", torch_linear_to_flax)
        P[f"morph/{head}/bias"] = (f"morph_predictor_{head}.bias", _ID)
    return P, S


def _chw_to_hwc_columns(c: int, h: int, w: int):
    """Converter for a torch Linear consuming a flattened conv map: torch
    flattens NCHW (channel-major), flax flattens NHWC — permute the first
    c*h*w input columns; trailing columns (concatenated m/t) pass through."""

    def conv(wt):  # torch (out, c*h*w + extra)
        img, rest = wt[:, : c * h * w], wt[:, c * h * w :]
        img = img.reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(-1, c * h * w)
        return np.concatenate([img, rest], axis=1).T  # flax (in, out)

    return conv


def _hwc_from_chw_rows(c: int, h: int, w: int):
    """Converter for a torch Linear producing a to-be-reshaped conv map
    (rows are the output dim): permute chw -> hwc row order."""

    def conv_w(wt):  # torch (c*h*w, in)
        return wt.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(c * h * w, -1).T

    return conv_w


def _hwc_from_chw_bias(c: int, h: int, w: int):
    def conv_b(b):
        return b.reshape(c, h, w).transpose(1, 2, 0).reshape(-1)

    return conv_b


def causal_conv_vae_name_maps(gaussian: bool = False) -> Tuple[Dict, Dict]:
    """Maps for the MNIST CausalConvVAE against the reference's
    CausalMorphVAE12 state_dict (C1 ref mnist_test/01 models.py:6-48; C4
    Bayesian variant ref mnist_test/06 models.py:6-50). Handles the
    NCHW-flatten vs NHWC-flatten permutation at both conv<->fc boundaries."""
    P: Dict = {}
    P["enc_conv1/kernel"] = ("enc_conv.0.weight", torch_conv_to_flax)
    P["enc_conv1/bias"] = ("enc_conv.0.bias", _ID)
    P["enc_conv2/kernel"] = ("enc_conv.2.weight", torch_conv_to_flax)
    P["enc_conv2/bias"] = ("enc_conv.2.bias", _ID)
    P["enc_fc1/kernel"] = ("enc_fc.0.weight", _chw_to_hwc_columns(64, 7, 7))
    P["enc_fc1/bias"] = ("enc_fc.0.bias", _ID)
    P["enc_fc2/kernel"] = ("enc_fc.2.weight", torch_linear_to_flax)
    P["enc_fc2/bias"] = ("enc_fc.2.bias", _ID)
    if gaussian:
        P["morph/shared_0/kernel"] = ("morph_predictor_shared.0.weight", torch_linear_to_flax)
        P["morph/shared_0/bias"] = ("morph_predictor_shared.0.bias", _ID)
        for head in ("mu", "logvar"):
            P[f"morph/{head}/kernel"] = (f"morph_predictor_{head}.weight", torch_linear_to_flax)
            P[f"morph/{head}/bias"] = (f"morph_predictor_{head}.bias", _ID)
    else:
        P["morph/shared_0/kernel"] = ("morph_predictor.0.weight", torch_linear_to_flax)
        P["morph/shared_0/bias"] = ("morph_predictor.0.bias", _ID)
        P["morph/out/kernel"] = ("morph_predictor.2.weight", torch_linear_to_flax)
        P["morph/out/bias"] = ("morph_predictor.2.bias", _ID)
    P["dec_fc/kernel"] = ("dec_fc.0.weight", _hwc_from_chw_rows(64, 7, 7))
    P["dec_fc/bias"] = ("dec_fc.0.bias", _hwc_from_chw_bias(64, 7, 7))
    P["dec_conv1/kernel"] = ("dec_conv.0.weight", torch_convT_to_flax)
    P["dec_conv1/bias"] = ("dec_conv.0.bias", _ID)
    P["dec_conv2/kernel"] = ("dec_conv.2.weight", torch_convT_to_flax)
    P["dec_conv2/bias"] = ("dec_conv.2.bias", _ID)
    return P, {}


def port_mnist_checkpoint(
    variables: Dict, torch_state: Dict[str, np.ndarray], *, gaussian: bool = False
) -> Tuple[Dict, list]:
    """Port a reference CausalMorphVAE12 checkpoint into CausalConvVAE
    variables (strict=False semantics like smart_load_weights)."""
    P, _ = causal_conv_vae_name_maps(gaussian)
    flat = flatten_params(variables["params"])
    ported, skipped = smart_port(flat, torch_state, P)
    return {"params": unflatten_params(ported)}, skipped


def conditional_vae_name_maps() -> Tuple[Dict, Dict]:
    """Maps for the MNIST CVAE against the reference's ConditionalVAE
    state_dict (C5, ref mnist_test/03 cvae_models.py:7-85): 3-conv encoder to
    (3, 3, 64), T concatenated at the fc heads, deconv decoder from (7, 7, 64)."""
    P: Dict = {}
    for i, ci in enumerate((0, 2, 4)):
        P[f"enc_conv{i + 1}/kernel"] = (f"enc_conv.{ci}.weight", torch_conv_to_flax)
        P[f"enc_conv{i + 1}/bias"] = (f"enc_conv.{ci}.bias", _ID)
    for head in ("mu", "logvar"):
        P[f"fc_{head}/kernel"] = (f"enc_fc_{head}.weight", _chw_to_hwc_columns(64, 3, 3))
        P[f"fc_{head}/bias"] = (f"enc_fc_{head}.bias", _ID)
    P["dec_fc/kernel"] = ("dec_fc.weight", _hwc_from_chw_rows(64, 7, 7))
    P["dec_fc/bias"] = ("dec_fc.bias", _hwc_from_chw_bias(64, 7, 7))
    for i, ci in enumerate((0, 2)):
        P[f"dec_conv{i + 1}/kernel"] = (f"dec_conv.{ci}.weight", torch_convT_to_flax)
        P[f"dec_conv{i + 1}/bias"] = (f"dec_conv.{ci}.bias", _ID)
    return P, {}


def cascade_vae_name_maps() -> Tuple[Dict, Dict]:
    """Maps for the cascade VAE against the reference's CausalBioVAE
    state_dict (C10, ref causal_cascade/models.py:5-89): 4-conv encoder +
    adaptive 4x4 pool, two-fc trunk, BatchNorm'd mechanism_net, deconv
    decoder from (4, 4, 256)."""
    P: Dict = {}
    S: Dict = {}
    for i, ci in enumerate((0, 2, 4, 6)):
        P[f"enc_convs_{i}/kernel"] = (f"enc_conv.{ci}.weight", torch_conv_to_flax)
        P[f"enc_convs_{i}/bias"] = (f"enc_conv.{ci}.bias", _ID)
    P["enc_fc1/kernel"] = ("enc_fc.0.weight", _chw_to_hwc_columns(256, 4, 4))
    P["enc_fc1/bias"] = ("enc_fc.0.bias", _ID)
    P["enc_fc2/kernel"] = ("enc_fc.2.weight", torch_linear_to_flax)
    P["enc_fc2/bias"] = ("enc_fc.2.bias", _ID)
    for head in ("mu", "logvar"):
        P[f"fc_{head}/kernel"] = (f"fc_{head}.weight", torch_linear_to_flax)
        P[f"fc_{head}/bias"] = (f"fc_{head}.bias", _ID)
    P["mechanism/shared_0/kernel"] = ("mechanism_net.0.weight", torch_linear_to_flax)
    P["mechanism/shared_0/bias"] = ("mechanism_net.0.bias", _ID)
    _bn("mechanism/shared_bn_0", "mechanism_net.1", P, S)
    P["mechanism/shared_1/kernel"] = ("mechanism_net.3.weight", torch_linear_to_flax)
    P["mechanism/shared_1/bias"] = ("mechanism_net.3.bias", _ID)
    P["mechanism/out/kernel"] = ("mechanism_net.5.weight", torch_linear_to_flax)
    P["mechanism/out/bias"] = ("mechanism_net.5.bias", _ID)
    P["dec_input/kernel"] = ("dec_input.weight", _hwc_from_chw_rows(256, 4, 4))
    P["dec_input/bias"] = ("dec_input.bias", _hwc_from_chw_bias(256, 4, 4))
    for i, ci in enumerate((0, 2, 4)):
        P[f"dec_convs_{i}/kernel"] = (f"dec_conv.{ci}.weight", torch_convT_to_flax)
        P[f"dec_convs_{i}/bias"] = (f"dec_conv.{ci}.bias", _ID)
    P["dec_out/kernel"] = ("dec_conv.6.weight", torch_convT_to_flax)
    P["dec_out/bias"] = ("dec_conv.6.bias", _ID)
    return P, S


def port_simple_checkpoint(
    variables: Dict, torch_state: Dict[str, np.ndarray], maps: Tuple[Dict, Dict]
) -> Tuple[Dict, list]:
    """Port with precomputed (params_map, stats_map) — CVAE/cascade entry."""
    flat_p = flatten_params(variables["params"])
    ported_p, skipped = smart_port(flat_p, torch_state, maps[0])
    out = {"params": unflatten_params(ported_p)}
    if "batch_stats" in variables:
        flat_s = flatten_params(variables["batch_stats"])
        ported_s, skipped_s = smart_port(flat_s, torch_state, maps[1])
        out["batch_stats"] = unflatten_params(ported_s)
        skipped = list(skipped) + list(skipped_s)
    return out, skipped


# CausalVesselVAE (C7) torch Sequential indices (live dec_conv definition —
# the first one at ref models.py:71-105 is dead code, overwritten at :108)
_VES_ENC_CONV_IDX = (0, 3, 6, 9, 12, 15, 18)
_VES_ENC_BN_IDX = (1, 4, 7, 10, 13, 16, 19)
_VES_DEC_CONV_IDX = (1, 5, 9, 13, 17, 21)
_VES_DEC_BN_IDX = (2, 6, 10, 14, 18, 22)
_VES_DEC_OUT_IDX = 25


def causal_vessel_vae_name_maps(grid_hw: Tuple[int, int] = (6, 10)) -> Tuple[Dict, Dict]:
    """Maps for the CNN vessel causal VAE against the reference's
    CausalVesselVAE state_dict (C7, ref vessel_analysis/00_core/
    models.py:9-166): 7 conv+BN encoder stages, BN'd fc heads, Gaussian
    morph heads, 7-stage upsample+conv decoder."""
    gh, gw = grid_hw
    P: Dict = {}
    S: Dict = {}
    for i, (ci, bi) in enumerate(zip(_VES_ENC_CONV_IDX, _VES_ENC_BN_IDX)):
        P[f"enc_convs_{i}/kernel"] = (f"enc_conv.{ci}.weight", torch_conv_to_flax)
        P[f"enc_convs_{i}/bias"] = (f"enc_conv.{ci}.bias", _ID)
        _bn(f"enc_bns_{i}", f"enc_conv.{bi}", P, S)
    P["enc_fc1/kernel"] = ("enc_fc.0.weight", _chw_to_hwc_columns(512, gh, gw))
    P["enc_fc1/bias"] = ("enc_fc.0.bias", _ID)
    _bn("enc_fc_bn", "enc_fc.1", P, S)
    P["enc_fc2/kernel"] = ("enc_fc.3.weight", torch_linear_to_flax)
    P["enc_fc2/bias"] = ("enc_fc.3.bias", _ID)
    for i, ti in enumerate((0, 2)):
        P[f"morph/shared_{i}/kernel"] = (f"morph_predictor_shared.{ti}.weight", torch_linear_to_flax)
        P[f"morph/shared_{i}/bias"] = (f"morph_predictor_shared.{ti}.bias", _ID)
    for head in ("mu", "logvar"):
        P[f"morph/{head}/kernel"] = (f"morph_predictor_{head}.weight", torch_linear_to_flax)
        P[f"morph/{head}/bias"] = (f"morph_predictor_{head}.bias", _ID)
    P["dec_fc1/kernel"] = ("dec_fc.0.weight", torch_linear_to_flax)
    P["dec_fc1/bias"] = ("dec_fc.0.bias", _ID)
    _bn("dec_fc_bn", "dec_fc.1", P, S)
    P["dec_fc2/kernel"] = ("dec_fc.3.weight", _hwc_from_chw_rows(512, gh, gw))
    P["dec_fc2/bias"] = ("dec_fc.3.bias", _hwc_from_chw_bias(512, gh, gw))
    for i, (ci, bi) in enumerate(zip(_VES_DEC_CONV_IDX, _VES_DEC_BN_IDX)):
        P[f"dec_convs_{i}/kernel"] = (f"dec_conv.{ci}.weight", torch_conv_to_flax)
        P[f"dec_convs_{i}/bias"] = (f"dec_conv.{ci}.bias", _ID)
        _bn(f"dec_bns_{i}", f"dec_conv.{bi}", P, S)
    P["dec_out/kernel"] = (f"dec_conv.{_VES_DEC_OUT_IDX}.weight", torch_conv_to_flax)
    P["dec_out/bias"] = (f"dec_conv.{_VES_DEC_OUT_IDX}.bias", _ID)
    return P, S


def port_vessel_cnn_checkpoint(
    variables: Dict, torch_state: Dict[str, np.ndarray],
    grid_hw: Tuple[int, int] = (6, 10),
) -> Tuple[Dict, list]:
    """Port a reference CausalVesselVAE checkpoint into CausalVesselVAE
    variables (params + BatchNorm running stats)."""
    P, S = causal_vessel_vae_name_maps(grid_hw)
    flat_p = flatten_params(variables["params"])
    ported_p, skipped = smart_port(flat_p, torch_state, P)
    out = {"params": unflatten_params(ported_p)}
    if "batch_stats" in variables:
        flat_s = flatten_params(variables["batch_stats"])
        ported_s, skipped_s = smart_port(flat_s, torch_state, S)
        out["batch_stats"] = unflatten_params(ported_s)
        skipped = list(skipped) + list(skipped_s)
    return out, skipped


def port_vitvae_checkpoint(
    variables: Dict,
    torch_state: Dict[str, np.ndarray],
    *,
    causal: bool = False,
    depth: int = 6,
    heads: int = 8,
    embed_dim: int = 256,
    dec_res_stages: int = 3,
    grid_hw: Optional[Tuple[int, int]] = None,
    src_grid: Optional[Tuple[int, int]] = None,
    dst_grid: Optional[Tuple[int, int]] = None,
) -> Tuple[Dict, list]:
    """Port a reference checkpoint into freshly-initialized flax variables.

    Returns (variables, skipped). strict=False semantics: mismatched shapes
    are skipped (except pos-embedding, which is interpolated when the grids
    are given — the smart_load_weights path). dec_res_stages=3 for the
    vessel family, 4 for latent-translator checkpoints. grid_hw is the torch
    checkpoint's decoder grid (needed for the decoder_input row permutation);
    defaults to src_grid, then dst_grid."""
    maps = (causal_vitvae_name_maps if causal else vitvae_name_maps)(
        depth, heads, embed_dim, dec_res_stages=dec_res_stages,
        grid_hw=grid_hw or src_grid or dst_grid,
    )
    pos_key = ("backbone/" if causal else "") + "pos_embedding"
    flat_p = flatten_params(variables["params"])
    # The causal wrapper never instantiates the backbone latent heads — it
    # bypasses fc_mu/fc_var via the adapters (ref models.py:281-302 reads the
    # CLS token directly), so those torch weights have no flax home. Mirror
    # the reference's load_state_dict(strict=False): drop map rows whose flax
    # key was never created, reporting them in ``skipped``.
    absent = [k for k in maps[0] if k not in flat_p]
    p_map = {k: v for k, v in maps[0].items() if k in flat_p}
    ported_p, skipped_p = smart_port(
        flat_p, torch_state, p_map,
        pos_embedding_key=pos_key, src_grid=src_grid, dst_grid=dst_grid,
    )
    skipped_p = list(skipped_p) + [(k, "not-instantiated-in-flax")
                                   for k in absent]
    out = {"params": unflatten_params(ported_p)}
    skipped = list(skipped_p)
    if "batch_stats" in variables:
        flat_s = flatten_params(variables["batch_stats"])
        ported_s, skipped_s = smart_port(flat_s, torch_state, maps[1])
        out["batch_stats"] = unflatten_params(ported_s)
        skipped += skipped_s
    return out, skipped
