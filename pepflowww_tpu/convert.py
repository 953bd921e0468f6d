"""Torch checkpoint → JAX params converter.

Maps the reference's `FlowModel.state_dict()` (80 MB model1.pt/model2.pt
checkpoints, README.md:50-51) onto this package's flax parameter tree, so
pretrained reference models run on TPU unchanged.

Handles the gnarly cases called out in SURVEY.md §7:
* `module.` DDP prefix stripping (models_con/utils.py:16-23)
* torch Linear (out,in) -> flax kernel (in,out) transpose
* nn.TransformerEncoderLayer packed `in_proj_weight` (3D, D) -> fused qkv Dense
* embedding tables pass through untransposed
* IPA `head_weights` raw parameter

Requires torch (CPU) only to unpickle; the output is a pure numpy pytree.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _n(w) -> np.ndarray:
    return np.asarray(w)


def _dense(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _n(sd[f"{prefix}.bias"])
    return out


def _mlp(sd, prefix, n_linear, module_cls="Linear"):
    """nn.Sequential of Linear(+ReLU): torch indexes count activation layers."""
    out = {}
    li = 0
    torch_idx = 0
    while li < n_linear:
        key = f"{prefix}.{torch_idx}.weight"
        if key in sd:
            out[f"{module_cls}_{li}" if module_cls else f"layers_{li}"] = {
                "Dense_0": _dense(sd, f"{prefix}.{torch_idx}")
            }
            li += 1
        torch_idx += 1
        if torch_idx > 50:
            raise KeyError(f"ran off sequential {prefix}")
    return out


def _layernorm(sd, prefix):
    return {"scale": _n(sd[f"{prefix}.weight"]), "bias": _n(sd[f"{prefix}.bias"])}


def _embed(sd, prefix):
    return {"embedding": _n(sd[f"{prefix}.weight"])}


def _tfmr_layer(sd, prefix):
    """torch TransformerEncoderLayer -> TorchTransformerEncoderLayer params."""
    return {
        "in_proj": {
            "kernel": _t(sd[f"{prefix}.self_attn.in_proj_weight"]),
            "bias": _n(sd[f"{prefix}.self_attn.in_proj_bias"]),
        },
        "out_proj": {"Dense_0": _dense(sd, f"{prefix}.self_attn.out_proj")},
        "linear1": {"Dense_0": _dense(sd, f"{prefix}.linear1")},
        "linear2": {"Dense_0": _dense(sd, f"{prefix}.linear2")},
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
    }


def convert_state_dict(sd: Dict[str, "object"], num_blocks: int = 6,
                       seq_tfmr_num_layers: int = 2) -> dict:
    """Reference FlowModel state_dict -> flax params dict."""
    sd = {k[7:] if k.startswith("module.") else k: np.asarray(v) for k, v in sd.items()}

    params: dict = {}

    # ---- NodeEmbedder ----
    node = {
        "Embed_0": _embed(sd, "node_embedder.aatype_embed"),
        "MLP_0": _mlp(sd, "node_embedder.mlp", 4),
    }
    params["node_embedder"] = node

    # ---- EdgeEmbedder ----
    edge = {
        "aa_pair_embed": _embed(sd, "edge_embedder.aa_pair_embed"),
        "relpos_embed": _embed(sd, "edge_embedder.relpos_embed"),
        "aapair_to_distcoef": _embed(sd, "edge_embedder.aapair_to_distcoef"),
        "distance_embed": _mlp(sd, "edge_embedder.distance_embed", 2),
        "out_mlp": _mlp(sd, "edge_embedder.out_mlp", 3),
    }
    params["edge_embedder"] = edge

    # ---- GAEncoder ----
    ga: dict = {
        "current_seq_embedder": _embed(sd, "ga_encoder.current_seq_embedder"),
        "res_feat_mixer": _mlp(sd, "ga_encoder.res_feat_mixer", 2),
        "seq_net": _mlp(sd, "ga_encoder.seq_net", 3),
        "angle_net": _mlp(sd, "ga_encoder.angle_net", 3),
    }
    for b in range(num_blocks):
        ipa_p = f"ga_encoder.trunk.ipa_{b}"
        ga[f"ipa_{b}"] = {
            "linear_q": {"Dense_0": _dense(sd, f"{ipa_p}.linear_q")},
            "linear_kv": {"Dense_0": _dense(sd, f"{ipa_p}.linear_kv")},
            "linear_q_points": {"Dense_0": _dense(sd, f"{ipa_p}.linear_q_points")},
            "linear_kv_points": {"Dense_0": _dense(sd, f"{ipa_p}.linear_kv_points")},
            "linear_b": {"Dense_0": _dense(sd, f"{ipa_p}.linear_b")},
            "down_z": {"Dense_0": _dense(sd, f"{ipa_p}.down_z")},
            "linear_out": {"Dense_0": _dense(sd, f"{ipa_p}.linear_out")},
            "head_weights": _n(sd[f"{ipa_p}.head_weights"]),
        }
        ga[f"ipa_ln_{b}"] = _layernorm(sd, f"ga_encoder.trunk.ipa_ln_{b}")
        tf = {}
        for l in range(seq_tfmr_num_layers):
            tf[f"layers_{l}"] = _tfmr_layer(sd, f"ga_encoder.trunk.seq_tfmr_{b}.layers.{l}")
        ga[f"seq_tfmr_{b}"] = tf
        ga[f"post_tfmr_{b}"] = {"Dense_0": _dense(sd, f"ga_encoder.trunk.post_tfmr_{b}")}
        nt = f"ga_encoder.trunk.node_transition_{b}"
        ga[f"node_transition_{b}"] = {
            "Linear_0": {"Dense_0": _dense(sd, f"{nt}.linear_1")},
            "Linear_1": {"Dense_0": _dense(sd, f"{nt}.linear_2")},
            "Linear_2": {"Dense_0": _dense(sd, f"{nt}.linear_3")},
            "LayerNorm_0": _layernorm(sd, f"{nt}.ln"),
        }
        ga[f"bb_update_{b}"] = {
            "Linear_0": {"Dense_0": _dense(sd, f"ga_encoder.trunk.bb_update_{b}.linear")}
        }
        if b < num_blocks - 1:
            et = f"ga_encoder.trunk.edge_transition_{b}"
            ga[f"edge_transition_{b}"] = {
                "Linear_0": {"Dense_0": _dense(sd, f"{et}.initial_embed")},
                "Linear_1": {"Dense_0": _dense(sd, f"{et}.trunk.0")},
                "Linear_2": {"Dense_0": _dense(sd, f"{et}.trunk.2")},
                "Linear_3": {"Dense_0": _dense(sd, f"{et}.final_layer")},
                "LayerNorm_0": _layernorm(sd, f"{et}.layer_norm"),
            }
    params["ga_encoder"] = ga
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pt checkpoint and convert its model weights."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd)


# ------------------------------------------------------------------ export
def _x_dense(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _x_mlp(sd, prefix, p, module_cls="Linear"):
    """Inverse of `_mlp`: Linears sit at even indices of the reference's
    nn.Sequential(Linear, ReLU, Linear, ...) stacks (node.py:96-103,
    edge.py:30-37, ga.py:22-36)."""
    li = 0
    while True:
        key = f"{module_cls}_{li}" if module_cls else f"layers_{li}"
        if key not in p:
            break
        _x_dense(sd, f"{prefix}.{2 * li}", p[key]["Dense_0"])
        li += 1


def _x_layernorm(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _x_embed(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["embedding"])


def _x_tfmr_layer(sd, prefix, p):
    sd[f"{prefix}.self_attn.in_proj_weight"] = np.asarray(p["in_proj"]["kernel"]).T
    sd[f"{prefix}.self_attn.in_proj_bias"] = np.asarray(p["in_proj"]["bias"])
    _x_dense(sd, f"{prefix}.self_attn.out_proj", p["out_proj"]["Dense_0"])
    _x_dense(sd, f"{prefix}.linear1", p["linear1"]["Dense_0"])
    _x_dense(sd, f"{prefix}.linear2", p["linear2"]["Dense_0"])
    _x_layernorm(sd, f"{prefix}.norm1", p["norm1"])
    _x_layernorm(sd, f"{prefix}.norm2", p["norm2"])


def export_state_dict(params: dict, num_blocks: int = 6,
                      seq_tfmr_num_layers: int = 2) -> Dict[str, np.ndarray]:
    """Flax params -> reference FlowModel state_dict (inverse of
    `convert_state_dict`).

    Lets TPU-trained checkpoints run inside the reference ecosystem (its
    inference.py/sample.py/eval scripts): `model.load_state_dict(
    {k: torch.from_numpy(v) for k, v in export_state_dict(params).items()})`.
    Exact inverse — tests/test_convert.py round-trips it against a real
    reference state_dict.
    """
    sd: Dict[str, np.ndarray] = {}

    def freq_bands(n):
        # AngularEncoding's registered (non-learned) buffer in the reference
        # (pepflow/modules/common/layers.py:92-113); flax computes it inline.
        return np.asarray([float(i + 1) for i in range(n)]
                          + [1.0 / (i + 1) for i in range(n)], np.float32)

    sd["node_embedder.dihed_embed.freq_bands"] = freq_bands(3)
    sd["edge_embedder.dihedral_embed.freq_bands"] = freq_bands(3)
    sd["ga_encoder.angles_embedder.freq_bands"] = freq_bands(12)

    node = params["node_embedder"]
    _x_embed(sd, "node_embedder.aatype_embed", node["Embed_0"])
    _x_mlp(sd, "node_embedder.mlp", node["MLP_0"])

    edge = params["edge_embedder"]
    _x_embed(sd, "edge_embedder.aa_pair_embed", edge["aa_pair_embed"])
    _x_embed(sd, "edge_embedder.relpos_embed", edge["relpos_embed"])
    _x_embed(sd, "edge_embedder.aapair_to_distcoef", edge["aapair_to_distcoef"])
    _x_mlp(sd, "edge_embedder.distance_embed", edge["distance_embed"])
    _x_mlp(sd, "edge_embedder.out_mlp", edge["out_mlp"])

    ga = params["ga_encoder"]
    _x_embed(sd, "ga_encoder.current_seq_embedder", ga["current_seq_embedder"])
    _x_mlp(sd, "ga_encoder.res_feat_mixer", ga["res_feat_mixer"])
    _x_mlp(sd, "ga_encoder.seq_net", ga["seq_net"])
    _x_mlp(sd, "ga_encoder.angle_net", ga["angle_net"])
    for b in range(num_blocks):
        ipa_p = f"ga_encoder.trunk.ipa_{b}"
        ipa = ga[f"ipa_{b}"]
        for name in ("linear_q", "linear_kv", "linear_q_points",
                     "linear_kv_points", "linear_b", "down_z", "linear_out"):
            _x_dense(sd, f"{ipa_p}.{name}", ipa[name]["Dense_0"])
        sd[f"{ipa_p}.head_weights"] = np.asarray(ipa["head_weights"])
        _x_layernorm(sd, f"ga_encoder.trunk.ipa_ln_{b}", ga[f"ipa_ln_{b}"])
        for l in range(seq_tfmr_num_layers):
            _x_tfmr_layer(sd, f"ga_encoder.trunk.seq_tfmr_{b}.layers.{l}",
                          ga[f"seq_tfmr_{b}"][f"layers_{l}"])
        _x_dense(sd, f"ga_encoder.trunk.post_tfmr_{b}", ga[f"post_tfmr_{b}"]["Dense_0"])
        nt = f"ga_encoder.trunk.node_transition_{b}"
        ntp = ga[f"node_transition_{b}"]
        _x_dense(sd, f"{nt}.linear_1", ntp["Linear_0"]["Dense_0"])
        _x_dense(sd, f"{nt}.linear_2", ntp["Linear_1"]["Dense_0"])
        _x_dense(sd, f"{nt}.linear_3", ntp["Linear_2"]["Dense_0"])
        _x_layernorm(sd, f"{nt}.ln", ntp["LayerNorm_0"])
        _x_dense(sd, f"ga_encoder.trunk.bb_update_{b}.linear",
                 ga[f"bb_update_{b}"]["Linear_0"]["Dense_0"])
        if b < num_blocks - 1:
            et = f"ga_encoder.trunk.edge_transition_{b}"
            etp = ga[f"edge_transition_{b}"]
            _x_dense(sd, f"{et}.initial_embed", etp["Linear_0"]["Dense_0"])
            _x_dense(sd, f"{et}.trunk.0", etp["Linear_1"]["Dense_0"])
            _x_dense(sd, f"{et}.trunk.2", etp["Linear_2"]["Dense_0"])
            _x_dense(sd, f"{et}.final_layer", etp["Linear_3"]["Dense_0"])
            _x_layernorm(sd, f"{et}.layer_norm", etp["LayerNorm_0"])
    return sd
